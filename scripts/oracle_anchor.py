"""Measure the same-machine CPU anchor for the 100-leaf north-star
workload (VERDICT r3 #2).

The anchor is tests/np_hierclust.py — the plain-numpy f64 transcription
of the reference HierNMF2 engine (compacted submatrices, ndcg pop,
random starts, one start per node: exactly the reference algorithm) —
run on THE SAME planted-partition graph bench.py times on TPU:
20000 nodes, 100 communities, D^-1/2 A D^-1/2 normalization, 100
leaves.  numpy's BLAS uses the machine's threads, like the reference's
8-thread Elemental.

To cross-check that the oracle's per-factorization rate is a fair
stand-in for the reference binary, this also times the oracle on the
20news-shape text workload (15 clusters) where the reference PUBLISHES
a wall clock: 41 factorizations in 10.308 s
(sphinx/source/pages_tests.rst:229-258).

Run:  PYTHONPATH=/root/repo python scripts/oracle_anchor.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from np_hierclust import NpClustOptions, NpNmfOptions, np_clust_hier

from smallk_tpu.engines.corpus import (
    planted_partition_graph, synthetic_term_doc_corpus,
)
from smallk_tpu.engines.graph import normalized_adjacency
from smallk_tpu.engines.scoring import score_clustering


def run(A, clusters, seed, tol=1e-4):
    opts = NpClustOptions(
        nmf=NpNmfOptions(tol=tol, min_iter=1, max_iter=5000),
        num_clusters=clusters,
    )
    rng = np.random.RandomState(seed)
    t0 = time.perf_counter()
    tree, events = np_clust_hier(A, opts, None, rng=rng)
    dt = time.perf_counter() - t0
    return tree, events, dt


def main():
    # cross-check vs the published reference rate (20news shape, 15c);
    # A stays SPARSE — the reference pipeline is sparse-first, so the
    # anchor must pay sparse CPU costs, not densified ones
    A2, _ = synthetic_term_doc_corpus(39727, 11237, 20, seed=13)
    print(f"20news-shape corpus: nnz={A2.nnz/1e6:.2f}M", flush=True)
    tree, ev, dt = run(A2, 15, seed=2)
    print(f"oracle 20news-shape 15c: {dt:.1f} s, "
          f"{ev['nmf_count']} solves, {ev['iter_count']} iters "
          f"(reference binary: 41 solves / 10.308 s)", flush=True)
    del A2

    # the 100-leaf north-star graph workload (same generator/params as
    # bench.py's hierclust_100_leaves metric)
    G, labels = planted_partition_graph(20000, 100, seed=17)
    Gn = normalized_adjacency(G)
    print(f"graph: nnz={Gn.nnz/1e6:.2f}M", flush=True)
    tree, ev, dt = run(Gn, 100, seed=2)
    assign = tree.assignments()
    nmi = score_clustering(assign, labels)["nmi"]
    print(f"oracle 100-leaf graph (20000n/100c): {dt:.1f} s, "
          f"{ev['nmf_count']} solves, {ev['iter_count']} iters, "
          f"nmi={nmi:.3f}", flush=True)


if __name__ == "__main__":
    main()
