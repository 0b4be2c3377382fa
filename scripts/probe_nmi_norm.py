"""Probe: does symmetric degree normalization (D^-1/2 A D^-1/2) fix the
rank-2 split quality on the planted-partition graph?  Companion to
probe_nmi.py — same workload, normalized operand."""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[3, 4, 5])
    ap.add_argument("--priority", default="size_ndcg")
    ap.add_argument("--restarts", type=int, default=3)
    args = ap.parse_args()

    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import planted_partition_graph
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering

    nodes, kc = 3000, 20
    G, labels_true = planted_partition_graph(nodes, kc, seed=7)
    deg = np.asarray(G.sum(axis=1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    Gn = sp.diags(dinv) @ G @ sp.diags(dinv)

    gopts = ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4, algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
            min_iter=1, max_iter=5000, verbose=False, dtype="float32",
            stall_patience=100,
        ),
        num_clusters=kc, verbose=False,
        priority_method=args.priority, restarts=args.restarts,
    )
    nmis = []
    for seed in args.seeds:
        t0 = time.perf_counter()
        tree, stats = clust_hier(Gn.tocsc(), gopts, Random(seed))
        dt = time.perf_counter() - t0
        rep = score_clustering(tree.assignments, labels_true)
        nmis.append(rep["nmi"])
        print(f"seed {seed}: NMI={rep['nmi']:.3f} "
              f"outliers={len(tree.outliers)} solves={stats.nmf_count} "
              f"wall={dt:.1f}s")
    nmis = np.array(nmis)
    print(f"median={np.median(nmis):.3f} min={nmis.min():.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
