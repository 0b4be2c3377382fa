"""Probe: community-recovery NMI across engine seeds (VERDICT r2 Weak #1).

Reproduces the bench planted-partition workload (3000 nodes, 20
communities) across several hierclust RNG seeds and prints per-seed NMI
plus tree diagnostics (leaf sizes, priorities, outliers) so priority /
restart levers can be evaluated.  Runs on CPU by default (rank-2 solves
on a 3000^2 operand are small).

Usage: python scripts/probe_nmi.py [--seeds 3 4 5 6 7] [--priority ndcg]
       [--restarts 1]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[3, 4, 5, 6, 7])
    ap.add_argument("--priority", default="ndcg")
    ap.add_argument("--restarts", type=int, default=1)
    ap.add_argument("--diag", action="store_true",
                    help="print per-leaf diagnostics")
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

    kw = {}
    fields = {f.name for f in
              __import__("dataclasses").fields(ClustOptions)}
    if "priority_method" in fields:
        kw["priority_method"] = args.priority
    if "restarts" in fields:
        kw["restarts"] = args.restarts
    gopts = ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4, algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
            min_iter=1, max_iter=5000, verbose=False, dtype="float32",
            stall_patience=100,
        ),
        num_clusters=kc, verbose=False, **kw,
    )

    nmis = []
    for seed in args.seeds:
        t0 = time.perf_counter()
        tree, stats = clust_hier(G, gopts, Random(seed))
        dt = time.perf_counter() - t0
        rep = score_clustering(tree.assignments, labels_true)
        nmis.append(rep["nmi"])
        sizes = sorted(
            (len(tree.nodes[q].docs), round(tree.nodes[q].priority, 3))
            for q, leaf in enumerate(tree.is_leaf) if leaf
        )
        print(f"seed {seed}: NMI={rep['nmi']:.3f} f1={rep['pairwise_f1']:.3f}"
              f" outliers={len(tree.outliers)} solves={stats.nmf_count}"
              f" wall={dt:.1f}s")
        if args.diag:
            print(f"  leaves (size, prio): {sizes}")
    nmis = np.array(nmis)
    print(f"median={np.median(nmis):.3f} min={nmis.min():.3f} "
          f"mean={nmis.mean():.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
