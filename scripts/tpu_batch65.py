"""Round-5 sweep: graph-100-leaf quality Pareto + the bf16/fp8 failing
band (VERDICT r4 #4/#5).

Grid over a_dtype x stall_patience x tol on the bench's exact 100-leaf
planted-partition workload (20000 nodes / 100 communities, D^-1/2 A
D^-1/2, graph presets, restarts=1).  For each config: best-of-2 wall,
NMI vs ground truth, and the count of failure-leafed nodes (priority
== -2 tree leaves from on_node_failure="leaf") — the round-4 notes'
"fails node factorizations 3x" band made observable.

Goal lines: NMI >= 0.99 at wall <= 9.04 s (>= 10x the 90.4 s CPU
oracle); and a characterization of WHERE the failing band lives.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch65.py
"""

import dataclasses as dc
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from smallk_tpu.common.rng import Random
from smallk_tpu.engines.corpus import planted_partition_graph
from smallk_tpu.engines.graph import (
    graph_clust_options,
    normalized_adjacency,
)
from smallk_tpu.engines.hierclust import clust_hier
from smallk_tpu.engines.scoring import score_clustering
from smallk_tpu.ops.aop import as_aop

jax.device_get(jnp.zeros((1,)))

G100, labels100 = planted_partition_graph(20000, 100, seed=17)
Gn100 = normalized_adjacency(G100)

DTYPES = {"fp8": jnp.float8_e4m3fn, "bf16": jnp.bfloat16}
rows = []
for dname, dt in DTYPES.items():
    op = as_aop(Gn100, dtype=dt)
    for stall in (25, 50):
        for tol in (1e-4, 2e-4, 3e-4, 1e-3):
            gopts = graph_clust_options(100, restarts=1)
            gopts = dc.replace(
                gopts,
                nmf_opts=dc.replace(gopts.nmf_opts,
                                    stall_patience=stall, tol=tol,
                                    a_dtype=str(np.dtype(dt))
                                    if dname == "bf16"
                                    else "float8_e4m3fn"),
            )
            try:
                clust_hier(op, gopts, Random(1))  # compile
                best, tree = float("inf"), None
                for _ in range(2):
                    t0 = time.perf_counter()
                    tree, _ = clust_hier(op, gopts, Random(2))
                    best = min(best, time.perf_counter() - t0)
                nmi = score_clustering(tree.assignments, labels100)["nmi"]
                nfail = sum(
                    1 for q, leaf in enumerate(tree.is_leaf)
                    if leaf and tree.nodes[q].is_valid
                    and tree.nodes[q].priority == -2.0
                )
                leaves = sum(tree.is_leaf)
                row = (dname, stall, tol, round(best, 2),
                       round(nmi, 4), nfail, leaves)
            except Exception as e:  # noqa: BLE001
                row = (dname, stall, tol, None, None, f"ERR {e}", None)
            rows.append(row)
            print("dtype=%s stall=%s tol=%s wall=%s NMI=%s "
                  "failleaf=%s leaves=%s" % row, flush=True)

print("\n[summary]")
for r in rows:
    print(r)
print("[done]")
