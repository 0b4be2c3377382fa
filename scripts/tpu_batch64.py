"""Round-5 probe: sparse-operand hierclust at 250k docs (VERDICT r4 #2).

Compares three engines on a 30k x 250k (~20M nnz) nested-cluster corpus
that stays SPARSE on device (dense form would be 30 GB):
  1. chain + chunk-gathered subsets (new; wide splits bail to the
     sequential chunk tier, deep splits run fused segments)
  2. sequential chunk tier only (CHAIN off)
  3. round-4 behavior: masked full-width solves (no host_A -> no chunk
     table), capped at 20 clusters (its per-node cost is full-width)
plus a 100-leaf run on path 1 (the VERDICT done-criterion) with
chain-telemetry and chain-vs-seq NMI.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch64.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

import smallk_tpu.engines.hier_chain as hier_chain
from smallk_tpu.common.options import (
    ClustOptions,
    NmfAlgorithm,
    NmfOptions,
    NmfProgressAlgorithm,
)
from smallk_tpu.common.rng import Random
from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
from smallk_tpu.engines.hierclust import clust_hier
from smallk_tpu.engines.scoring import score_clustering
from smallk_tpu.ops.ell import EllAOp

jax.device_get(jnp.zeros((1,)))

t0 = time.perf_counter()
m, n = 30_000, 250_000
A, labels = synthetic_term_doc_corpus(m, n, 64, seed=11)
print(f"corpus: {time.perf_counter()-t0:.0f}s, nnz={A.nnz}", flush=True)

t0 = time.perf_counter()
op = EllAOp.from_scipy(A, dtype=jnp.bfloat16)
print(f"operand ship: {time.perf_counter()-t0:.0f}s", flush=True)


def opts_for(k):
    return ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4, algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
            min_iter=1, max_iter=150, verbose=False, dtype="float32",
            a_dtype="bfloat16", stall_patience=100,
        ),
        num_clusters=k, verbose=False,
    )


def run(tag, k, chain, with_chunks, seed=2, reps=1):
    hier_chain.CHAIN = chain
    host_A = A if with_chunks else None
    tree, stats = clust_hier(op, opts_for(k), Random(1), host_A=host_A)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        tree, stats = clust_hier(op, opts_for(k), Random(seed),
                                 host_A=host_A)
        best = min(best, time.perf_counter() - t0)
    a = tree.assignments
    nmi = score_clustering(a[a >= 0], labels[a >= 0])["nmi"]
    print(f"{tag}: {best:.2f}s  solves={stats.nmf_count} "
          f"iters={stats.iter_count} NMI={nmi:.3f} "
          f"chain={dict(hier_chain.LAST_STATS)}", flush=True)
    return tree, best


# 20-cluster comparison across all three paths
t_chain, w1 = run("chain+chunks 20c", 20, True, True)
t_seq, w2 = run("seq chunks   20c", 20, False, True)
t_mask, w3 = run("masked(r4)   20c", 20, False, False)
agree = np.mean(t_chain.assignments == t_seq.assignments)
print(f"chain-vs-seq assignment agreement (20c): {agree:.3f}", flush=True)

# the VERDICT done-criterion: 100 leaves on the sparse operand
t100, w100 = run("chain+chunks 100 leaves", 100, True, True)
print(f"[summary] 20c chain {w1:.2f}s seq {w2:.2f}s masked {w3:.2f}s; "
      f"100-leaf {w100:.2f}s", flush=True)
print("[done]")
