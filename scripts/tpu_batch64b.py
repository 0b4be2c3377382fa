"""Round-5 probe: 100-leaf sparse hierclust only (see tpu_batch64.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/tpu_batch64b.py
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

m, n = 30_000, 250_000
A, labels = synthetic_term_doc_corpus(m, n, 64, seed=11)
op = EllAOp.from_scipy(A, dtype=jnp.bfloat16)
print(f"operand ready nnz={A.nnz}", flush=True)

opts = ClustOptions(
    nmf_opts=NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=150, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    ),
    num_clusters=100, verbose=False,
)

t0 = time.perf_counter()
tree, stats = clust_hier(op, opts, Random(1), host_A=A)
print(f"compile+run: {time.perf_counter()-t0:.1f}s "
      f"chain={dict(hier_chain.LAST_STATS)}", flush=True)
t0 = time.perf_counter()
tree, stats = clust_hier(op, opts, Random(2), host_A=A)
wall = time.perf_counter() - t0
a = tree.assignments
nmi = score_clustering(a[a >= 0], labels[a >= 0])["nmi"]
print(f"100-leaf sparse 250k docs: {wall:.1f}s solves={stats.nmf_count} "
      f"iters={stats.iter_count} NMI={nmi:.3f} "
      f"chain={dict(hier_chain.LAST_STATS)}", flush=True)
print("[done]")
