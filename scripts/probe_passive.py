"""Probe: passive-set statistics of BPP at high rank (design input for the
compact-passive masked solve).  Runs on CPU; prints per-iteration stats of
the positive-support of H and W columns/rows."""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.engines.matrixgen import random_sparse_matrix
from smallk_tpu.ops.aop import as_aop
import smallk_tpu.solvers.bpp as bpp

m, n, k = 4096, 2048, 128
rng = Random(2024)
A = random_sparse_matrix(rng, m, n, nz_per_col=60, dtype=np.float32)
W = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
H = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))

opts = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m, width=n,
                  k=k, min_iter=1, max_iter=10, verbose=False)
a_op = as_aop(A)

state = bpp.init(a_op, W, H)
import functools
@functools.partial(jax.jit)
def one(W, H, state):
    W, H, gW, gH, state, ok = bpp.step(a_op, W, H, state)
    return W, H, state
for it in range(30):
    W, H, state = one(W, H, state)
    sH = np.asarray(H > 0).sum(axis=0)   # passive count per column
    sW = np.asarray(W > 0).sum(axis=1)   # per row of W (= col of W')
    # distinct passive patterns
    ph = np.packbits(np.asarray(H > 0), axis=0)
    pw = np.packbits(np.asarray(W > 0).T, axis=0)
    uh = np.unique(ph, axis=1).shape[1]
    uw = np.unique(pw, axis=1).shape[1]
    print(f"it={it:2d} H: mean={sH.mean():6.1f} p50={np.percentile(sH,50):5.0f} "
          f"p95={np.percentile(sH,95):5.0f} max={sH.max():4d} distinct={uh:5d}/{n} | "
          f"W: mean={sW.mean():6.1f} p95={np.percentile(sW,95):5.0f} "
          f"max={sW.max():4d} distinct={uw:5d}/{m}")
