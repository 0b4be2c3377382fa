"""Round-5 probe: quarter-step ELL bucket ladder at the 1M-doc shape.

The bench corpus has ~80 nnz/column -> pow-2 buckets pad every column to
128 (1.6x gather entries on W'A) and the Poisson(~100) per-block row
lengths pad to 128/256 on AH'.  The bucket products are
padded-entry-bound (0.4 Gnnz/s gather wall, batch32-34), so the
quarter-step ladder (ops/ell._target_lengths) should convert the padding
cut directly into product wall.  This probe measures, same session:
  1. product walls (in-jit chained reps, scalar fetch) pow2 vs fine
  2. the bench's BPP 2/6-iter two-point fit, pow2 vs fine
  3. MU 2/6-iter fit (fine) — the products-only rate
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch67.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import smallk_tpu.ops.ell as ell
from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.solvers.solve import nmf_solve

jax.device_get(jnp.zeros((1,)))

m1, n1, k1, nzc = 50_000, 1_000_000, 128, 80
gs = np.random.RandomState(9)
A1 = sp.csc_matrix(
    (gs.rand(n1 * nzc).astype(np.float32),
     gs.randint(0, m1, n1 * nzc).astype(np.int32),
     np.arange(0, n1 * nzc + 1, nzc, dtype=np.int64)),
    shape=(m1, n1))
A1.sum_duplicates()
nnz = A1.nnz
rng1 = Random(5)
W01 = jnp.asarray(random_matrix(m1, k1, rng1, dtype=np.float32))
H01 = jnp.asarray(random_matrix(k1, n1, rng1, dtype=np.float32))

REPS = 8


# op passed as a jit ARGUMENT (pytree) — closing over it bakes the
# 80M-entry idx/vals arrays into the HLO as constants and the compile
# never finishes (the test_ops pytree test documents the same rule)
@jax.jit
def _chain_tn(op, W):
    def body(c, _):
        r = op.mm_tn(W + c)
        return jnp.max(r).astype(W.dtype) * 1e-20, None
    c, _ = jax.lax.scan(body, jnp.zeros((), W.dtype), None, length=REPS)
    return c


@jax.jit
def _chain_nt(op, H):
    def body(c, _):
        r = op.mm_nt(H + c)
        return jnp.max(r).astype(H.dtype) * 1e-20, None
    c, _ = jax.lax.scan(body, jnp.zeros((), H.dtype), None, length=REPS)
    return c


def prod_wall(op, W, H):
    float(_chain_tn(op, W)); float(_chain_nt(op, H))  # compile
    t0 = time.perf_counter(); float(_chain_tn(op, W))
    tn = (time.perf_counter() - t0) / REPS
    t0 = time.perf_counter(); float(_chain_nt(op, H))
    nt = (time.perf_counter() - t0) / REPS
    return tn, nt


def bpp_fit(op, algo=NmfAlgorithm.BPP):
    walls = {}
    for iters in (2, 6):
        o1 = NmfOptions(tol=1e-30, algorithm=algo, height=m1, width=n1,
                        k=k1, min_iter=1, max_iter=iters, verbose=False,
                        a_dtype="bfloat16")
        r = nmf_solve(op, W01, H01, o1)
        int(r.iterations)
        t0 = time.perf_counter()
        r = nmf_solve(op, W01, H01, o1)
        int(r.iterations)
        walls[iters] = time.perf_counter() - t0
    assert float(jnp.max(r.W)) > 0 and float(jnp.max(r.H)) > 0
    return 4.0 / max(walls[6] - walls[2], 1e-6)


for tag, gate in (("pow2", 10 ** 12), ("fine", 4096)):
    ell._FINE_SPLIT_MIN = gate
    t0 = time.perf_counter()
    op = ell.EllAOp.from_scipy(A1, dtype=jnp.bfloat16)
    build = time.perf_counter() - t0
    print(f"[{tag}] build {build:.1f}s padded {op.padded_nnz/1e6:.1f}M "
          f"({op.padded_nnz/nnz:.2f}x)", flush=True)
    tn, nt = prod_wall(op, W01, H01)
    print(f"[{tag}] W'A {tn*1e3:.0f} ms  AH' {nt*1e3:.0f} ms  "
          f"(sum {1e3*(tn+nt):.0f} ms/iter)", flush=True)
    rate = bpp_fit(op)
    print(f"[{tag}] BPP 2/6 fit: {rate:.2f} it/s", flush=True)
    if tag == "fine":
        mu = bpp_fit(op, NmfAlgorithm.MU)
        print(f"[{tag}] MU 2/6 fit: {mu:.2f} it/s", flush=True)
    del op
print("[done]")
