"""Round-5 probe: dtype-aware doc-block size for the AH' gather table.

batch67: fine-ladder W'A runs 3.0 ns/padded-entry but AH' 5.3 — the
doc-blocked side pays 85 bucket dispatches + the H.T transpose.
_DOC_BLOCK=65536 was tuned for f32 tables (33 MB slice, batch18); a
bf16 table at 65536 is only 16.8 MB, so 131072 gives the same 33 MB
with half the blocks/buckets.  Sweep block sizes at the bench 1M shape
(fine ladder on), then fit BPP at the best.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch68.py
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


@jax.jit
def _chain_nt(op, H):
    def body(c, _):
        r = op.mm_nt(H + c)
        return jnp.max(r).astype(H.dtype) * 1e-20, None
    c, _ = jax.lax.scan(body, jnp.zeros((), H.dtype), None, length=REPS)
    return c


def bpp_fit(op):
    walls = {}
    for iters in (2, 6):
        o1 = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m1,
                        width=n1, k=k1, min_iter=1, max_iter=iters,
                        verbose=False, a_dtype="bfloat16")
        r = nmf_solve(op, W01, H01, o1)
        int(r.iterations)
        t0 = time.perf_counter()
        r = nmf_solve(op, W01, H01, o1)
        int(r.iterations)
        walls[iters] = time.perf_counter() - t0
    assert float(jnp.max(r.W)) > 0 and float(jnp.max(r.H)) > 0
    return 4.0 / max(walls[6] - walls[2], 1e-6)


best = (None, 1e9, None)
for block in (131072, 262144):
    t0 = time.perf_counter()
    op = ell.EllAOp.from_scipy(A1, dtype=jnp.bfloat16, doc_block=block)
    build = time.perf_counter() - t0
    nb = sum(len(b) for _, b in op.row_blocks)
    pad = sum(int(i.size) for _, b in op.row_blocks for i, _ in b)
    print(f"[blk{block}] build {build:.0f}s row padded {pad/1e6:.1f}M "
          f"{nb} buckets {len(op.row_blocks)} blocks", flush=True)
    float(_chain_nt(op, H01))
    t0 = time.perf_counter(); float(_chain_nt(op, H01))
    nt = (time.perf_counter() - t0) / REPS
    print(f"[blk{block}] AH' {nt*1e3:.0f} ms", flush=True)
    if nt < best[1]:
        best = (block, nt, op)
    else:
        del op

block, nt, op = best
print(f"best block {block}: AH' {nt*1e3:.0f} ms; BPP fit...", flush=True)
rate = bpp_fit(op)
print(f"[blk{block}] BPP 2/6 fit: {rate:.2f} it/s", flush=True)
mu_walls = {}
for iters in (2, 6):
    o1 = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.MU, height=m1,
                    width=n1, k=k1, min_iter=1, max_iter=iters,
                    verbose=False, a_dtype="bfloat16")
    r = nmf_solve(op, W01, H01, o1)
    int(r.iterations)
    t0 = time.perf_counter()
    r = nmf_solve(op, W01, H01, o1)
    int(r.iterations)
    mu_walls[iters] = time.perf_counter() - t0
print(f"[blk{block}] MU 2/6 fit: "
      f"{4.0 / max(mu_walls[6] - mu_walls[2], 1e-6):.2f} it/s", flush=True)
print("[done]")
