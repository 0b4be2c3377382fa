"""Round-5 probe: slab-resident pivot rounds at the 1M-doc flagship shape.

Measures the VERDICT-r4 #1 target: 50k x 1M-doc k=128 BPP with live
factors, after the nnls.body_outer redesign (gather bad columns once per
outer round, run all pivot rounds slab-resident, scatter once) replaced
the per-round full-(k,1M) gather/scatter scheduler.  Also reports the
new pivot_rounds telemetry (SolveResult/NmfStats) and checks factors
stay live (the round-4 degenerate-solve regression).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch62.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.ops.ell import EllAOp
from smallk_tpu.solvers.solve import nmf_solve

jax.device_get(jnp.zeros((1,)))  # d2h warmup

m1, n1, k1, nzc = 50_000, 1_000_000, 128, 80
gs = np.random.RandomState(9)
A1 = sp.csc_matrix(
    (gs.rand(n1 * nzc).astype(np.float32),
     gs.randint(0, m1, n1 * nzc).astype(np.int32),
     np.arange(0, n1 * nzc + 1, nzc, dtype=np.int64)),
    shape=(m1, n1))
A1.sum_duplicates()
t0 = time.perf_counter()
op1 = EllAOp.from_scipy(A1, dtype=jnp.bfloat16)
del A1
print(f"operand build+ship: {time.perf_counter() - t0:.1f}s", flush=True)

rng1 = Random(5)
W01 = jnp.asarray(random_matrix(m1, k1, rng1, dtype=np.float32))
H01 = jnp.asarray(random_matrix(k1, n1, rng1, dtype=np.float32))

walls = {}
rounds = {}
for iters in (2, 6):
    o1 = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP,
                    height=m1, width=n1, k=k1, min_iter=1,
                    max_iter=iters, verbose=False, a_dtype="bfloat16")
    r = nmf_solve(op1, W01, H01, o1)
    int(r.iterations)  # compile + consume
    t0 = time.perf_counter()
    r = nmf_solve(op1, W01, H01, o1)
    its = int(r.iterations)
    walls[iters] = time.perf_counter() - t0
    rounds[iters] = int(r.pivot_rounds)
    print(f"iters={its}: wall {walls[iters]:.2f}s, "
          f"pivot_rounds total {rounds[iters]}", flush=True)

rate = 4.0 / max(walls[6] - walls[2], 1e-6)
riter = (rounds[6] - rounds[2]) / 4.0
print(f"steady-state: {rate:.3f} it/s ({(walls[6]-walls[2])/4.0:.3f} "
      f"s/iter), {riter:.1f} pivot rounds/iter", flush=True)

# live factors (round-4 regression): both factors nonzero, H has spread
Hmax = float(jnp.max(r.H))
Wmax = float(jnp.max(r.W))
Hnz = float(jnp.mean((r.H > 0).astype(jnp.float32)))
print(f"factor liveness: max W {Wmax:.3g}, max H {Hmax:.3g}, "
      f"H nonzero frac {Hnz:.3f}", flush=True)
assert Hmax > 0 and Wmax > 0 and Hnz > 0.01, "DEGENERATE SOLVE"
print("[done]")
