"""Round-5 probe: per-round bad-column trajectory of the 1M-doc H-solve.

batch62 showed ~70 pivot rounds/iter at the flagship shape — far more
than the few warm-started rounds expected.  This probe reruns the
slab-resident pivot loop with a per-round bad-count trace to see the
shape of the tail: does the non-optimal set collapse geometrically
(=> a width LADDER pays: run the tail rounds on a narrow slab), or stay
wide for many rounds (=> the pivot logic itself is the problem)?

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch63.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import smallk_tpu.solvers.nnls as nn
from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.ops.dense import gemm, gram
from smallk_tpu.ops.ell import EllAOp
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
op1 = EllAOp.from_scipy(A1, dtype=jnp.bfloat16)
del A1
rng1 = Random(5)
W01 = jnp.asarray(random_matrix(m1, k1, rng1, dtype=np.float32))
H01 = jnp.asarray(random_matrix(k1, n1, rng1, dtype=np.float32))

# advance to a realistic mid-solve state (3 iterations)
o1 = NmfOptions(tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m1,
                width=n1, k=k1, min_iter=1, max_iter=3, verbose=False,
                a_dtype="bfloat16")
r = nmf_solve(op1, W01, H01, o1)
int(r.iterations)
W, H = r.W, r.H
print("state ready", flush=True)

TRACE = 512


@jax.jit
def traced_pivot(LHS, RHS, Xinit):
    """nnls_blockpivot's slab loop with a per-round bad-count trace."""
    k, n = RHS.shape
    eps = jnp.finfo(RHS.dtype).eps
    abs_lhs = jnp.abs(LHS)

    passive = Xinit > 0
    X = nn._masked_solve(LHS, RHS, passive, x0=Xinit)
    Y = gemm(LHS, X) - RHS
    dx = 512.0 * eps * jnp.maximum(1.0, jnp.max(jnp.abs(X)))
    dy = 16.0 * eps * (gemm(abs_lhs, jnp.abs(X)) + jnp.abs(RHS))
    nonopt = (Y < -dy) & ~passive
    infeas = (X < -dx) & passive
    not_good = (jnp.sum(nonopt, axis=0)
                + jnp.sum(infeas, axis=0)).astype(jnp.int32)
    P = jnp.full((n,), nn.PBAR, dtype=jnp.int32)
    Ninf = jnp.full((n,), k + 1, dtype=jnp.int32)

    NB = max(nn._REDUCE_MIN_N // nn._REDUCE_FRACTION,
             n // nn._REDUCE_FRACTION)
    bad = not_good > 0
    ids = jnp.argsort(~bad, stable=True)[:NB]
    Xs = X[:, ids]
    RHS_s = RHS[:, ids]
    abs_rhs_s = jnp.abs(RHS_s)
    passive_s = passive[:, ids]
    P_s = P[ids]
    Ninf_s = Ninf[ids]
    nonopt_s = nonopt[:, ids]
    infeas_s = infeas[:, ids]
    ng_s = not_good[ids]
    col_max = jnp.max(jnp.abs(X), axis=0)
    x_other = jnp.max(col_max.at[ids].set(0.0))

    trace = jnp.zeros((TRACE,), jnp.int32)

    def cond(c):
        return jnp.any(c[7] > 0) & (c[8] < TRACE)

    def body(c):
        (Xs, passive_s, P_s, Ninf_s, nonopt_s, infeas_s, tr, ng_s,
         it) = c
        sel = ng_s > 0
        P_s, Ninf_s, c1, c2, c3 = nn._pivot_cols(
            P_s, Ninf_s, nonopt_s, infeas_s, ng_s, sel)
        passive_s = nn._update_passive(passive_s, nonopt_s, infeas_s,
                                       c1, c2, c3)
        Xn = nn._masked_solve(LHS, RHS_s, passive_s, x0=Xs)
        Yn = gemm(LHS, Xn) - RHS_s
        Xs = jnp.where(sel[None, :], Xn, Xs)
        dxl = 512.0 * eps * jnp.maximum(
            1.0, jnp.maximum(x_other, jnp.max(jnp.abs(Xs))))
        dy_s = 16.0 * eps * (gemm(abs_lhs, jnp.abs(Xs)) + abs_rhs_s)
        nonopt_s = jnp.where(sel[None, :], (Yn < -dy_s) & ~passive_s,
                             nonopt_s)
        infeas_s = jnp.where(sel[None, :], (Xn < -dxl) & passive_s,
                             infeas_s)
        ng_s = jnp.where(
            sel,
            (jnp.sum(nonopt_s, axis=0)
             + jnp.sum(infeas_s, axis=0)).astype(jnp.int32),
            ng_s)
        tr = tr.at[it].set(jnp.sum((ng_s > 0).astype(jnp.int32)))
        return (Xs, passive_s, P_s, Ninf_s, nonopt_s, infeas_s, tr,
                ng_s, it + 1)

    c = jax.lax.while_loop(
        cond, body,
        (Xs, passive_s, P_s, Ninf_s, nonopt_s, infeas_s, trace, ng_s,
         jnp.zeros((), jnp.int32)))
    n_bad0 = jnp.sum(bad.astype(jnp.int32))
    return n_bad0, c[6], c[8]


from smallk_tpu.ops.dense import gram_t  # noqa: E402

WtW = gram(W)
WtA = op1.mm_tn(W)
nb0, tr, rounds = traced_pivot(WtW, WtA, H)
nb0, tr, rounds = int(nb0), np.asarray(tr), int(rounds)
print(f"H-side: initial bad {nb0} of {n1}; rounds {rounds}", flush=True)
nz = tr[:rounds]
print("bad-count trajectory:", list(nz[:40]), "...tail:", list(nz[-10:]),
      flush=True)

# W-side for completeness
HHt = gram_t(H)
HAt = op1.mm_nt(H).T
nb0w, trw, roundsw = traced_pivot(HHt, HAt, W.T)
print(f"W-side: initial bad {int(nb0w)} of {m1}; rounds {int(roundsw)}",
      flush=True)
trw = np.asarray(trw)[:int(roundsw)]
print("bad-count trajectory:", list(trw[:40]), "...tail:",
      list(trw[-10:]), flush=True)
print("[done]")
