"""Nonnegative least squares by block principal pivoting (Kim-Park).

Reference: common/include/nnls.hpp (NnlsBlockpivot :144-244, BppUpdateSets
:43-140) and common/src/nnls.cpp (UpdatePassiveSet :18-74).

TPU-native redesign.  The reference extracts per-column SPD subproblems
indexed by each column's passive set and solves them with OpenMP-parallel
Cholesky factorizations (nmf_solver_bpp.hpp:146-219).  On TPU,
data-dependent submatrix extraction defeats XLA, so we use a fixed-shape
masked formulation: for passive mask p of a column,

    M = (p p^T) .* LHS + diag(1 - p),   M x = p .* rhs

has the unique solution x that agrees with the subproblem on passive rows
and is 0 elsewhere.  All n columns are solved as one batched Cholesky —
the combinatorial pivot loop runs entirely on device as a lax.while_loop
with boolean masks standing in for the reference's BitMatrix.
The full-exchange / backup-rule pivot logic (PBAR=3, Ninf counters, single
bit toggle fallback) is reproduced exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.dense import _PRECISION, gemm, zeroize_small

PBAR = 3

# Masked-solve backend:
#   "auto"   (default) — on TPU f32, small problems (n*k^3 below
#            _CG_MIN_WORK) use the VMEM-resident Pallas GJ kernel
#            (solvers/pallas_kernels.py) whose HBM traffic is O(k n)
#            instead of the XLA formulation's O(k^2 n) per elimination
#            pass; everything wider routes to the warm-started masked
#            CG (the GJ's O(n k^3) serial-k VPU elimination loses to
#            <= k+16 MXU matmuls from n*k^3 ~ 2e6 up — crossover grid
#            at _CG_MIN_WORK below).
#            Elsewhere (CPU, f64, or VMEM-overflowing ranks): k below
#            _COMPACT_MIN_K uses the XLA unrolled GJ (fuses into the
#            pivot while_loop), k at or above it the compact-passive
#            XLA solve.
#   "xla"    — never use the Pallas kernel.
#   "pallas" — force the Pallas kernel at every rank.
#   "cg"     — force the masked conjugate-gradient path at every rank.
MASKED_SOLVER = "auto"

# auto mode switches to CG when n * k^3 (the GJ elimination's VPU flop
# scale) exceeds this.  Crossover grid measured end-to-end on v5e BPP
# (scripts/tpu_batch55/56, fresh process per mode, two-point fits):
#
#   shape (n, k)      n*k^3    GJ it/s   CG it/s
#   256 x 256, k=8    1.3e5     34772     17371   GJ
#   256 x 256, k=16   1.0e6     14838     13074   GJ
#   256 x 256, k=32   8.4e6      7259     12928   CG
#   reuters,   k=8    4.1e6      1394      1531   CG (+10%)
#   reuters,   k=16   3.3e7       849      1353   CG (+59%)
#   reuters,   k=32   2.6e8       226      1079   CG (4.8x)
#   reuters,   k=64   2.1e9        58       301   CG (5.2x)
#   reuters,   k=128  1.7e10       11       198   CG (18x)
#   1M docs,   k=128  2.1e12     ~0.5      ~9     CG (tpu_batch23)
#
# The GJ's O(n k^3) serial-k VPU elimination loses to CG's <= k+16
# warm-started MXU matmuls as soon as the elimination work outweighs
# the CG latency chain — between 1e6 and 4e6.  Tolerance-run parity at
# k=128: 205 (GJ) vs 216 (CG) iterations to tol 0.005, identical
# relative error to 5 decimals (tpu_batch55).
_CG_MIN_WORK = 2.0e6

# CG step cap: k + this.  Exact arithmetic needs <= |passive support|+1
# steps; the slack absorbs f32 rounding.  Module-level so the cap-out
# poison gate below is testable (see _cg_solve_block's exit check).
_CG_EXTRA_STEPS = 16


def set_masked_solver(name: str) -> None:
    global MASKED_SOLVER
    if name not in ("auto", "xla", "pallas", "cg"):
        raise ValueError(
            "masked solver must be 'auto', 'xla', 'pallas' or 'cg'"
        )
    MASKED_SOLVER = name


def _pallas_ok(dtype) -> bool:
    # allowlist, not a cpu-denylist: the kernel uses pltpu memory spaces
    # and would fail to lower on e.g. a GPU backend
    return (jnp.dtype(dtype) == jnp.float32
            and jax.default_backend() in ("tpu", "axon"))


def _pallas_fits(k: int) -> bool:
    """Does the kernel's VMEM scratch fit at the smallest legal tile?

    Mirrors pallas_kernels._pick_tile's model at its tile floor of 128
    lanes (Mosaic lane constraint): M scratch (k, k, 128) f32 plus the
    row-chunk and ~8 live (k, 128) temps, against a conservative 12 MB
    of the 16 MB scoped-VMEM cap.  k=128 models at 11.1 MB (validated on
    hardware); anything larger falls back to the XLA compact path
    instead of dying in Mosaic compilation."""
    return (k * k + 40 * k) * 128 * 4 <= 12 * 1024 * 1024


def _masked_solve(LHS, RHS, passive, x0=None):
    """`x0`: optional warm start, consumed ONLY by the CG tier (direct
    eliminations have no use for it).  BPP's pivot rounds re-solve
    near-identical systems — warm-started CG converges in a handful of
    steps instead of ~k (the residual tolerance is absolute either
    way, so the solution contract is unchanged)."""
    if MASKED_SOLVER == "pallas":
        from .pallas_kernels import masked_gj_solve_pallas

        return masked_gj_solve_pallas(LHS, RHS, passive)
    if MASKED_SOLVER == "cg":
        return _cg_solve_block(LHS, RHS, passive, x0)
    return _masked_cholesky_solve(LHS, RHS, passive, x0)


def _cg_solve_block(LHS, RHS, passive, x0=None):
    """Masked SPD solve via Jacobi-preconditioned conjugate gradient.

    Same system as the GJ/Cholesky paths: M x = b with
    M = (p p^T) .* LHS + diag(1 - p), b = p .* rhs, for all n columns
    batched.  Each CG step costs ONE k x k matmul against the SHARED
    LHS — MXU work, O(n k^2) per step — where the direct eliminations
    cost O(n k^3) VPU work regardless of how they are tiled.  At
    k=128 x 1M columns the Pallas GJ elimination is 1.96 s of VPU time
    per solve (the whole BPP bottleneck at that scale, tpu_batch23);
    <= k+16 CG steps of MXU matmuls replace it.

    Exactness: CG converges in at most |passive support| + 1 steps in
    exact arithmetic; in floats it is iterated to a relative residual of
    64*eps (or the step cap) with per-column freezing.  The BPP pivot
    logic is tolerance-based (`deltas`), so the residual-level noise is
    below the sign-test thresholds the same way the direct solvers'
    rounding is.  Dead topics (zero Gram diagonal) are forced
    non-passive, matching the other paths' guard.
    """
    k, n = RHS.shape
    # iterate in >= f32 (bf16 operands arrive when a_dtype="bfloat16";
    # residual recurrences in bf16 would stall far above the tolerance)
    dtype = jnp.promote_types(jnp.promote_types(LHS.dtype, RHS.dtype),
                              jnp.float32)
    out_dtype = LHS.dtype  # the Pallas/GJ paths' output contract
    LHS = LHS.astype(dtype)
    eps = jnp.finfo(dtype).eps
    tiny = k * eps * (jnp.max(jnp.abs(LHS)) + 1.0)
    alive = jnp.diag(LHS) > tiny
    pf = passive & alive[:, None]  # (k, n) BOOLEAN — 4x less HBM than f32
    # Jacobi preconditioner: 1/diag(LHS) as a k-vector broadcast (the
    # non-passive identity rows never matter — every carried vector is
    # exactly zero off the passive support, see below)
    dinv = jnp.where(alive, 1.0 / jnp.where(alive, jnp.diag(LHS), 1.0),
                     1.0)[:, None]
    b = jnp.where(pf, RHS, 0).astype(dtype)

    # All of x, r, pd live only on the passive support: r0 = b is masked,
    # and each update multiplies/adds masked quantities, so the identity
    # block of M contributes exactly 0*0 — matvec needs no omp term.
    # This solver is HBM-bound at the target widths (k=128 x 1M cols);
    # the carried state is 3 f32 arrays + 1 bool mask, ~7 array passes
    # per step, vs the direct GJ's O(k) full passes.
    def matvec(v):
        return jnp.where(pf, gemm(LHS, v), 0)

    bb = jnp.sum(b * b, axis=0)  # (n,)
    tol2 = (64.0 * eps) ** 2 * bb
    max_steps = k + _CG_EXTRA_STEPS

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        # warm start on the passive support; non-finite garbage (a
        # failed earlier solve) falls back to the cold start
        x = jnp.where(pf, x0.astype(dtype), 0)
        x = jnp.where(jnp.isfinite(x), x, 0)
        r = jnp.where(pf, b - gemm(LHS, x), 0)
    pd = r * dinv
    rz = jnp.sum(r * pd, axis=0)
    rr = jnp.sum(r * r, axis=0)

    def cond(c):
        x, r, pd, rz, rr, it = c
        return jnp.any(rr > tol2) & (it < max_steps)

    def body(c):
        x, r, pd, rz, rr, it = c
        live = (rr > tol2)[None, :]
        Mp = matvec(pd)
        pMp = jnp.sum(pd * Mp, axis=0)
        alpha = jnp.where(pMp > 0, rz / jnp.where(pMp > 0, pMp, 1.0), 0.0)
        x = jnp.where(live, x + alpha[None, :] * pd, x)
        r = jnp.where(live, r - alpha[None, :] * Mp, r)
        rz_new = jnp.sum(r * r * dinv, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        pd = jnp.where(live, r * dinv + beta[None, :] * pd, pd)
        rz = jnp.where(live[0], rz_new, rz)
        rr = jnp.where(live[0], jnp.sum(r * r, axis=0), rr)
        return (x, r, pd, rz, rr, it + 1)

    x, r, pd, rz, rr, it = jax.lax.while_loop(
        cond, body, (x, r, pd, rz, rr, jnp.zeros((), jnp.int32))
    )
    # Cap-out surfacing: the direct paths' failure mode is NaN/Inf ->
    # the caller's isfinite gate -> retry ladder; a step-capped CG would
    # otherwise return a silently approximate x whose passive-row
    # residual the BPP pivot tests never examine (they test X-signs on
    # passive rows and Y-signs on non-passive rows only).  The 64*eps
    # relative target can be legitimately unreachable in f32 for
    # ill-conditioned Grams (rounding floor ~ eps*|LHS||x| per column),
    # so the poison threshold is that backward-stable floor with a wide
    # margin, not the CG target: columns capped out FAR above anything
    # a direct solve could deliver are NaN'd and fail the attempt.
    floor = eps * (
        jnp.sqrt(jnp.sum(gemm(jnp.abs(LHS), jnp.abs(x)) ** 2, axis=0))
        + jnp.sqrt(bb)
    )
    capped = (rr > tol2) & (jnp.sqrt(rr) > 256.0 * k * floor)
    x = jnp.where(capped[None, :], jnp.nan, x)
    return jnp.where(pf, x, 0).astype(out_dtype)


# Memory budget for the per-chunk work tensor of the masked solve; wider
# problems are processed in column chunks via lax.map.
_GJ_BYTES_BUDGET = 256 * 1024 * 1024

# The statically-unrolled Gauss-Jordan wins up to this rank (pure VPU
# lane-parallel ops, zero per-matrix loop overhead); beyond it, the
# batched lax.linalg Cholesky path wins (measured crossover between k=64
# and k=128 on TPU v5e: GJ 779 ms vs Cholesky 200 ms at k=128, n=7984).
_GJ_MAX_K = 64

# Above this rank the compact-passive path takes over: each column's
# passive indices are gathered into an S x S subsystem (S << k) solved by
# the same unrolled GJ.  Rationale (measured on a k=128 BPP run, see
# docs/benchmarks.md): passive sets are SMALL (mean ~30 of 128, p95 ~46)
# and essentially every column's pattern is DISTINCT (2048/2048), so the
# reference's GroupIdenticalColumns trick (bit_matrix.hpp:79,
# nmf_solver_bpp.hpp:29-145) would find nothing to group at high rank —
# but compacting each subsystem to its own passive support cuts the
# masked-solve work from O(n k^3) to O(n S^3).  Columns whose passive set
# exceeds S go to a narrow full-rank overflow tier; if even that
# overflows, the call escalates to the full-width full-rank path, so the
# result is exact for every passive configuration.
_COMPACT_MIN_K = 48


def _chol_solve_block(LHS, RHS, passive):
    """Masked solve via batched lax.linalg Cholesky ((n, k, k) layout)."""
    k, n = RHS.shape
    dtype = LHS.dtype
    # dead-topic guard (matches the GJ path): a ~0 Gram diagonal would NaN
    # the Cholesky; forcing those rows non-passive yields the exact zero
    # component of the remaining subsystem (their RHS is also ~0)
    tiny = k * jnp.finfo(dtype).eps * (jnp.max(jnp.abs(LHS)) + 1.0)
    alive = (jnp.diag(LHS) > tiny).astype(dtype)
    p = passive.T.astype(dtype) * alive[None, :]  # (n, k)
    eye = jnp.eye(k, dtype=dtype)
    M = LHS[None, :, :] * (p[:, :, None] * p[:, None, :]) + eye[None] * (
        1.0 - p
    )[:, :, None]
    b = (RHS.T * p)[:, :, None]
    c = jax.lax.linalg.cholesky(M)
    y = jax.lax.linalg.triangular_solve(
        c, b, left_side=True, lower=True, transpose_a=False
    )
    x = jax.lax.linalg.triangular_solve(
        c, y, left_side=True, lower=True, transpose_a=True
    )
    return x[:, :, 0].T


def _masked_cholesky_solve(LHS, RHS, passive, x0=None):
    """Batched masked SPD solve with rank dispatch and column chunking.
    `x0` feeds the CG tier only.

    k <= _GJ_MAX_K: unrolled Gauss-Jordan; larger: batched Cholesky.
    Either way, chunks the n axis when the work tensor exceeds the budget
    (rank-128 on a million-document corpus needs ~66 GB unchunked).
    """
    k, n = RHS.shape
    elem = jnp.dtype(LHS.dtype).itemsize
    if (MASKED_SOLVER == "auto" and _pallas_ok(LHS.dtype)
            and _pallas_fits(k)):
        if float(n) * k ** 3 > _CG_MIN_WORK:
            # huge-width high-rank tier: the GJ elimination's O(n k^3)
            # VPU time dominates whole BPP iterations (tpu_batch23/25);
            # CG trades it for <= k+16 MXU matmuls
            return _cg_solve_block(LHS, RHS, passive, x0)
        # VMEM-resident kernel at EVERY rank (was k >= _COMPACT_MIN_K
        # only): the full-k elimination never touches HBM between pivots.
        # Measured BPP end-to-end, v5e reuters shape, within-process
        # (scripts/tpu_batch10/11): kernel vs XLA GJ — k=8 829 vs 563,
        # k=16 386 vs 195, k=32 193 vs 60 it/s; k >= 48 routed here
        # before this change (k=64 54, k=128 10-11 it/s with the
        # width-reduced pivot rounds, which only pay at those ranks).
        from .pallas_kernels import masked_gj_solve_pallas

        return masked_gj_solve_pallas(LHS, RHS, passive)
    # _COMPACT_MIN_K (48) <= _GJ_MAX_K (64), so the dispatch is two-way;
    # _chol_solve_block stays reachable via the width-reduced pivot path
    # and the compact path's overflow escalation
    block = (_compact_solve_block if k >= _COMPACT_MIN_K
             else _gj_solve_block)
    if k * (k + 1) * n * elem <= _GJ_BYTES_BUDGET:
        return block(LHS, RHS, passive)

    chunk = max(1024, _GJ_BYTES_BUDGET // (k * (k + 1) * elem))
    chunk = min(chunk, n)
    pad = (-n) % chunk
    RHS_p = jnp.pad(RHS, ((0, 0), (0, pad)))
    pas_p = jnp.pad(passive, ((0, 0), (0, pad)))
    nb = (n + pad) // chunk
    RHS_c = RHS_p.reshape(k, nb, chunk).transpose(1, 0, 2)
    pas_c = pas_p.reshape(k, nb, chunk).transpose(1, 0, 2)
    out = jax.lax.map(
        lambda args: block(LHS, args[0], args[1]),
        (RHS_c, pas_c),
    )  # (nb, k, chunk)
    return out.transpose(1, 0, 2).reshape(k, n + pad)[:, :n]


def _gj_solve_block(LHS, RHS, passive):
    """Batched masked SPD solve.

    LHS: (k, k), RHS: (k, n), passive: (k, n) bool.
    Returns X (k, n) with X = 0 on non-passive rows and
    LHS[p,p] X[p,j] = RHS[p,j] on passive rows of each column j.
    Non-SPD subproblems produce NaNs/Infs (detected by the caller),
    mirroring the reference's NonHPSDMatrixException failure path
    (normal_eq.hpp:18-35).

    Implementation: statically-unrolled batched Gauss-Jordan elimination.
    k is small (the factorization rank); unrolling gives pure vectorized
    VPU ops over the n-sized batch — ~40x faster on TPU than
    lax.linalg.cholesky + triangular_solve on (n, k, k) batches, whose tiny
    per-matrix loops the TPU executes serially.  No pivoting is needed:
    every pivot is a Schur complement of an SPD block (or a 1 from the
    identity rows), hence positive.
    """
    k, n = RHS.shape
    dtype = LHS.dtype
    p = passive.astype(dtype)  # (k, n)
    eye = jnp.eye(k, dtype=dtype)
    # Layout (k, k+1, n): the n-sized batch axis is last, so every
    # elimination step is a full-lane VPU op; (n, k, k) layouts pad the tiny
    # k x k minor dims to the (8, 128) tile and waste >90% of the lanes.
    # LHS may be shared (k, k) or per-column (k, k, n) — the compact path
    # gathers a different passive submatrix per column.
    lhs3 = LHS if LHS.ndim == 3 else LHS[:, :, None]
    M = (
        lhs3 * (p[:, None, :] * p[None, :, :])
        + eye[:, :, None] * (1.0 - p)[:, None, :]
    )  # (k, k, n)
    b = RHS * p  # (k, n)

    aug = jnp.concatenate([M, b[:, None, :]], axis=1)  # (k, k+1, n)
    unit = jnp.arange(k)
    # Dead-pivot guard: a zero factor row (dead topic) makes the passive
    # diagonal of LHS ~0.  Its RHS entry is also ~0 (both come from the
    # same dead row of H), so substituting the unit row — solution
    # component = 0, no elimination effect — is the exact solution of the
    # remaining nonsingular subsystem.  The reference instead throws
    # NonHPSDMatrixException and aborts the whole solve (normal_eq.hpp:
    # 18-35); handling it keeps large-k factorizations alive when topics
    # collapse.
    tiny = k * jnp.finfo(dtype).eps * (jnp.max(jnp.abs(LHS)) + 1.0)
    unit_rows = jnp.concatenate([eye, jnp.zeros((k, 1), dtype)], axis=1)
    for j in range(k):
        piv = aug[j, j, :]  # (n,)
        safe = jnp.abs(piv) > tiny
        piv_use = jnp.where(safe, piv, 1.0)
        row_j = jnp.where(
            safe[None, :], aug[j, :, :] / piv_use[None, :],
            unit_rows[j][:, None],
        )  # (k+1, n)
        factors = jnp.where(
            (unit == j)[:, None], 0.0, aug[:, j, :]
        )  # (k, n)
        factors = jnp.where(safe[None, :], factors, 0.0)
        aug = aug - factors[:, None, :] * row_j[None, :, :]
        aug = aug.at[j].set(row_j)
    return aug[:, k, :]  # (k, n)


def _compact_width(k: int) -> int:
    """Compacted subsystem rank: covers the p95 passive-set size with slack
    (measured k=128 BPP: mean ~30, p95 ~46 — see _COMPACT_MIN_K note)."""
    return int(min(k, max(32, ((k // 2 + 7) // 8) * 8)))


def _compact_solve_block(LHS, RHS, passive):
    """Masked SPD solve via per-column passive-support compaction.

    Columns are solved in an S x S subsystem (S = _compact_width(k))
    gathered from each column's passive indices; columns with more than S
    passive entries are re-solved in a narrow full-rank overflow tier, and
    the whole call escalates to the full-width full-rank path if the
    overflow tier itself is too narrow.  Exact for every input: the
    compacted GJ performs the same elimination sequence as the full masked
    GJ restricted to the passive rows (increasing index order).

    The per-column submatrix extraction and the scatter-back are one-hot
    MATMULS, not gathers: a TPU XLA gather of (S, S, n) elements runs at
    ~1 GB/s (measured 331 ms for what the MXU einsum does in ~5 ms), and a
    0/1 selection matmul under Precision.HIGHEST is EXACT (the bf16x3
    decomposition represents every f32 addend exactly; each output has one
    nonzero term).
    """
    k, n = RHS.shape
    dtype = LHS.dtype
    S = _compact_width(k)

    # passive indices first, in increasing order (stable sort of ~passive)
    order = jnp.argsort(~passive, axis=0, stable=True)  # (k, n)
    idx = order[:S]  # (S, n)
    m = jnp.take_along_axis(passive, idx, axis=0)  # (S, n): s < s_j
    E = (idx[:, :, None] == jnp.arange(k)[None, None, :]).astype(dtype)
    E = E * m[:, :, None]  # (S, n, k); pad rows select nothing
    T1 = jnp.einsum(
        "sjk,kl->sjl", E, LHS,
        precision=_PRECISION, preferred_element_type=LHS.dtype,
    )  # (S, n, k) rows of LHS at the passive indices
    sub = jnp.einsum(
        "sjl,tjl->stj", T1, E,
        precision=_PRECISION, preferred_element_type=LHS.dtype,
    )  # (S, S, n); pad rows/cols are all-zero -> unit rows added by the GJ
    rhs_sub = jnp.take_along_axis(RHS, idx, axis=0)  # (S, n)
    x_sub = _gj_solve_block(sub, rhs_sub, m)  # (S, n)
    # scatter back through the same one-hot operator (exact)
    X = jnp.einsum(
        "sjk,sj->kj", E, x_sub,
        precision=_PRECISION, preferred_element_type=LHS.dtype,
    )

    # overflow tier: columns with s_j > S, full rank, fixed narrow width
    over = jnp.sum(passive, axis=0) > S  # (n,)
    n_over = jnp.sum(over)

    def no_overflow(X):
        return X

    def overflow_tier(X):
        NO = min(n, max(128, n // 16))
        oids = jnp.argsort(~over, stable=True)[:NO]  # overflow cols first
        full = _gj_solve_block if k <= _GJ_MAX_K else _chol_solve_block
        Xo = full(LHS, RHS[:, oids], passive[:, oids])  # (k, NO)
        keep = over[oids][None, :]
        Xo = jnp.where(keep, Xo, X[:, oids])
        X = X.at[:, oids].set(Xo)

        def fits(X):
            return X

        def escalate(_):
            return full(LHS, RHS, passive)

        return jax.lax.cond(n_over <= NO, fits, escalate, X)

    return jax.lax.cond(n_over == 0, no_overflow, overflow_tier, X)


# Pivot rounds re-solve only non-optimal columns, gathered into a buffer
# of width ceil(n / _REDUCE_FRACTION) when the problem is wide and
# high-rank.  Each column's pivot state machine (passive set, P, Ninf) is
# INDEPENDENT of every other column's (nmf_solver_bpp.hpp:182-216 — no
# cross-column coupling), so deferring a column to a later round replays
# exactly the same per-column pivot sequence; only the scheduling
# changes.  With warm starts, the non-optimal set collapses to a few
# percent of columns after the first round, so this removes an O(n/NB)
# factor from every round after the first.
_REDUCE_FRACTION = 8
_REDUCE_MIN_N = 2048


def _pivot_cols(P, Ninf, nonopt, infeas, not_good, sel):
    """One pivot-rule update on the columns flagged in `sel`
    (UpdatePassiveSet nnls.cpp:18-74).  All inputs column-sliced to the
    same width.  Module-level so instrumentation probes can trace the
    exact production pivot logic."""
    cols1 = sel & (not_good < Ninf)
    cols2 = sel & (not_good >= Ninf) & (P >= 1)
    cols3 = sel & ~cols1 & ~cols2

    P = jnp.where(cols1, PBAR, jnp.where(cols2, P - 1, P))
    Ninf = jnp.where(cols1, not_good, Ninf)
    return P, Ninf, cols1, cols2, cols3


def _update_passive(passive, nonopt, infeas, cols1, cols2, cols3):
    w = passive.shape[0]
    rids = jnp.arange(w, dtype=jnp.int32)[:, None]
    # full-exchange for cols1|cols2: set nonopt bits, clear infeasible
    cc = (cols1 | cols2)[None, :]
    passive = (passive | (nonopt & cc)) & ~(infeas & cc)
    # backup rule for cols3: toggle the highest-index offending bit
    r1 = jnp.max(jnp.where(nonopt, rids, -1), axis=0)
    r2 = jnp.max(jnp.where(infeas, rids, -1), axis=0)
    toggle = (rids == jnp.maximum(r1, r2)[None, :]) & cols3[None, :]
    return passive ^ toggle


def nnls_blockpivot(LHS, RHS, Xinit):
    """Solve LHS @ X = RHS s.t. X >= 0 columnwise, LHS (k,k) SPD.

    Returns (X, Y, ok, rounds) where Y = LHS X - RHS is the gradient and
    `rounds` is the number of pivot rounds (masked solves after the
    initial one) — surfaced through BppState/NmfStats for the solve-tier
    instrumentation the 1M-doc work needs.
    Mirrors reference NnlsBlockpivot (nnls.hpp:144-244): warm start passive
    set from Xinit > 0; iteration cap 5k; small-value zeroing at 1e-12.
    """
    k, n = RHS.shape
    reduce_width = (n >= _REDUCE_MIN_N and k >= _COMPACT_MIN_K)
    max_iter = 5 * k * (_REDUCE_FRACTION if reduce_width else 1)
    eps = jnp.finfo(RHS.dtype).eps

    # Sign-test tolerances.  The reference zeroizes |x| < 1e-12 (nnls.hpp:
    # 215,226-227) so that f64 roundoff never flips an optimality test.  In
    # f32 the honest noise floors are much larger — for X the masked-solve
    # forward error ~ eps*kappa*|X|, and for Y = LHS X - RHS the residual
    # rounding ~ eps*(k*|LHS|*|X| + |RHS|) — and *modifying* values at
    # those magnitudes corrupts Y through the next matmul (empirically:
    # pivot cycling).  So instead of zeroizing, the optimality tests treat
    # anything above -delta as nonnegative; values are never altered, and
    # the final X is clamped at 0 (projection error <= delta_x).  For f64
    # the deltas collapse to ~1e-12, reproducing reference behavior.
    abs_lhs = jnp.abs(LHS)
    abs_rhs = jnp.abs(RHS)

    def deltas(X):
        # Per-entry bounds, not max-based: a max-based dual tolerance
        # scales with the largest Gram entry and turns into a feedback
        # loop (looser tests -> worse solutions -> larger factors ->
        # larger Gram -> looser tests).  The rounding of Y_ij = (LHS X)_ij
        # - RHS_ij is bounded by eps * (|LHS| |X| + |RHS|)_ij exactly.
        dx = 512.0 * eps * jnp.maximum(1.0, jnp.max(jnp.abs(X)))
        dy = 16.0 * eps * (gemm(abs_lhs, jnp.abs(X)) + abs_rhs)  # (k, n)
        return dx, dy

    passive = Xinit > 0
    X = _masked_solve(LHS, RHS, passive, x0=Xinit)
    Y = gemm(LHS, X) - RHS

    P = jnp.full((n,), PBAR, dtype=jnp.int32)
    Ninf = jnp.full((n,), k + 1, dtype=jnp.int32)

    dx, dy = deltas(X)
    nonopt = (Y < -dy) & ~passive
    infeas = (X < -dx) & passive
    not_good = (
        jnp.sum(nonopt, axis=0) + jnp.sum(infeas, axis=0)
    ).astype(jnp.int32)

    def cond(carry):
        X, Y, passive, P, Ninf, nonopt, infeas, not_good, it = carry
        return jnp.any(not_good > 0) & (it < max_iter)

    def body(carry):
        X, Y, passive, P, Ninf, nonopt, infeas, not_good, it = carry
        notopt_col = not_good > 0

        P, Ninf, cols1, cols2, cols3 = _pivot_cols(
            P, Ninf, nonopt, infeas, not_good, notopt_col
        )
        passive = _update_passive(passive, nonopt, infeas,
                                  cols1, cols2, cols3)

        # --- solve the non-optimal columns with the updated passive sets ---
        Xs = _masked_solve(LHS, RHS, passive, x0=X)
        Ys = gemm(LHS, Xs) - RHS
        mask = notopt_col[None, :]
        X = jnp.where(mask, Xs, X)
        Y = jnp.where(mask, Ys, Y)

        # --- BppUpdateSets (nnls.hpp:43-140), tolerance-based ---
        dx, dy = deltas(X)
        nonopt = mask & (Y < -dy) & ~passive
        infeas = mask & (X < -dx) & passive
        not_good = (
            jnp.sum(nonopt, axis=0) + jnp.sum(infeas, axis=0)
        ).astype(jnp.int32)
        return (X, Y, passive, P, Ninf, nonopt, infeas, not_good, it + 1)

    # Width ladder for the wide high-rank regime.  Measured trajectory
    # at the flagship 1M-doc k=128 shape (scripts/tpu_batch63): after a
    # W update essentially EVERY column needs pivoting (999,999 of 1M
    # flagged), and the non-optimal set then collapses geometrically
    # (119k -> 17.6k -> 107 -> 0 within a slab).  So the scheduler runs
    # FULL-WIDTH rounds while most columns are bad (zero gather waste,
    # one efficient pass), hands the survivors to an n/8 slab, and the
    # last stragglers to an n/128 tail slab — each tier gathers ONCE,
    # runs its pivot rounds slab-resident in a nested while_loop, and
    # scatters ONCE.  (The round-4 scheduler paid five full-(k, n)
    # scatters, a full dx pass, and a length-n argsort on EVERY round;
    # the loose-CG-tolerance control showed those streams, not the CG
    # steps, were the whole solve-tier cost.)
    NB = max(_REDUCE_MIN_N // _REDUCE_FRACTION, n // _REDUCE_FRACTION)
    NB2 = max(_REDUCE_MIN_N // _REDUCE_FRACTION,
              n // (16 * _REDUCE_FRACTION))

    def make_slab_round(nb, exit_below):
        """One gathered tier pass at width `nb`.  Gather up to nb
        non-optimal columns, run their pivot rounds on the (k, nb) slab
        until the slab's bad count drops to `exit_below` (0 = slab
        fully optimal; a positive threshold hands the tail to the next
        narrower tier), scatter back once.

        Semantics: per-column pivot state machines are independent
        (nmf_solver_bpp.hpp:182-216 — no cross-column coupling), and a
        column that passes its optimality test is never retested by the
        full-width body either (`mask` in `body`), so slab rounds
        replay exactly the per-column pivot sequences the full-width
        scheduling would — only the round scheduling differs.  The one
        global quantity, the dx infeasibility floor max|X|, is
        reproduced exactly: non-slab columns cannot change during the
        inner rounds, so max|X| == max(x_other, max|X_slab|) with
        x_other computed once at gather time."""

        def slab_round(carry):
            X, Y, passive, P, Ninf, nonopt, infeas, not_good, it = carry
            bad = not_good > 0
            ids = jnp.argsort(~bad, stable=True)[:nb]  # bad cols first

            Xs = X[:, ids]
            Ys = Y[:, ids]
            RHS_s = RHS[:, ids]
            abs_rhs_s = jnp.abs(RHS_s)
            passive_s = passive[:, ids]
            P_s = P[ids]
            Ninf_s = Ninf[ids]
            nonopt_s = nonopt[:, ids]
            infeas_s = infeas[:, ids]
            ng_s = not_good[ids]  # == 0 for padding (non-bad) columns

            col_max = jnp.max(jnp.abs(X), axis=0)  # one (k, n) pass
            x_other = jnp.max(col_max.at[ids].set(0.0))

            def inner_cond(c):
                live = jnp.sum((c[7] > 0).astype(jnp.int32))
                return (live > exit_below) & (c[8] < max_iter)

            def inner_body(c):
                (Xs, Ys, passive_s, P_s, Ninf_s, nonopt_s, infeas_s,
                 ng_s, it_i) = c
                sel = ng_s > 0
                P_s, Ninf_s, c1, c2, c3 = _pivot_cols(
                    P_s, Ninf_s, nonopt_s, infeas_s, ng_s, sel
                )
                # _update_passive is a no-op on non-selected columns
                # (all three cols masks are gated on sel)
                passive_s = _update_passive(passive_s, nonopt_s,
                                            infeas_s, c1, c2, c3)
                Xn = _masked_solve(LHS, RHS_s, passive_s, x0=Xs)
                Yn = gemm(LHS, Xn) - RHS_s
                Xs = jnp.where(sel[None, :], Xn, Xs)
                Ys = jnp.where(sel[None, :], Yn, Ys)
                dx = 512.0 * eps * jnp.maximum(
                    1.0, jnp.maximum(x_other, jnp.max(jnp.abs(Xs)))
                )
                dy_s = 16.0 * eps * (
                    gemm(abs_lhs, jnp.abs(Xs)) + abs_rhs_s
                )
                nonopt_s = jnp.where(sel[None, :],
                                     (Ys < -dy_s) & ~passive_s,
                                     nonopt_s)
                infeas_s = jnp.where(sel[None, :],
                                     (Xs < -dx) & passive_s, infeas_s)
                ng_s = jnp.where(
                    sel,
                    (jnp.sum(nonopt_s, axis=0)
                     + jnp.sum(infeas_s, axis=0)).astype(jnp.int32),
                    ng_s,
                )
                return (Xs, Ys, passive_s, P_s, Ninf_s, nonopt_s,
                        infeas_s, ng_s, it_i + 1)

            (Xs, Ys, passive_s, P_s, Ninf_s, nonopt_s, infeas_s, ng_s,
             it) = jax.lax.while_loop(
                inner_cond, inner_body,
                (Xs, Ys, passive_s, P_s, Ninf_s, nonopt_s, infeas_s,
                 ng_s, it),
            )

            # one scatter per tier pass (ids are unique; non-selected
            # slab columns scatter back their unchanged gathered state)
            X = X.at[:, ids].set(Xs)
            Y = Y.at[:, ids].set(Ys)
            passive = passive.at[:, ids].set(passive_s)
            P = P.at[ids].set(P_s)
            Ninf = Ninf.at[ids].set(Ninf_s)
            nonopt = nonopt.at[:, ids].set(nonopt_s)
            infeas = infeas.at[:, ids].set(infeas_s)
            not_good = not_good.at[ids].set(ng_s)
            return (X, Y, passive, P, Ninf, nonopt, infeas, not_good, it)

        return slab_round

    if reduce_width:
        big_round = make_slab_round(NB, max(1, NB2 // 2) if NB2 < NB
                                    else 0)
        tail_round = (make_slab_round(NB2, 0) if NB2 < NB
                      else big_round)

        def body_ladder(carry):
            nbad = jnp.sum((carry[7] > 0).astype(jnp.int32))

            def slab(carry):
                return jax.lax.cond(nbad > NB2, big_round, tail_round,
                                    carry)

            # more bad columns than the slab holds -> a full-width
            # round is both gather-free and waste-free
            return jax.lax.cond(nbad > NB, body, slab, carry)

        loop_body = body_ladder
    else:
        loop_body = body

    carry = (X, Y, passive, P, Ninf, nonopt, infeas, not_good,
             jnp.zeros((), dtype=jnp.int32))
    X, Y, passive, P, Ninf, nonopt, infeas, not_good, it = jax.lax.while_loop(
        cond, loop_body, carry
    )

    converged = jnp.logical_not(jnp.any(not_good > 0))
    # isfinite, not just not-NaN: an f32 overflow in an ill-conditioned
    # masked solve yields +/-Inf with no NaN and must fail the attempt
    finite = jnp.all(jnp.isfinite(X)) & jnp.all(jnp.isfinite(Y))
    # project tiny tolerated negatives onto the constraint set
    X = jnp.maximum(X, 0.0)
    # zeroize dust relative to the SOLUTION's magnitude — scaling by the
    # RHS would wipe O(1) solutions whenever RHS ~ |A|^2 is large
    # (unnormalized count matrices); the reference's absolute 1e-12
    # (nnls.hpp) is the f64 special case of this
    X = zeroize_small(X, 8.0 * eps * jnp.maximum(1.0, jnp.max(X)))
    return X, Y, converged & finite, it


def nnls_hals(a_op, W, H, tol, max_iter):
    """Fixed-W NNLS via HALS sweeps, for flat-clustering refinement.

    Reference: NnlsHals (nnls.hpp:249-316).  Iterates UpdateH_Hals until the
    projected-gradient norm drops below tol * pg0.  Returns (W, H, success).
    Note the reference normalizes W/H on success.
    """
    from ..ops.dense import normalize_and_scale, projected_gradient_norm_single
    from .hals import update_h

    WtW = gemm(W.T, W)
    WtA = a_op.mm_tn(W)

    def cond(carry):
        H, pg0, pg, it, done = carry
        return jnp.logical_not(done) & (it < max_iter)

    def body(carry):
        H, pg0, pg, it, done = carry
        H = update_h(H, WtW, WtA)
        gradH = gemm(WtW, H) - WtA
        pg_new = projected_gradient_norm_single(gradH, H)
        pg0 = jnp.where(it == 0, pg_new, pg0)
        done = (it > 0) & (pg_new < tol * pg0)
        return (H, pg0, pg_new, it + 1, done)

    zero = jnp.zeros((), dtype=W.dtype)
    H, pg0, pg, it, done = jax.lax.while_loop(
        cond, body, (H, zero, zero, jnp.zeros((), jnp.int32),
                     jnp.zeros((), jnp.bool_))
    )
    W_out, H_out, _ = normalize_and_scale(W, H)
    W = jnp.where(done, W_out, W)
    H = jnp.where(done, H_out, H)
    return W, H, done
