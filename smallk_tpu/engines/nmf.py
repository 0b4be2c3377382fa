"""NMF engine facade: the dense/sparse x algorithm dispatch.

Reference: common/src/nmf.cpp
  - RunNmf (:55-170): dispatch over {dense,sparse} x {MU,HALS,RANK2,BPP}
  - Nmf (:173) / NmfSparse (:232): buffer-based entries with validation
  - NmfInitialize/NmfFinalize (:36-52): Elemental/MPI boot — replaced by
    JAX runtime init (implicit; `initialize` is kept for API parity)

TPU-native design: the dense/sparse split is resolved once into an A-operand
(ops.aop) and a single jitted solve loop serves all four algorithms.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common.options import (
    NmfOptions,
    NmfProgressAlgorithm,
    NmfStats,
)
from ..ops.aop import as_aop
from ..solvers.solve import nmf_solve

_initialized = False


def initialize() -> None:
    """API-parity shim for NmfInitialize (the JAX runtime self-initializes)."""
    global _initialized
    _initialized = True


def finalize() -> None:
    global _initialized
    _initialized = False


def is_initialized() -> bool:
    return _initialized


# --- dispatch-time budgeting ------------------------------------------
# Some environments kill any single device execution that runs too long:
# the axon relay's worker watchdog terminates XLA programs somewhere
# between ~30 and ~60 s (bisected, ROUND_NOTES r4 §1b — 30-iter programs
# always pass, ~60-iter programs at 250k-width k=64 always die,
# independent of tolerance).  A monolithic nmf_solve dispatch of
# max_iter iterations on a big operand can legitimately exceed that, so
# run_nmf auto-segments long solves: a short probe segment measures the
# real per-iteration device time, then the remaining iterations run in
# segments sized to ~half the budget.  Segmenting preserves the
# monolithic stopping criterion exactly — the solver states are
# reconstructible from (W, H) (BPP re-inits its Grams/warm starts from
# the factors; bit-equal), the PG_RATIO pg0 anchor carries across
# segments via SolveResult.prog_state -> pg0_hint, and DELTA_FNORM's
# W_prev is the previous segment's final W by construction.  The only
# divergence is check *scheduling*: convergence detection can lag by at
# most one iteration per segment boundary (local min_iter floors at 1).
#
# SMALLK_TPU_DISPATCH_BUDGET_S: override seconds (<= 0 disables);
# unset: 25 s on the axon relay backend, unlimited elsewhere.
_PROBE_ITERS = 5
_AXON_DEFAULT_BUDGET_S = 25.0


def _is_relay_backend() -> bool:
    """Is the device reached through the axon relay (whose worker
    watchdog kills long executions)?  The relay registers platform
    'axon' but normalizes `jax.default_backend()` to 'tpu'; the
    reliable marker is the PJRT platform_version string."""
    if jax.default_backend() == "axon":
        return True
    try:
        return "axon" in jax.devices()[0].client.platform_version
    except Exception:
        return False


def _dispatch_budget() -> Optional[float]:
    env = os.environ.get("SMALLK_TPU_DISPATCH_BUDGET_S")
    if env is not None:
        try:
            v = float(env)
        except ValueError:
            return None
        return v if v > 0 else None
    if _is_relay_backend():
        return _AXON_DEFAULT_BUDGET_S
    return None


def _est_iter_seconds(a_op, k: int, algorithm=None) -> float:
    """Crude per-iteration device-time estimate from measured anchors
    (docs/benchmarks.md roofline notes): gather products ~0.4 Gnnz/s on
    bucketed ELL, dense thin matmuls ~100 GB/s effective, and a solve
    tier calibrated to the 1M-doc k=128 BPP decomposition (~0.2 s of
    CG/pivot passes over (k, n+m) arrays — ~150 effective HBM passes;
    MU/HALS update tiers are ~10).  Only gates whether the probe-and-
    segment driver engages; the probe then measures the real rate, so
    the estimate errs toward engaging (an unnecessary probe costs one
    extra compile; a missed long dispatch dies on the watchdog)."""
    from ..common.options import NmfAlgorithm

    m, n = a_op.shape
    nnz = getattr(a_op, "padded_nnz", None) or getattr(a_op, "nnz", None)
    if nnz is not None:
        t_prod = 2.0 * float(nnz) / 0.4e9
    else:
        item = jnp.dtype(a_op.dtype).itemsize
        t_prod = 2.0 * float(m) * float(n) * item / 1e11
    passes = 150.0 if algorithm == NmfAlgorithm.BPP else 10.0
    t_solve = passes * float(k) * (float(m) + float(n)) * 4 / 4e11
    return t_prod + t_solve


def _run_segmented(a_op, W_dev, H_dev, opts: NmfOptions, budget: float):
    """Adaptive segment driver (see the budget note above).

    Returns the final SolveResult-like tuple fields the caller needs:
    (W, H, iterations, success, pivot_rounds)."""
    total = 0
    rounds = 0
    pg_hint = None
    use_hint = opts.prog_est_algorithm == NmfProgressAlgorithm.PG_RATIO
    seg_len = min(_PROBE_ITERS, opts.max_iter)
    t_iter = None
    res = None
    while total < opts.max_iter:
        seg_len = min(seg_len, opts.max_iter - total)
        # normalize=False: the monolithic run normalizes ONCE outside
        # the loop; normalizing per segment would perturb the factors
        # the next segment continues from (the driver normalizes at
        # the end instead)
        seg_opts = dataclasses.replace(
            opts,
            max_iter=seg_len,
            min_iter=min(max(1, opts.min_iter - total), seg_len),
            normalize=False,
        )
        if os.environ.get("SMALLK_TPU_DEBUG_DISPATCH"):
            import sys as _sys
            print(f"[seg] dispatch max_iter={seg_opts.max_iter} "
                  f"t_iter={t_iter}", file=_sys.stderr, flush=True)
        t0 = time.perf_counter()
        res = nmf_solve(a_op, W_dev, H_dev, seg_opts, pg0_hint=pg_hint)
        its = int(res.iterations)  # consume: a reliable dispatch fence
        wall = time.perf_counter() - t0
        if os.environ.get("SMALLK_TPU_DEBUG_DISPATCH"):
            import sys as _sys
            print(f"[seg] done its={its} wall={wall:.2f}s",
                  file=_sys.stderr, flush=True)
        total += its
        rounds += int(res.pivot_rounds)
        W_dev, H_dev = res.W, res.H
        if use_hint:
            pg_hint = res.prog_state
        if bool(res.converged) or not bool(res.success):
            break
        if total >= 2 * _PROBE_ITERS:
            # track the MINIMUM observed rate: compiles inflate
            # individual walls (including the second segment, whose
            # pg0_hint 0->scalar treedef change recompiles), and the
            # minimum converges to honest warm execution time
            rate = max(wall / max(its, 1), 1e-4)
            t_iter = rate if t_iter is None else min(t_iter, rate)
            fit = max(_PROBE_ITERS,
                      min(int(0.5 * budget / t_iter), 100_000))
            # quantize to powers of two: every distinct seg_len is a
            # separate compile of the whole solve program
            q = _PROBE_ITERS
            while q * 2 <= fit:
                q *= 2
            seg_len = q
    W_dev, H_dev = res.W, res.H
    if opts.normalize and bool(res.success):
        from ..ops.dense import normalize_and_scale

        W_dev, H_dev, _ = normalize_and_scale(W_dev, H_dev)
    return res._replace(W=W_dev, H=H_dev, iterations=jnp.asarray(total),
                        pivot_rounds=jnp.asarray(rounds))


def run_nmf(
    A,
    W0: np.ndarray,
    H0: np.ndarray,
    opts: NmfOptions,
    stats: Optional[NmfStats] = None,
):
    """Factor A ~= W H.

    A: ndarray (dense), scipy sparse, or a prebuilt AOp.
    W0/H0: host initializer arrays (m x k, k x n).
    Returns (W, H, success) as host float arrays; fills `stats` if given.

    Mirrors reference Nmf/NmfSparse semantics: size validation, wrap
    buffers, dispatch, run the solve loop, return factors.
    """
    opts.validate()
    dtype = jnp.dtype(opts.dtype)

    a_op = as_aop(A, dtype=jnp.dtype(opts.a_dtype or opts.dtype))
    m, n = a_op.shape
    if (m, n) != (opts.height, opts.width):
        raise ValueError(
            f"nmf: matrix is {m}x{n} but options say "
            f"{opts.height}x{opts.width}"
        )
    if W0.shape != (m, opts.k):
        raise ValueError(f"nmf: W initializer must be {m}x{opts.k}")
    if H0.shape != (opts.k, n):
        raise ValueError(f"nmf: H initializer must be {opts.k}x{n}")

    W_dev = jnp.asarray(np.ascontiguousarray(W0), dtype=dtype)
    H_dev = jnp.asarray(np.ascontiguousarray(H0), dtype=dtype)

    t0 = time.perf_counter()
    budget = _dispatch_budget()
    est = _est_iter_seconds(a_op, opts.k, opts.algorithm)
    if (budget is not None and opts.max_iter > 2 * _PROBE_ITERS
            and est * opts.max_iter > 0.3 * budget):
        result = _run_segmented(a_op, W_dev, H_dev, opts, budget)
    else:
        result = nmf_solve(a_op, W_dev, H_dev, opts)
    W = np.asarray(result.W)
    H = np.asarray(result.H)
    elapsed = time.perf_counter() - t0

    if stats is not None:
        stats.elapsed_us = int(elapsed * 1e6)
        stats.iteration_count = int(result.iterations)
        stats.pivot_rounds = int(result.pivot_rounds)

    return W, H, bool(result.success)
