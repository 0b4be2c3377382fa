"""Algorithm-agnostic NMF iteration driver.

Reference: common/include/nmf_solve_generic.hpp (NmfSolve :34-140):
  - one-time solver + estimator init
  - loop to max_iter calling the solver step
  - first `min_iter` iterations skip the progress check (but iteration 0
    still primes the estimator)
  - convergence after `tolcount` consecutive iterations with metric <= tol
  - optional NormalizeAndScale after the loop
  - reaching max_iter counts as success (:132-135)

TPU-native redesign: the whole loop is one lax.while_loop compiled on device
— no host round-trips per iteration.  Solver failure (singular system,
non-SPD Cholesky) is a boolean in the carry, mirroring the reference's
false-return failure ladder (§5.3 of SURVEY.md).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common.options import NmfAlgorithm, NmfOptions, NmfProgressAlgorithm
from ..ops.dense import normalize_and_scale
from . import bpp, hals, mu, rank2
from .progress import prog_init, prog_update

_SOLVERS = {
    NmfAlgorithm.MU: mu,
    NmfAlgorithm.HALS: hals,
    NmfAlgorithm.RANK2: rank2,
    NmfAlgorithm.BPP: bpp,
}


_DEBUG_PRINT_OK = None

# Module knob: carry the f32 rank-2 W factor transposed through the
# solve loop (see _nmf_solve_impl).  Measured on hardware
# (tpu_batch46, same session, element-threshold sequential siblings):
# 20news-shape 1.084 s transposed vs 1.036 s untransposed; 12c
# 0.266 vs 0.264 — XLA handles the lane-padded (m, 2) carries better
# than the padding model predicted, and the transposed products'
# dot_general orientation costs slightly more, so the default is OFF.
# The transposed path stays (tested, interpreter-parity) for shapes
# where the carry tax dominates.
TRANSPOSE_RANK2 = False


def _debug_print_supported() -> bool:
    """Probe once whether the backend supports host callbacks.

    Some PJRT plugins (e.g. the axon TPU tunnel) do not implement host
    send/recv callbacks, so jax.debug.print inside a compiled loop raises
    at run time; verbose mode then degrades to the end-of-run summary.
    """
    global _DEBUG_PRINT_OK
    if _DEBUG_PRINT_OK is None:
        if jax.default_backend() in ("axon",):
            _DEBUG_PRINT_OK = False
        else:
            try:
                # probe must mirror real usage (print under cond inside a
                # while_loop) or trivial programs may elide the callback
                def probe(x):
                    def body(c):
                        jax.lax.cond(
                            c[0] < 1,
                            lambda v: jax.debug.print(
                                "{v}", v=v, ordered=False
                            ),
                            lambda v: None,
                            c[1],
                        )
                        return (c[0] + 1, c[1])

                    return jax.lax.while_loop(
                        lambda c: c[0] < 2, body, (0, x)
                    )[1]

                jax.block_until_ready(jax.jit(probe)(jnp.zeros(())))
                _DEBUG_PRINT_OK = True
            except Exception:
                _DEBUG_PRINT_OK = False
        if not _DEBUG_PRINT_OK:
            print("smallk_tpu: backend lacks host callbacks; per-iteration "
                  "progress printing disabled")
    return _DEBUG_PRINT_OK


class SolveResult(NamedTuple):
    W: jnp.ndarray
    H: jnp.ndarray
    iterations: jnp.ndarray  # completed solver steps
    converged: jnp.ndarray   # metric criterion satisfied
    success: jnp.ndarray     # converged OR ran to max_iter without failure
    metric: jnp.ndarray      # last progress metric value
    # cumulative NNLS pivot rounds (BPP only; 0 elsewhere) — solve-tier
    # telemetry for the wide-matrix regime (§5.7)
    pivot_rounds: jnp.ndarray = 0
    # final progress-estimator state: the PG_RATIO pg0 anchor (scalar) or
    # the DELTA_FNORM W_prev.  Lets segmented drivers (auto-chunking,
    # checkpoint/resume) continue the EXACT monolithic stopping criterion
    # by passing pg0_hint=prog_state to the next segment.
    prog_state: jnp.ndarray = 0


def get_solver(algorithm: NmfAlgorithm):
    return _SOLVERS[algorithm]


def nmf_solve(a_op, W0, H0, opts: NmfOptions, pg0_hint=None) -> SolveResult:
    """Run the NMF iteration loop on device.

    `opts` is static: each (algorithm, shape) pair compiles once and is
    cached; hierclust reuses one compiled rank-2 loop for every tree node.

    `pg0_hint`: optional externally-supplied PG_RATIO denominator (the
    first-iteration PG of a random start, see `reference_pg1`).  Used when
    W0/H0 is a near-optimal (spectral) initializer: the ratio-to-own-start
    criterion is unreachable from a good start, so the tolerance is
    anchored to the random-start scale the reference semantics assume.
    """
    # capability check must run OUTSIDE the trace: probing inside would
    # inline the probe's callback into this program
    verbose_print = bool(opts.verbose) and _debug_print_supported()
    return _nmf_solve_impl(a_op, W0, H0, opts, verbose_print, pg0_hint)


@functools.partial(jax.jit, static_argnames=("opts",))
def reference_pg1(a_op, W0, H0, opts: NmfOptions):
    """PG after ONE solver step from (W0, H0) — the reference's PG_1
    (progress_estimator_generic.hpp:75-109 primes pg0 on iteration 1)."""
    from ..ops.dense import projected_gradient_norm

    solver = get_solver(opts.algorithm)
    st = solver.init(a_op, W0, H0)
    W, H, gW, gH, st, ok = solver.step(a_op, W0, H0, st)
    return projected_gradient_norm(gW, gH, W, H)


@functools.partial(jax.jit, static_argnames=("opts", "verbose_print"))
def _nmf_solve_impl(a_op, W0, H0, opts: NmfOptions,
                    verbose_print: bool, pg0_hint=None) -> SolveResult:
    solver = get_solver(opts.algorithm)
    method = opts.prog_est_algorithm

    # f32 rank-2 carries W TRANSPOSED through the loop: a (m, 2) carry
    # is lane-padded 64x on TPU and every materialization pays it in
    # real HBM bytes (see solvers/rank2 step_t).  The PG-norm math is
    # orientation-invariant, so only the entry/exit transposes differ.
    # f64 stays untransposed (pinned by the numpy trajectory oracles).
    transpose_w = (TRANSPOSE_RANK2
                   and opts.algorithm == NmfAlgorithm.RANK2
                   and W0.dtype == jnp.float32)
    if transpose_w:
        solver = rank2.transposed
        W0 = W0.T

    solver_state = solver.init(a_op, W0, H0)
    prog_state = prog_init(method, W0)
    have_pg0 = (pg0_hint is not None
                and method == NmfProgressAlgorithm.PG_RATIO)
    if have_pg0:
        prog_state = jnp.asarray(pg0_hint, W0.dtype)

    gradW0 = jnp.zeros_like(W0)
    gradH0 = jnp.zeros_like(H0)
    zero_i = jnp.zeros((), jnp.int32)
    false_ = jnp.zeros((), jnp.bool_)
    one_f = jnp.ones((), W0.dtype)

    # Steps per while-loop trip: the loop machinery costs a fixed floor
    # per trip; tiny/thin problems (HALS at 256^2, deep hierclust
    # buckets) are floor-bound, so U steps run per trip.  The freeze
    # logic makes overshoot steps no-ops — semantics identical to U=1.
    # (measured: the trivial while-loop floor on this device is
    # ~0.7 us/trip, tpu_batch43 — per-trip overhead is negligible, so
    # auto stays at 1; the knob remains for explicit experiments)
    unroll = max(1, opts.loop_unroll)

    def cond(carry):
        (W, H, gW, gH, sstate, pstate, it, sc, metric, done, failed,
         best, stall) = carry
        return (it < opts.max_iter) & ~done & ~failed

    def body(carry):
        for _ in range(unroll):
            carry = one_step(carry)
        return carry

    def one_step(carry):
        (W, H, gW, gH, sstate, pstate, it, sc, metric, done, failed,
         best, stall) = carry

        # Freeze finished problems: standalone, the loop exits on
        # done/failed so this is a no-op; under vmap the while_loop runs
        # until ALL batch elements finish, and without gating the
        # already-converged elements would keep iterating.  This makes
        # jax.vmap(nmf_solve-over-stacked-problems) correct, e.g. for
        # batching independent hierclust node factorizations.
        frozen = done | failed
        W0_, H0_, gW0_, gH0_, sstate0_ = W, H, gW, gH, sstate

        W, H, gW, gH, sstate, ok = solver.step(a_op, W, H, sstate)
        W = jnp.where(frozen, W0_, W)
        H = jnp.where(frozen, H0_, H)
        gW = jnp.where(frozen, gW0_, gW)
        gH = jnp.where(frozen, gH0_, gH)
        sstate = jax.tree.map(
            lambda new, old: jnp.where(frozen, old, new), sstate, sstate0_
        )
        failed = failed | (~ok & ~frozen)

        pstate0_, metric0_, sc0_, best0_, stall0_ = (
            pstate, metric, sc, best, stall
        )

        # progress estimation: iteration 0 always primes the estimator;
        # checks begin at min_iter (reference :81-95) and run every
        # `check_interval` iterations (1 == reference behavior)
        interval = max(1, opts.check_interval)
        at_check = (it >= opts.min_iter) & (
            ((it - opts.min_iter) % interval) == 0
        )
        do_update = (it == 0) | at_check

        def upd(pstate):
            return prog_update(method, it, W, H, gW, gH, pstate, have_pg0)

        metric_new, pstate = jax.lax.cond(
            do_update, upd, lambda s: (metric, s), pstate
        )
        metric = metric_new

        check = at_check & ~failed
        hit = check & (metric <= opts.tol)
        sc = jnp.where(check, jnp.where(hit, sc + 1, 0), sc)
        done = done | (check & (sc >= opts.tolcount))

        if opts.stall_patience is not None:
            improved = metric < 0.99 * best
            best = jnp.where(check & improved, metric, best)
            stall = jnp.where(
                check, jnp.where(improved, 0, stall + 1), stall
            )
            done = done | (check & (stall >= opts.stall_patience))

        if verbose_print:
            # reference cadence: iterations 1-9, then every 10th
            # (nmf_progress_estimation.hpp:20-33)
            show = ((it + 1) < 10) | (((it + 1) % 10) == 0)

            def _report(args):
                i, m = args
                jax.debug.print(
                    "{it}:\tprogress metric:\t{m}", it=i, m=m, ordered=False,
                )

            jax.lax.cond(show, _report, lambda a: None, (it + 1, metric))

        # second half of the freeze: scalar convergence state
        pstate = jax.tree.map(
            lambda new, old: jnp.where(frozen, old, new), pstate, pstate0_
        )
        metric = jnp.where(frozen, metric0_, metric)
        sc = jnp.where(frozen, sc0_, sc)
        best = jnp.where(frozen, best0_, best)
        stall = jnp.where(frozen, stall0_, stall)
        it = jnp.where(frozen, it, it + 1)

        return (W, H, gW, gH, sstate, pstate, it, sc, metric, done,
                failed, best, stall)

    carry = (
        W0, H0, gradW0, gradH0, solver_state, prog_state,
        zero_i, zero_i, one_f, false_, false_,
        jnp.full((), jnp.inf, W0.dtype), zero_i,
    )
    (W, H, gW, gH, sstate, pstate, it, sc, metric, done, failed,
     best, stall) = jax.lax.while_loop(cond, body, carry)

    if transpose_w:
        W = W.T

    if opts.normalize:
        W_n, H_n, _ = normalize_and_scale(W, H)
        W = jnp.where(failed, W, W_n)
        H = jnp.where(failed, H, H_n)

    # reaching max_iter without failure counts as success (reference :132-135)
    success = ~failed & (done | (it >= opts.max_iter))
    rounds = getattr(sstate, "pivot_rounds", jnp.zeros((), jnp.int32))
    return SolveResult(
        W=W, H=H, iterations=it, converged=done, success=success,
        metric=metric, pivot_rounds=rounds, prog_state=pstate,
    )
