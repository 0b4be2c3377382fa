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

import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..common.options import NmfOptions, NmfStats
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
    result = nmf_solve(a_op, W_dev, H_dev, opts)
    W = np.asarray(result.W)
    H = np.asarray(result.H)
    elapsed = time.perf_counter() - t0

    if stats is not None:
        stats.elapsed_us = int(elapsed * 1e6)
        stats.iteration_count = int(result.iterations)

    return W, H, bool(result.success)
