"""Matrix generation engine.

Reference: matrixgen/src/main.cpp:49-116 (seven generator types) and
common/include/matrix_generator.hpp (RandomMatrix / RandomSparseMatrix).
Generator type names/semantics follow the reference CLI docs
(sphinx/source/pages_commandLineTools.rst:168-175).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..common.rng import Random, random_matrix

GENERATOR_TYPES = (
    "UNIFORM",
    "DENSE_DIAG",
    "SPARSE_DIAG",
    "IDENTITY",
    "ONES",
    "ZEROS",
    "SPARSE",
)


def generate(
    height: int,
    width: int,
    kind: str = "UNIFORM",
    rng: Random | None = None,
    center: float = 0.5,
    radius: float = 0.5,
    nz_per_col: int = 1,
    dtype=np.float64,
):
    """Generate a matrix of the requested type.

    Returns an ndarray for dense types, scipy CSC for sparse types.
    """
    kind = kind.upper()
    if kind not in GENERATOR_TYPES:
        raise ValueError(f"matrixgen: unknown type {kind!r}")
    rng = rng or Random()

    if kind == "UNIFORM":
        return random_matrix(height, width, rng, center, radius, dtype)
    if kind == "DENSE_DIAG":
        d = min(height, width)
        out = np.zeros((height, width), dtype=dtype)
        out[np.arange(d), np.arange(d)] = rng.uniform(d, center, radius, dtype)
        return out
    if kind == "SPARSE_DIAG":
        d = min(height, width)
        vals = rng.uniform(d, center, radius, dtype)
        return sp.csc_matrix(
            (vals, (np.arange(d), np.arange(d))), shape=(height, width), dtype=dtype
        )
    if kind == "IDENTITY":
        out = np.zeros((height, width), dtype=dtype)
        d = min(height, width)
        out[np.arange(d), np.arange(d)] = 1.0
        return out
    if kind == "ONES":
        return np.ones((height, width), dtype=dtype)
    if kind == "ZEROS":
        return np.zeros((height, width), dtype=dtype)

    # SPARSE: nz_per_col random nonzeros in each column.  Drawn from the
    # live engine stream — the reference's RandomSparseMatrix advances the
    # ongoing Random engine (sparse_matrix_ops.hpp:317), so two calls on
    # the same Random instance must produce different matrices.
    nz_per_col = max(1, min(int(nz_per_col), height))
    rows = np.empty(nz_per_col * width, dtype=np.int64)
    vals = np.empty(nz_per_col * width, dtype=dtype)
    cols = np.repeat(np.arange(width, dtype=np.int64), nz_per_col)
    for c in range(width):
        sel = rng.choice(height, size=nz_per_col, replace=False)
        rows[c * nz_per_col : (c + 1) * nz_per_col] = sel
        vals[c * nz_per_col : (c + 1) * nz_per_col] = rng.uniform(
            nz_per_col, center, radius, dtype
        )
    return sp.csc_matrix((vals, (rows, cols)), shape=(height, width), dtype=dtype)


def random_sparse_matrix(
    rng: Random,
    height: int,
    width: int,
    nz_per_col: int,
    dtype=np.float64,
) -> sp.csc_matrix:
    """Library-level random sparse generator (reference RandomSparseMatrix)."""
    return generate(
        height, width, "SPARSE", rng=rng, nz_per_col=nz_per_col, dtype=dtype
    )
