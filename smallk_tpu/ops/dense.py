"""Dense matrix helper ops (jit-friendly, TPU-first).

Replaces the reference's Elemental-backed free functions
(common/include/dense_matrix_ops.hpp, normalize.hpp, projected_gradient.hpp)
with pure jnp equivalents.  All functions are shape-preserving and traceable;
matmuls request float32 accumulation for the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Full-precision matmuls everywhere in the solver path.  TPU default matmul
# precision decomposes f32 into a single bf16 pass (~8 mantissa bits); the
# NNLS/BPP sign tests and the 2x2 Givens solves are numerically meaningless
# at that precision (empirically: pivot-loop cycling).  HIGHEST = 6-pass
# bf16 = true f32, still MXU-resident.
_PRECISION = jax.lax.Precision.HIGHEST


def _pet(x):
    """preferred_element_type for MXU accumulation: f32 min, or wider."""
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def gemm_tn(X, Y):
    """X^T @ Y with MXU-friendly accumulation."""
    return jnp.matmul(
        X.T, Y, precision=_PRECISION, preferred_element_type=_pet(X)
    ).astype(X.dtype)


def gemm_nt(X, Y):
    """X @ Y^T."""
    return jnp.matmul(
        X, Y.T, precision=_PRECISION, preferred_element_type=_pet(X)
    ).astype(X.dtype)


def gemm(X, Y):
    return jnp.matmul(
        X, Y, precision=_PRECISION, preferred_element_type=_pet(X)
    ).astype(X.dtype)


def gram(X):
    """X^T X (k x k when X is m x k)."""
    return gemm_tn(X, X)


def gram_t(X):
    """X X^T (k x k when X is k x n)."""
    return gemm_nt(X, X)


def fro_norm(X):
    return jnp.sqrt(jnp.sum(jnp.square(X)))


def normalize_and_scale(W, H):
    """Normalize columns of W to unit L2 and scale rows of H to compensate.

    Reference: NormalizeAndScale (common/include/normalize.hpp:118-161).
    Returns (W, H, norms).  The reference throws when a column norm is below
    machine epsilon; here we detect it via the returned norms (caller checks)
    and guard the division so no NaNs propagate.
    """
    norms = jnp.sqrt(jnp.sum(jnp.square(W), axis=0))  # (k,)
    eps = jnp.finfo(W.dtype).eps
    safe = jnp.maximum(norms, eps)
    W_out = W / safe[None, :]
    H_out = H * norms[:, None]
    return W_out, H_out, norms


def projected_gradient_norm(gradW, gradH, W, H):
    """Norm of the projected gradient over (W, H).

    Reference: ProjectedGradientNorm (projected_gradient.hpp:124-171):
    an element contributes when grad < 0 or the factor entry > 0.
    """
    mw = jnp.logical_or(gradW < 0, W > 0)
    mh = jnp.logical_or(gradH < 0, H > 0)
    sw = jnp.sum(jnp.where(mw, jnp.square(gradW), 0))
    sh = jnp.sum(jnp.where(mh, jnp.square(gradH), 0))
    return jnp.sqrt(sw + sh)


def projected_gradient_norm_single(gradM, M):
    """Single-matrix PG norm (projected_gradient.hpp:93-121)."""
    m = jnp.logical_or(gradM < 0, M > 0)
    return jnp.sqrt(jnp.sum(jnp.where(m, jnp.square(gradM), 0)))


def zeroize_small(X, threshold=1.0e-12):
    """Set |x| < threshold to zero (reference ZeroizeSmallValues)."""
    return jnp.where(jnp.abs(X) < threshold, jnp.zeros_like(X), X)


def relative_fnorm(A_dense, W, H):
    """||A - WH||_F / ||A||_F (reference common/include/relative_fnorm.hpp)."""
    diff = A_dense - gemm(W, H)
    return fro_norm(diff) / fro_norm(A_dense)
