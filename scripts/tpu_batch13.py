"""TPU batch 13: anatomy of the dense A-products at k=8 — which of the
two contractions is slow, does a pre-transposed copy help, what does
precision cost.  Sets the DenseAOp layout design."""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)

m, n, k = 12411, 7984, 8
rng = np.random.RandomState(0)
A32 = jnp.asarray(rng.rand(m, n), jnp.float32)
A16 = A32.astype(jnp.bfloat16)
At16 = A16.T.copy() if hasattr(A16.T, "copy") else jnp.asarray(A16.T)
At16 = jax.device_put(jnp.asarray(np.asarray(A16).T))  # materialized (n, m)
W = jnp.asarray(rng.rand(m, k), jnp.float32)
H = jnp.asarray(rng.rand(k, n), jnp.float32)

HI = jax.lax.Precision.HIGHEST
DE = jax.lax.Precision.DEFAULT


def timeit(f, *a, reps=50):
    g = jax.jit(f)
    r = g(*a)
    jax.block_until_ready(r)
    t1 = time.perf_counter()
    for _ in range(reps):
        r = g(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t1) / reps * 1000


def bench(label, f, *a):
    try:
        print(f"  {label}: {timeit(f, *a):.3f} ms", flush=True)
    except Exception:
        traceback.print_exc()


f32 = jnp.float32
bench("WtA = W.T @ A16 (HIGHEST)",
      lambda W, A: jnp.matmul(W.T, A, precision=HI,
                              preferred_element_type=f32), W, A16)
bench("WtA (DEFAULT)",
      lambda W, A: jnp.matmul(W.T, A, precision=DE,
                              preferred_element_type=f32), W, A16)
bench("AHt = A16 @ H.T (HIGHEST)",
      lambda A, H: jnp.matmul(A, H.T, precision=HI,
                              preferred_element_type=f32), A16, H)
bench("AHt (DEFAULT)",
      lambda A, H: jnp.matmul(A, H.T, precision=DE,
                              preferred_element_type=f32), A16, H)
bench("AHt via At16: (H @ At).T (HIGHEST)",
      lambda At, H: jnp.matmul(H, At, precision=HI,
                               preferred_element_type=f32).T, At16, H)
bench("WtA f32 A (HIGHEST)",
      lambda W, A: jnp.matmul(W.T, A, precision=HI,
                              preferred_element_type=f32), W, A32)
bench("AHt f32 A (HIGHEST)",
      lambda A, H: jnp.matmul(A, H.T, precision=HI,
                              preferred_element_type=f32), A32, H)
bench("both products, shared A16 (HIGHEST)",
      lambda A, W, H: (
          jnp.matmul(W.T, A, precision=HI, preferred_element_type=f32),
          jnp.matmul(A, H.T, precision=HI, preferred_element_type=f32),
      ), A16, W, H)
bench("both, A16 + At16 (HIGHEST)",
      lambda A, At, W, H: (
          jnp.matmul(W.T, A, precision=HI, preferred_element_type=f32),
          jnp.matmul(H, At, precision=HI, preferred_element_type=f32).T,
      ), A16, At16, W, H)

# wider factor ranks for context
for kk in (32, 128):
    Wk = jnp.asarray(rng.rand(m, kk), jnp.float32)
    Hk = jnp.asarray(rng.rand(kk, n), jnp.float32)
    bench(f"k={kk} WtA (HIGHEST)",
          lambda W, A: jnp.matmul(W.T, A, precision=HI,
                                  preferred_element_type=f32), Wk, A16)
    bench(f"k={kk} AHt (HIGHEST)",
          lambda A, H: jnp.matmul(A, H.T, precision=HI,
                                  preferred_element_type=f32), A16, Hk)
print("[done]", flush=True)
