"""Probe: per-product stream rates of the rank-2 iteration at 20news
shape, + transposed-copy and fp8-storage variants.

tpu_batch36/37: the chain iteration streams A_sub at ~430 GB/s
effective (52% of v5e HBM peak) and 20news-shape hierclust sits ~1.33x
above the >=10x target.  Questions:
  1. Is one of the two products (W'A vs AH') layout-crippled?
  2. Does a transposed copy of A fix it (memory 2x)?
  3. Does fp8 storage halve the stream time (quality checked later)?

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch39.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

REPS = 16
HI = jax.lax.Precision.HIGHEST


def inloop(fn_one, *args):
    @jax.jit
    def bench(*a):
        def body(i, acc):
            return acc + fn_one(acc, *a)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    s = float(bench(*args))
    t0 = time.perf_counter()
    s = float(bench(*args))
    return (time.perf_counter() - t0) / REPS


def main():
    jax.device_get(jnp.zeros((1,)))
    m, w = 39727, 6144
    rs = np.random.RandomState(0)
    A = jnp.asarray(rs.rand(m, w), dtype=jnp.bfloat16)
    AT = A.T.copy() if hasattr(A.T, "copy") else jnp.asarray(A.T)
    W = jnp.asarray(rs.rand(m, 2).astype(np.float32))
    H = jnp.asarray(rs.rand(2, w).astype(np.float32))
    nbytes = m * w * 2

    def mm_tn(acc, A, W):
        Wp = W + acc * 0.0
        r = jnp.matmul(Wp.T, A.astype(jnp.float32), precision=HI)
        return jnp.sum(r) * 1e-20

    def mm_nt(acc, A, H):
        Hp = H + acc * 0.0
        r = jnp.matmul(A.astype(jnp.float32), Hp.T, precision=HI)
        return jnp.sum(r) * 1e-20

    dt = inloop(mm_tn, A, W)
    print(f"mm_tn (W'A)         : {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:5.0f} GB/s")
    dt = inloop(mm_nt, A, H)
    print(f"mm_nt (AH')         : {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:5.0f} GB/s")

    # transposed-copy variants: compute the same results from A^T
    def mm_tn_T(acc, AT, W):
        Wp = W + acc * 0.0
        r = jnp.matmul(AT.astype(jnp.float32), Wp, precision=HI)  # (w,2)
        return jnp.sum(r) * 1e-20

    def mm_nt_T(acc, AT, H):
        Hp = H + acc * 0.0
        r = jnp.matmul(Hp, AT.astype(jnp.float32), precision=HI)  # (2,m)
        return jnp.sum(r) * 1e-20

    dt = inloop(mm_tn_T, AT, W)
    print(f"mm_tn via A^T       : {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:5.0f} GB/s")
    dt = inloop(mm_nt_T, AT, H)
    print(f"mm_nt via A^T       : {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:5.0f} GB/s")

    # no-convert variants (bf16 inputs straight into the matmul)
    def mm_tn_bf(acc, A, W):
        Wp = (W + acc * 0.0).astype(jnp.bfloat16)
        r = jnp.matmul(Wp.T, A, precision=HI,
                       preferred_element_type=jnp.float32)
        return jnp.sum(r) * 1e-20

    dt = inloop(mm_tn_bf, A, W)
    print(f"mm_tn bf16-direct   : {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:5.0f} GB/s")

    def mm_nt_bf(acc, A, H):
        Hp = (H + acc * 0.0).astype(jnp.bfloat16)
        r = jnp.matmul(A, Hp.T, precision=HI,
                       preferred_element_type=jnp.float32)
        return jnp.sum(r) * 1e-20

    dt = inloop(mm_nt_bf, A, H)
    print(f"mm_nt bf16-direct   : {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:5.0f} GB/s")

    # fp8 storage
    try:
        A8 = A.astype(jnp.float8_e4m3fn)
        dt = inloop(mm_tn, A8, W)
        print(f"mm_tn fp8-stored    : {dt*1e3:7.3f} ms  "
              f"{m*w/dt/1e9:5.0f} GB/s(1B)")
        dt = inloop(mm_nt, A8, H)
        print(f"mm_nt fp8-stored    : {dt*1e3:7.3f} ms  "
              f"{m*w/dt/1e9:5.0f} GB/s(1B)")
    except Exception as e:
        print(f"fp8 FAILED: {type(e).__name__}: {str(e)[:150]}")

    # a raw columnwise reduction = pure stream ceiling reference
    def colsum(acc, A):
        r = jnp.sum(A.astype(jnp.float32) + acc * 0.0, axis=0)
        return jnp.sum(r) * 1e-20

    dt = inloop(colsum, A)
    print(f"raw colsum ceiling  : {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:5.0f} GB/s")


if __name__ == "__main__":
    main()
