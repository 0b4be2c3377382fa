"""Probe: fixed (non-solve-iteration) cost inside a chain step on the
100-leaf graph operand — column-slab gather, per-step small-op floor.

 a. column gather cost at several widths on the (20000, 20001) fp8
    operand (in-loop, scalar-consumed)
 b. the same gather at bf16 and f32 (is 1-byte strided access the
    problem?)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch59.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

REPS = 20


def main():
    jax.device_get(jnp.zeros((1,)))
    m, n = 20000, 20001
    base = jax.jit(
        lambda: jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                                   jnp.float32)
    )()

    @jax.jit
    def gather_loop(A, idx):
        def body(i, acc):
            cols = jnp.take(A, (idx + i) % n, axis=1)
            return acc + cols[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    rs = np.random.RandomState(0)
    for dt_name, cast in (("fp8", jnp.float8_e4m3fn),
                          ("bf16", jnp.bfloat16),
                          ("f32", jnp.float32)):
        A = jax.jit(lambda x, c=cast: x.astype(c))(base)
        for w in (512, 2048, 10240):
            idx = jnp.asarray(np.sort(rs.choice(n, w, replace=False))
                              .astype(np.int32))
            float(gather_loop(A, idx))
            t0 = time.perf_counter()
            float(gather_loop(A, idx))
            d = (time.perf_counter() - t0) / REPS
            by = m * w * jnp.dtype(cast).itemsize
            print(f"colgather {dt_name:4s} w={w:6d}: {d * 1e3:7.2f} ms "
                  f"({by / d / 1e9:6.1f} GB/s logical)", flush=True)


if __name__ == "__main__":
    main()
