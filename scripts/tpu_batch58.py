"""Probe: rank-2 product stream rate on a wide graph slab by storage
dtype — is the fp8 dot paying an upcast pass per iteration?

Chained in-jit reps ending in a scalar fetch (trustworthy through the
tunnel).  Shapes: the 100-leaf root slab (20000 x 20480).  The operand
is an ARGUMENT of the jitted loop (a jit-closure constant of this size
can stall the tunnel shipping the embedded HLO constant).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch58.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

REPS = 30


@partial(jax.jit, static_argnums=())
def _loop(A, Wt):
    from smallk_tpu.ops.aop import DenseAOp

    op = DenseAOp(A)

    def body(i, Wt):
        H = op.mm_tn_t(Wt)          # (2, w)
        Wn = op.mm_nt_t(H)          # (2, m)
        s = jnp.max(jnp.abs(Wn)) + 1.0
        return Wn / s

    return jax.lax.fori_loop(0, REPS, body, Wt)[0, 0]


def main():
    jax.device_get(jnp.zeros((1,)))
    m, w = 20000, 20480
    rs = np.random.RandomState(0)
    base = jax.jit(
        lambda: jax.random.uniform(jax.random.PRNGKey(0), (m, w),
                                   jnp.float32)
    )()
    Wt0 = jnp.asarray(rs.rand(2, m), jnp.float32)

    def iter_cost(A, label):
        float(_loop(A, Wt0))
        t0 = time.perf_counter()
        float(_loop(A, Wt0))
        dt = (time.perf_counter() - t0) / REPS
        bytes_ideal = m * w * jnp.dtype(A.dtype).itemsize * 2
        print(f"{label:28s} {dt * 1e3:7.2f} ms/iter  "
              f"({bytes_ideal / dt / 1e9:6.0f} GB/s at storage width)",
              flush=True)

    iter_cost(base, "f32 slab")
    iter_cost(jax.jit(lambda x: x.astype(jnp.bfloat16))(base),
              "bf16 slab")
    A8 = jax.jit(lambda x: x.astype(jnp.float8_e4m3fn))(base)
    iter_cost(A8, "fp8 slab (as stored)")
    iter_cost(jax.jit(lambda x: x.astype(jnp.bfloat16))(A8),
              "fp8 -> bf16 once, then loop")


if __name__ == "__main__":
    main()
