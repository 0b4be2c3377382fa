"""Feasibility probe: VMEM-resident rank-2 iteration floor.

The narrow-bucket rank-2 solves are bound by the per-iteration op-issue
floor of the XLA while_loop body (~0.05 ms/iter at width 512), not by
streaming.  This kernel runs N product iterations (Wt A -> H, H A^T ->
Wt, normalize) with the slab RESIDENT IN VMEM, one Pallas program — the
attainable floor for a whole-solve kernel (round-5 candidate).  Not a
full solver: no active set / progress logic, products + normalize only,
so the number is a lower bound.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch60.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 200


def kernel(A_ref, Wt_ref, out_ref):
    A = A_ref[:]  # (m, w) resident

    def body(i, Wt):
        H = jnp.dot(Wt, A, preferred_element_type=jnp.float32)  # (2, w)
        Wn = jax.lax.dot_general(
            H, A, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2, m)
        s = jnp.max(jnp.abs(Wn)) + 1.0
        return (Wn / s).astype(Wt.dtype)

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, Wt_ref[:])


@partial(jax.jit, static_argnums=())
def pallas_loop(A, Wt):
    m, w = A.shape
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, m), jnp.float32),
    )(A, Wt)


@partial(jax.jit, static_argnums=())
def xla_loop(A, Wt):
    def body(i, Wt):
        H = jnp.dot(Wt, A, preferred_element_type=jnp.float32)
        Wn = jax.lax.dot_general(
            H, A, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.max(jnp.abs(Wn)) + 1.0
        return (Wn / s).astype(Wt.dtype)

    return jax.lax.fori_loop(0, ITERS, body, Wt)


def main():
    jax.device_get(jnp.zeros((1,)))
    for m, w, dt in ((12411, 512, jnp.bfloat16),
                     (12411, 512, jnp.float32),
                     (20000, 512, jnp.bfloat16),
                     (12411, 2048, jnp.bfloat16)):
        A = jax.jit(lambda m=m, w=w, dt=dt: jax.random.uniform(
            jax.random.PRNGKey(0), (m, w)).astype(dt))()
        Wt = jnp.zeros((2, m), jnp.float32) + 0.5
        for name, fn in (("pallas", pallas_loop), ("xla", xla_loop)):
            try:
                float(fn(A, Wt)[0, 0])
                t0 = time.perf_counter()
                float(fn(A, Wt)[0, 0])
                d = (time.perf_counter() - t0) / ITERS
                print(f"{name:7s} m={m} w={w} {np.dtype(A.dtype).name:9s}"
                      f" {d * 1e6:7.1f} us/iter", flush=True)
            except Exception as e:
                print(f"{name:7s} m={m} w={w} FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
