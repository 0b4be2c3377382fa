"""Probe: Mosaic in-kernel dynamic gather rate from a VMEM table.

tpu_batch32 (in-loop timing): XLA's gather+einsum bucket product runs
~0.4 Gnnz/s (=104 GB/s of gathered bf16 rows) independent of table
size/precision/chunking — the per-row gather issue rate is the wall.
If a Pallas kernel can gather from a VMEM-resident table materially
faster, the fused ELL SpMM kernel (VERDICT r3 #4) is worth building.

Formulations probed (all table-in-VMEM):
  A. per-l column gather: L iterations of take(tbl, idx[:, l]) -> (TG, k)
     fused multiply-accumulate
  B. flat take over the whole (TG*L,) index block
Run:  python scripts/tpu_batch33.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 4
k = 128
B = 8192          # table rows (VMEM-resident slice): 8192*128*4 = 4 MB
G, L = 65536, 128  # 8.4M nnz


def inloop_time(fn, *args):
    s = float(fn(*args))
    t0 = time.perf_counter()
    s = float(fn(*args))
    return (time.perf_counter() - t0) / REPS


def bench_wrap(product):
    @jax.jit
    def bench(idx, vals, table):
        def body(i, acc):
            t2 = table + jnp.asarray(acc * 0.0, table.dtype)
            out = product(idx, vals, t2)
            return acc + out[0, 0]

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return bench


def main():
    print("devices:", jax.devices())
    nnz = G * L
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, B, (G, L)).astype(np.int32))
    vals = jnp.asarray(rs.rand(G, L).astype(np.float32))
    table = jnp.asarray(rs.rand(B, k).astype(np.float32))

    # XLA baseline at this size
    def xla_product(idx, vals, table):
        gb = jnp.take(table, idx.reshape(-1), axis=0).reshape(G, L, k)
        return jnp.einsum("gl,glk->gk", vals, gb,
                          preferred_element_type=jnp.float32)

    dt = inloop_time(bench_wrap(xla_product), idx, vals, table)
    print(f"XLA baseline: {dt*1e3:8.1f} ms  {nnz/dt/1e9:6.2f} Gnnz/s")

    def make_pallas(TG, kern):
        def product(idx, vals, table):
            return pl.pallas_call(
                kern,
                grid=(G // TG,),
                in_specs=[
                    pl.BlockSpec((TG, L), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TG, L), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, k), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TG, k), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((G, k), jnp.float32),
            )(idx, vals, table)

        return product

    # A: per-l column gathers via take_along_axis (indices shape ==
    # output shape — the element-wise gather pattern Mosaic lowers as a
    # per-lane sublane gather), accumulate over L
    def kern_A(idx_ref, vals_ref, table_ref, out_ref, *, TG):
        tbl = table_ref[:]

        def body(l, acc):
            ix = idx_ref[:, l]            # (TG,)
            ixb = jnp.broadcast_to(ix[:, None], (TG, k))
            g = jnp.take_along_axis(tbl, ixb, axis=0)  # (TG, k)
            return acc + vals_ref[:, l][:, None] * g

        out_ref[:] = jax.lax.fori_loop(
            0, L, body, jnp.zeros((TG, k), jnp.float32))

    for TG in (128, 256, 512):
        try:
            prod = make_pallas(TG, functools.partial(kern_A, TG=TG))
            dt = inloop_time(bench_wrap(prod), idx, vals, table)
            print(f"pallas A TG={TG}: {dt*1e3:8.1f} ms  "
                  f"{nnz/dt/1e9:6.2f} Gnnz/s")
        except Exception as e:
            print(f"pallas A TG={TG} FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # B: unrolled over L in chunks, still take_along_axis
    def kern_B(idx_ref, vals_ref, table_ref, out_ref, *, TG):
        tbl = table_ref[:]
        acc = jnp.zeros((TG, k), jnp.float32)
        for l in range(L):
            ixb = jnp.broadcast_to(idx_ref[:, l][:, None], (TG, k))
            g = jnp.take_along_axis(tbl, ixb, axis=0)
            acc = acc + vals_ref[:, l][:, None] * g
        out_ref[:] = acc

    for TG in (256,):
        try:
            prod = make_pallas(TG, functools.partial(kern_B, TG=TG))
            dt = inloop_time(bench_wrap(prod), idx, vals, table)
            print(f"pallas B TG={TG}: {dt*1e3:8.1f} ms  "
                  f"{nnz/dt/1e9:6.2f} Gnnz/s")
        except Exception as e:
            print(f"pallas B TG={TG} FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # correctness of the best formulation
    try:
        prod = make_pallas(256, functools.partial(kern_A, TG=256))
        out = jax.jit(prod)(idx, vals, table)
        ref = jax.jit(xla_product)(idx, vals, table)
        print("maxerr A:", float(jnp.max(jnp.abs(out - ref))))
    except Exception as e:
        print("A correctness FAILED", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
