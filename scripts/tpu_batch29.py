"""Probe: can Mosaic lower an in-kernel dynamic gather (jnp.take with a
traced index vector) from a VMEM-resident table, and at what rate?

Decides the design of the fused ELL gather-SpMM kernel (VERDICT r3 #4):
the bucketed products currently run gather + einsum as separate XLA ops
at 176-199 GB/s of gathered volume (~24% of v5e HBM peak) because every
table row read is a 256-byte random HBM access.  If the table slice is
VMEM-resident inside a Pallas kernel, the random reads are on-chip and
HBM traffic drops to idx+vals+outputs.

Run:  python scripts/tpu_batch29.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print("devices:", jax.devices())
    k = 128
    B = 8192          # table rows (doc-block slice)
    G, L = 8192, 128  # bucket rows x nnz-per-row

    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, B, (G, L)).astype(np.int32))
    vals = jnp.asarray(rs.rand(G, L).astype(np.float32))
    table = jnp.asarray(rs.rand(B, k), dtype=jnp.bfloat16)

    # --- reference: XLA gather + einsum (the current _bucket_product)
    @jax.jit
    def xla_product(idx, vals, table):
        g = jnp.take(table, idx.reshape(-1), axis=0).reshape(G, L, k)
        return jnp.einsum("gl,glk->gk", vals, g.astype(jnp.float32),
                          preferred_element_type=jnp.float32)

    dt, ref = timeit(xla_product, idx, vals, table)
    gathered = G * L * k * 2
    print(f"XLA gather+einsum: {dt*1e3:.2f} ms, "
          f"{gathered/dt/1e9:.1f} GB/s gathered")

    # --- pallas kernel: table resident in VMEM, tile over bucket rows
    TG = 256  # bucket rows per grid step

    def kernel(idx_ref, vals_ref, table_ref, out_ref):
        tbl = table_ref[:].astype(jnp.float32)   # (B, k) in VMEM
        ix = idx_ref[:]                          # (TG, L)
        vl = vals_ref[:]                         # (TG, L)
        g = jnp.take(tbl, ix.reshape(-1), axis=0).reshape(TG, L, k)
        out_ref[:] = jnp.einsum(
            "gl,glk->gk", vl, g, preferred_element_type=jnp.float32)

    @jax.jit
    def pallas_product(idx, vals, table):
        return pl.pallas_call(
            kernel,
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

    try:
        dt_p, out = timeit(pallas_product, idx, vals, table)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"pallas take(flat): {dt_p*1e3:.2f} ms, "
              f"{gathered/dt_p/1e9:.1f} GB/s gathered, maxerr {err:.2e}")
    except Exception as e:
        print(f"pallas take(flat) FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # --- variant: row-at-a-time fori_loop with dynamic slices (always
    # lowers; the question is rate)
    def kernel2(idx_ref, vals_ref, table_ref, out_ref):
        tbl = table_ref[:].astype(jnp.float32)

        def body(r, _):
            ix = idx_ref[r, :]                    # (L,)
            vl = vals_ref[r, :]
            g = jnp.take(tbl, ix, axis=0)         # (L, k)
            out_ref[r, :] = jnp.sum(vl[:, None] * g, axis=0)
            return 0

        jax.lax.fori_loop(0, TG, body, 0)

    @jax.jit
    def pallas_product2(idx, vals, table):
        return pl.pallas_call(
            kernel2,
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

    try:
        dt2, out2 = timeit(pallas_product2, idx, vals, table)
        err2 = float(jnp.max(jnp.abs(out2 - ref)))
        print(f"pallas take(row loop): {dt2*1e3:.2f} ms, "
              f"{gathered/dt2/1e9:.1f} GB/s gathered, maxerr {err2:.2e}")
    except Exception as e:
        print(f"pallas take(row loop) FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # --- XLA with a small table (does locality alone fix the rate?)
    for Bs in (2048, 8192, 32768, 131072):
        idx_s = jnp.asarray(rs.randint(0, Bs, (G, L)).astype(np.int32))
        tbl_s = jnp.asarray(rs.rand(Bs, k), dtype=jnp.bfloat16)

        @jax.jit
        def xla_s(idx, vals, table):
            g = jnp.take(table, idx.reshape(-1), axis=0).reshape(G, L, k)
            return jnp.einsum("gl,glk->gk", vals, g.astype(jnp.float32),
                              preferred_element_type=jnp.float32)

        dt_s, _ = timeit(xla_s, idx_s, vals, tbl_s)
        print(f"XLA table {Bs:>7} rows ({Bs*k*2/1e6:.1f} MB): "
              f"{dt_s*1e3:.2f} ms, {gathered/dt_s/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
