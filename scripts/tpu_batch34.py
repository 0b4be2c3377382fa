"""Probe: gather-product formulations that avoid materializing the
(g, L, k) gathered intermediate.

tpu_batch32 measured the as-is einsum path at ~0.4 Gnnz/s; the numbers
are consistent with XLA materializing the gathered f32 intermediate in
HBM (einsum -> dot_general requires a materialized operand).  A
reduce-formulation (jnp.sum of multiply(gather)) is input-fusable: the
gather feeds the reduce without a round trip.  Pallas dynamic_gather is
dead on this toolchain (libtpu crashes beyond one (8,128) vreg,
tpu_batch33 + inline probes).

Run:  python scripts/tpu_batch34.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

REPS = 8


def main():
    print("devices:", jax.devices())
    B = 65537
    G, L = 524288, 128   # 67M nnz — dominant bucket at 1M docs
    nnz = G * L

    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, B - 1, (G, L)).astype(np.int32))
    vals_bf = jnp.asarray(rs.rand(G, L), dtype=jnp.bfloat16)
    tbl_bf = jnp.asarray(rs.rand(B, 128), dtype=jnp.bfloat16)

    def run_case(name, product, *args):
        @jax.jit
        def bench(idx, vals, table):
            def body(i, acc):
                t2 = table + jnp.asarray(acc * 0.0, table.dtype)
                out = product(idx, vals, t2)
                return acc + out[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        try:
            s = float(bench(*args))
            t0 = time.perf_counter()
            s = float(bench(*args))
            dt = (time.perf_counter() - t0) / REPS
            print(f"{name:44s} {dt*1e3:8.1f} ms  "
                  f"{nnz/dt/1e9:6.2f} Gnnz/s")
        except Exception as e:
            print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:150]}")

    def einsum_chunked(idx, vals, table, chunk=4096):
        k = table.shape[1]

        def block(idx_b, vals_b):
            gb = jnp.take(table, idx_b.reshape(-1), axis=0)
            gb = gb.reshape(idx_b.shape[0], L, k)
            return jnp.einsum("gl,glk->gk", vals_b, gb,
                              preferred_element_type=jnp.float32)

        nb = G // chunk
        return jax.lax.map(
            lambda a: block(a[0], a[1]),
            (idx.reshape(nb, chunk, L), vals.reshape(nb, chunk, L)),
        ).reshape(G, k)

    def sum_chunked(idx, vals, table, chunk=4096):
        k = table.shape[1]

        def block(idx_b, vals_b):
            gb = jnp.take(table, idx_b.reshape(-1), axis=0)
            gb = gb.reshape(idx_b.shape[0], L, k).astype(jnp.float32)
            return jnp.sum(vals_b[:, :, None].astype(jnp.float32) * gb,
                           axis=1)

        nb = G // chunk
        return jax.lax.map(
            lambda a: block(a[0], a[1]),
            (idx.reshape(nb, chunk, L), vals.reshape(nb, chunk, L)),
        ).reshape(G, k)

    def sum_nochunk(idx, vals, table):
        k = table.shape[1]
        gb = jnp.take(table, idx.reshape(-1), axis=0)
        gb = gb.reshape(G, L, k).astype(jnp.float32)
        return jnp.sum(vals[:, :, None].astype(jnp.float32) * gb, axis=1)

    def fori_fma(idx, vals, table):
        """L-step fori_loop of (G, k) gather + FMA (acc carried)."""
        k = table.shape[1]

        def body(l, acc):
            ix = jax.lax.dynamic_slice_in_dim(idx, l, 1, axis=1)[:, 0]
            vl = jax.lax.dynamic_slice_in_dim(vals, l, 1, axis=1)
            g = jnp.take(table, ix, axis=0).astype(jnp.float32)
            return acc + vl.astype(jnp.float32) * g

        return jax.lax.fori_loop(
            0, L, body, jnp.zeros((G, k), jnp.float32))

    run_case("einsum chunk4096 (as-is)", einsum_chunked, idx, vals_bf,
             tbl_bf)
    run_case("sum chunk4096", sum_chunked, idx, vals_bf, tbl_bf)
    run_case("sum chunk16384",
             lambda i, v, t: sum_chunked(i, v, t, 16384), idx, vals_bf,
             tbl_bf)
    run_case("sum nochunk", sum_nochunk, idx, vals_bf, tbl_bf)
    run_case("fori L-step FMA", fori_fma, idx, vals_bf, tbl_bf)

    # does the rate scale with row width? (k=256 via a 2x-wide table)
    tbl_wide = jnp.concatenate([tbl_bf, tbl_bf], axis=1)
    run_case("sum chunk4096 k=256 (rate per row?)",
             lambda i, v, t: sum_chunked(i, v, t, 2048), idx, vals_bf,
             tbl_wide)

    # correctness: sum vs einsum on a small slice
    small = 8192
    o1 = jax.jit(lambda i, v, t: jnp.einsum(
        "gl,glk->gk", v,
        jnp.take(t, i.reshape(-1), axis=0).reshape(small, L, 128),
        preferred_element_type=jnp.float32))(
            idx[:small], vals_bf[:small], tbl_bf)
    o2 = jax.jit(lambda i, v, t: jnp.sum(
        v[:, :, None].astype(jnp.float32)
        * jnp.take(t, i.reshape(-1), axis=0)
        .reshape(small, L, 128).astype(jnp.float32), axis=1))(
            idx[:small], vals_bf[:small], tbl_bf)
    print("sum-vs-einsum maxerr:",
          float(jnp.max(jnp.abs(o1 - o2))))


if __name__ == "__main__":
    main()
