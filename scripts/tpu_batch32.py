"""Probe (v2, in-loop timing): the real ELL bucket product rate.

tpu_batch31's standalone timings were bogus (0.1 ms for a >=0.77 GB
traffic op — block_until_ready through the tunnel did not serialize).
This version chains REPS products inside one jitted fori_loop with a
data dependency and fetches one scalar, the only trustworthy timing
through the tunnel (ROUND_NOTES).

Run:  python scripts/tpu_batch32.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

REPS = 8


def main():
    print("devices:", jax.devices())
    k = 128
    B = 65536 + 1
    G, L = 524288, 128   # 67M nnz — the dominant bucket at 1M docs
    nnz = G * L

    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, B - 1, (G, L)).astype(np.int32))
    vals_bf = jnp.asarray(rs.rand(G, L), dtype=jnp.bfloat16)
    vals_f32 = vals_bf.astype(jnp.float32)
    tbl_bf = jnp.asarray(rs.rand(B, k), dtype=jnp.bfloat16)
    tbl_f32 = tbl_bf.astype(jnp.float32)

    HI = jax.lax.Precision.HIGHEST

    def product(idx, vals, table, prec, chunk):
        def block(idx_b, vals_b):
            gb = jnp.take(table, idx_b.reshape(-1), axis=0)
            gb = gb.reshape(idx_b.shape[0], L, k)
            return jnp.einsum("gl,glk->gk", vals_b, gb,
                              precision=prec,
                              preferred_element_type=jnp.float32)

        if chunk is None:
            return block(idx, vals)
        nb = G // chunk
        return jax.lax.map(
            lambda a: block(a[0], a[1]),
            (idx.reshape(nb, chunk, L), vals.reshape(nb, chunk, L)),
        ).reshape(G, k)

    def run_case(name, vals, table, prec, chunk):
        @jax.jit
        def bench(idx, vals, table):
            def body(i, acc):
                # acc-dependent perturbation forces serial execution and
                # defeats CSE; the perturbation is 0 in exact arithmetic
                t2 = table + jnp.asarray(acc * 0.0, table.dtype)
                out = product(idx, vals, t2, prec, chunk)
                return acc + out[0, 0]

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        try:
            s = float(bench(idx, vals, table))  # compile+warm
            t0 = time.perf_counter()
            s = float(bench(idx, vals, table))
            dt = (time.perf_counter() - t0) / REPS
            print(f"{name:40s} {dt*1e3:8.1f} ms  "
                  f"{nnz/dt/1e9:6.2f} Gnnz/s")
        except Exception as e:
            print(f"{name:40s} FAILED {type(e).__name__}: {str(e)[:150]}")

    run_case("bf16 HIGHEST chunk4096 (as-is)", vals_bf, tbl_bf, HI, 4096)
    run_case("bf16 default chunk4096", vals_bf, tbl_bf, None, 4096)
    run_case("f32 HIGHEST chunk4096", vals_f32, tbl_f32, HI, 4096)
    run_case("bf16 default chunk32768", vals_bf, tbl_bf, None, 32768)
    run_case("bf16 default chunk65536", vals_bf, tbl_bf, None, 65536)
    run_case("bf16 HIGHEST chunk65536", vals_bf, tbl_bf, HI, 65536)

    # small-table variant (doc_block 8192): locality
    B2 = 8192 + 1
    idx2 = jnp.asarray(rs.randint(0, B2 - 1, (G, L)).astype(np.int32))
    tbl2 = jnp.asarray(rs.rand(B2, k), dtype=jnp.bfloat16)

    def run_case2(name, chunk):
        @jax.jit
        def bench(idx, vals, table):
            def body(i, acc):
                t2 = table + jnp.asarray(acc * 0.0, table.dtype)
                out = product(idx, vals, t2, HI, chunk)
                return acc + out[0, 0]

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        s = float(bench(idx2, vals_bf, tbl2))
        t0 = time.perf_counter()
        s = float(bench(idx2, vals_bf, tbl2))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:40s} {dt*1e3:8.1f} ms  {nnz/dt/1e9:6.2f} Gnnz/s")

    run_case2("bf16 HIGHEST chunk4096 table-2MB", 4096)
    run_case2("bf16 HIGHEST chunk65536 table-2MB", 65536)


if __name__ == "__main__":
    main()
