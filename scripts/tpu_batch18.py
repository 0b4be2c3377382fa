"""TPU batch 18: does the bucketed-ELL gather-product rate depend on the
TABLE size (locality), and does doc-blocking the row buckets recover it?

batch16 measured AH' (gather from the 512 MB H-transpose table) at
15-16 GB/s vs W'A (25 MB table) at ~70 GB/s for the same nnz count.  If
the rate collapse is a table-locality effect, partitioning docs into
blocks so each sub-product gathers from a <=32 MB table slice should run
~3-4x faster at the cost of one extra pass over the output.  This script
measures (a) the same segmented gather-einsum at several table sizes with
identical nnz, (b) a doc-blocked AH' prototype vs the monolithic one.
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)

K = 128
L = 64           # pad width per bucket row
G = 1_250_000    # bucket rows: G*L = 80M gathered rows, like the 1M corpus


def bench(fn, *args, reps=3):
    r = fn(*args)
    (r[0] if isinstance(r, tuple) else r).block_until_ready()
    best = np.inf
    for _ in range(reps):
        t = time.perf_counter()
        r = fn(*args)
        (r[0] if isinstance(r, tuple) else r).block_until_ready()
        best = min(best, time.perf_counter() - t)
    return best


@jax.jit
def seg_product(idx, vals, table):
    g, l = idx.shape
    gb = jnp.take(table, idx.reshape(-1), axis=0).reshape(g, l, K)
    return jnp.einsum("gl,glk->gk", vals, gb,
                      preferred_element_type=jnp.float32)


def main():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((G, L)), jnp.float32)

    # (a) identical nnz, growing table
    for n_tab in (65_536, 262_144, 1_048_576):
        mb = n_tab * K * 4 / 1e6
        idx = jnp.asarray(
            rng.integers(0, n_tab, (G, L), dtype=np.int32))
        table = jnp.asarray(rng.random((n_tab, K)), jnp.float32)
        # chunk the gather like EllAOp._bucket_product (256 MB budget)
        budget = 256 * 1024 * 1024
        chunk = max(256, budget // (L * K * 4))
        nb = -(-G // chunk)
        pad = nb * chunk - G
        idx_p = jnp.pad(idx, ((0, pad), (0, 0)))
        vals_p = jnp.pad(vals, ((0, pad), (0, 0)))

        @jax.jit
        def chunked(idx_p, vals_p, table):
            return jax.lax.map(
                lambda a: seg_product(a[0], a[1], table),
                (idx_p.reshape(nb, chunk, L), vals_p.reshape(nb, chunk, L)),
            )

        dt = bench(chunked, idx_p, vals_p, table)
        gbs = G * L * K * 4 / dt / 1e9
        print(f"table {mb:7.0f} MB: {dt*1e3:8.1f} ms  "
              f"gather-product {gbs:6.1f} GB/s", flush=True)

    # (b) doc-blocked: same 80M gathers but idx confined to 32 MB slices
    n_tab = 1_048_576
    n_blocks = 16
    blk = n_tab // n_blocks
    table = jnp.asarray(rng.random((n_tab, K)), jnp.float32)
    # block b gathers only within [b*blk, (b+1)*blk)
    idx_local = rng.integers(0, blk, (G, L), dtype=np.int32)
    gpb = G // n_blocks

    @jax.jit
    def blocked(idx_local, vals, table):
        out = []
        for b in range(n_blocks):
            sl_idx = jax.lax.dynamic_slice_in_dim(idx_local, b * gpb, gpb)
            sl_val = jax.lax.dynamic_slice_in_dim(vals, b * gpb, gpb)
            tab_b = jax.lax.dynamic_slice_in_dim(table, b * blk, blk)
            out.append(seg_product(sl_idx, sl_val, tab_b))
        return jnp.concatenate(out, axis=0)

    dt = bench(blocked, jnp.asarray(idx_local), vals, table)
    gbs = G * L * K * 4 / dt / 1e9
    print(f"doc-blocked ({n_blocks} x {blk*K*4/1e6:.0f} MB slices): "
          f"{dt*1e3:8.1f} ms  {gbs:6.1f} GB/s", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
