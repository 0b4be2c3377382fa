"""TPU batch 28 (round 3): decompose the chain program's device time.

Calls _chain_program directly with n_steps = 0 (root only), then the
full 11-step 12c segment, then intermediate step counts — per-step
device cost = slope.  Also times a standalone vmapped pair solve at
width 512 to separate solve time from chain-step overhead (partition,
nonzero gather, bit packing, switch).
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def timeit(fn, reps=3):
    fn()  # compile
    best = np.inf
    for _ in range(reps):
        t1 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t1)
    return best


def main():
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hier_chain as chn
    from smallk_tpu.engines import hierclust as hc
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )
    m, n = 12411, 7984
    A, _ = synthetic_term_doc_corpus(m, n, 16, seed=11)
    copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=12, verbose=False)

    # run the real engine once to build a runner + warm caches
    tree, st = hc.clust_hier(A, copts, Random(2))
    print(f"engine warm: solves={st.nmf_count} stats={chn.LAST_STATS}",
          flush=True)

    # rebuild the driver state the way clust_hier does
    runner = hc._Rank2Runner(A, copts, Random(2))
    drv = chn.ChainDriver(runner, 2 * (12 - 1))
    widths = drv.widths
    fdtype = drv.fdtype
    nc, nw = drv.nc, drv.nw

    assign0 = jnp.full((n,), nc, jnp.int32)
    labels0 = jnp.zeros((nc + 1, nw), jnp.uint32)
    pri0 = jnp.zeros((nc + 1,), jnp.float32).at[nc].set(jnp.inf)
    pop0 = pri0
    leaf0 = jnp.zeros((nc + 1,), jnp.bool_).at[nc].set(True)
    Wslab0 = jnp.zeros((nc + 1, m, 2), fdtype)
    seeds = np.arange(64, dtype=np.int32).reshape(32, 2) + 7

    def run(n_steps, seg, do_root=True, max_terms=5):
        def f():
            _, ys = chn._chain_program(
                runner._A_ext, jnp.asarray(seeds[:seg]), np.int32(3),
                jnp.asarray(0, jnp.int32), jnp.asarray(n_steps, jnp.int32),
                jnp.asarray(10, jnp.int32),
                assign0, labels0, Wslab0, pri0, pop0, leaf0,
                opts=nmf_opts, fdtype=fdtype,
                unbalanced=0.1, widths=widths, seg=seg,
                restarts=1, size_pop=False, do_root=do_root,
                max_terms=max_terms,
            )
            return ys
        return f

    for n_steps, seg in ((0, 1), (1, 1), (11, 16)):
        t = timeit(run(n_steps, seg))
        print(f"  chain n_steps={n_steps:2d} seg={seg:2d}: {t*1e3:7.1f} ms",
              flush=True)

    # standalone pair solve at width 512 (the chain's inner op, no
    # partition/commit machinery)
    idx2 = jnp.stack([
        jnp.arange(512, dtype=jnp.int32),
        jnp.arange(512, 1024, dtype=jnp.int32),
    ])
    wp = jnp.ones((2, m, 2), fdtype)
    sd = jnp.asarray([5, 6], jnp.int32)

    @jax.jit
    def pair():
        return jax.vmap(
            lambda i, s, w: chn._child_solve(
                runner._A_ext, i, s, w, n, nmf_opts, fdtype, 1)
        )(idx2, sd, wp)

    t = timeit(pair)
    it0 = int(np.asarray(pair()[2][0]))
    it1 = int(np.asarray(pair()[2][1]))
    print(f"  standalone pair solve w=512: {t*1e3:7.1f} ms "
          f"(iters {it0}/{it1})", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
