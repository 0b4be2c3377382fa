"""TPU batch 4: hierclust breakdown with jitted spectral, check_interval
variants, full bench."""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def guard(name, fn):
    print(f"== {name} ==", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print("[section failed; continuing]", flush=True)


def hier_variants():
    import smallk_tpu.engines.hierclust as hc
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)

    def run(method, interval, label):
        copts = ClustOptions(
            nmf_opts=NmfOptions(
                tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
                min_iter=1, max_iter=5000, verbose=False, dtype="float32",
                a_dtype="bfloat16", stall_patience=100,
                check_interval=interval,
            ),
            num_clusters=12, verbose=False, init_method=method,
        )
        hc.clust_hier(A, copts, Random(1))  # compile
        best = float("inf")
        for seed in (2, 3):
            t1 = time.perf_counter()
            _, stats = hc.clust_hier(A, copts, Random(seed))
            best = min(best, time.perf_counter() - t1)
        print(f"hierclust {label}: {best:.2f}s best-of-2", flush=True)

    run("random", 1, "random ci=1")
    run("random", 4, "random ci=4")
    run("spectral", 1, "spectral ci=1")
    run("spectral", 4, "spectral ci=4")

    # fine breakdown of one mid-tree solve: host init vs device solve
    from smallk_tpu.common.options import ClustStats
    from smallk_tpu.common.rng import Random as R
    from smallk_tpu.solvers.solve import nmf_solve

    copts = ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4, algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
            min_iter=1, max_iter=5000, verbose=False, dtype="float32",
            a_dtype="bfloat16", stall_patience=100,
        ),
        num_clusters=12, verbose=False,
    )
    from smallk_tpu.ops.aop import as_aop

    a_op = as_aop(A, dtype=jnp.bfloat16)
    inits = hc._InitializerSource(12411, 7984, R(5), None)
    runner = hc._Rank2Runner(a_op, copts, inits, ClustStats(), jnp.float32)
    subset = np.sort(np.random.RandomState(0).choice(7984, 3900, False))
    runner.solve(subset)  # compile
    t1 = time.perf_counter(); W0, H0 = inits.next(); t_init = time.perf_counter() - t1
    t1 = time.perf_counter()
    op = runner._gathered_op(subset, 4096)
    jax.block_until_ready(op.A)
    t_gather = time.perf_counter() - t1
    H0b = np.zeros((2, 4096)); H0b[:, :3900] = H0[:, subset]
    W0j = jnp.asarray(W0, jnp.float32); H0j = jnp.asarray(H0b, jnp.float32)
    W0j.block_until_ready()
    t1 = time.perf_counter()
    res = nmf_solve(op, W0j, H0j, copts.nmf_opts)
    res.W.block_until_ready()
    t_solve = time.perf_counter() - t1
    t1 = time.perf_counter()
    _ = np.asarray(res.W); _ = np.asarray(res.H)
    t_d2h = time.perf_counter() - t1
    print(f"  node phases: init {t_init*1000:.0f}ms gather "
          f"{t_gather*1000:.0f}ms solve {t_solve*1000:.0f}ms "
          f"({int(res.iterations)} iters) d2h {t_d2h*1000:.0f}ms",
          flush=True)


def full_bench():
    import bench

    bench.main()


guard("hierclust variants", hier_variants)
guard("bench.py", full_bench)
print("[done]", flush=True)
