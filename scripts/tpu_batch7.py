"""TPU batch 7: node phase breakdown + ELL f32 hierclust."""
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


def phases():
    import smallk_tpu.engines.hierclust as hc
    from smallk_tpu.common.options import (
        ClustOptions, ClustStats, NmfAlgorithm, NmfOptions,
        NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.solvers.solve import nmf_solve

    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)
    copts = ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4, algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
            min_iter=1, max_iter=5000, verbose=False, dtype="float32",
            a_dtype="bfloat16", stall_patience=100,
        ),
        num_clusters=12, verbose=False,
    )
    a_op = as_aop(A, dtype=jnp.bfloat16)
    inits = hc._InitializerSource(12411, 7984, Random(5), None)
    runner = hc._Rank2Runner(a_op, copts, inits, ClustStats(), jnp.float32)
    for width, nb in ((3900, 4096), (950, 1024)):
        subset = np.sort(
            np.random.RandomState(0).choice(7984, width, False)
        )
        runner.solve(subset)  # compile
        t1 = time.perf_counter(); W0, H0 = inits.next()
        t_init = time.perf_counter() - t1
        t1 = time.perf_counter()
        op = runner._gathered_op(subset, nb)
        jax.block_until_ready(op.A)
        t_gather = time.perf_counter() - t1
        H0b = np.zeros((2, nb)); H0b[:, :width] = H0[:, subset]
        t1 = time.perf_counter()
        W0j = jnp.asarray(W0, jnp.float32)
        H0j = jnp.asarray(H0b, jnp.float32)
        jax.block_until_ready((W0j, H0j))
        t_h2d = time.perf_counter() - t1
        t1 = time.perf_counter()
        res = nmf_solve(op, W0j, H0j, copts.nmf_opts)
        res.W.block_until_ready()
        t_solve = time.perf_counter() - t1
        t1 = time.perf_counter()
        _ = np.asarray(res.W); _ = np.asarray(res.H)
        t_d2h = time.perf_counter() - t1
        print(f"  width {width}: host-init {t_init*1000:.0f}ms "
              f"gather {t_gather*1000:.0f}ms h2d {t_h2d*1000:.0f}ms "
              f"solve {t_solve*1000:.0f}ms ({int(res.iterations)} iters, "
              f"{t_solve/max(1,int(res.iterations))*1000:.2f} ms/it) "
              f"d2h {t_d2h*1000:.0f}ms", flush=True)


def ell_f32():
    import smallk_tpu.engines.hierclust as hc
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.ops.ell import EllAOp

    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)
    ell = EllAOp.from_scipy(A, dtype=jnp.float32)
    copts = ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4, algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
            min_iter=1, max_iter=5000, verbose=False, dtype="float32",
            stall_patience=100,
        ),
        num_clusters=12, verbose=False,
    )
    hc.clust_hier(ell, copts, Random(1))
    t1 = time.perf_counter()
    _, stats = hc.clust_hier(ell, copts, Random(2))
    print(f"hierclust masked-ELL f32: {time.perf_counter()-t1:.2f}s "
          f"({stats.nmf_count} solves)", flush=True)


guard("node phases", phases)
guard("ell f32 hierclust", ell_f32)
print("[done]", flush=True)
