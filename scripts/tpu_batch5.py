"""TPU batch 5: hierclust operand strategies (dense buckets vs masked ELL
vs masked dense), pair batching on/off."""
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


def hier_operands():
    import smallk_tpu.engines.hierclust as hc
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.ops.aop import as_aop
    from smallk_tpu.ops.ell import EllAOp

    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)

    def copts(method="random"):
        return ClustOptions(
            nmf_opts=NmfOptions(
                tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
                min_iter=1, max_iter=5000, verbose=False, dtype="float32",
                a_dtype="bfloat16", stall_patience=100,
            ),
            num_clusters=12, verbose=False, init_method=method,
        )

    def run(label, operand, method="random", pair=True):
        hc.PAIR_BATCHING = pair
        o = copts(method)
        hc.clust_hier(operand, o, Random(1))  # compile
        best = float("inf")
        for seed in (2, 3):
            t1 = time.perf_counter()
            hc.clust_hier(operand, o, Random(seed))
            best = min(best, time.perf_counter() - t1)
        print(f"hierclust {label}: {best:.2f}s best-of-2", flush=True)
        hc.PAIR_BATCHING = True

    dense = as_aop(A, dtype=jnp.bfloat16)
    ell = EllAOp.from_scipy(A, dtype=jnp.bfloat16)
    run("dense-buckets pair=on ", dense)
    run("dense-buckets pair=off", dense, pair=False)
    run("masked-ELL             ", ell)
    run("masked-ELL spectral    ", ell, method="spectral")
    run("dense spectral         ", dense, method="spectral")


guard("hierclust operands", hier_operands)
print("[done]", flush=True)
