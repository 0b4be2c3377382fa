"""TPU batch 15: hierclust scale — 100 leaves (the north-star "rank-2
hierclust to 100 leaves" regime) + aggregate rank-2 iterations/sec."""
import time
import traceback

import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


def main():
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_hier

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    # 12-cluster reuters-shape with iteration accounting
    A, _ = synthetic_term_doc_corpus(12411, 7984, 16, seed=11)
    copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=12, verbose=False)
    clust_hier(A, copts, Random(1))
    t1 = time.perf_counter()
    _, st = clust_hier(A, copts, Random(2))
    dt = time.perf_counter() - t1
    print(f"  12 leaves reuters-shape: {dt:.2f}s, {st.nmf_count} solves, "
          f"{st.iter_count} rank-2 iterations -> "
          f"{st.iter_count/dt:.0f} it/s aggregate", flush=True)

    # 100 leaves on a 128-cluster corpus (north-star scale)
    A3, _ = synthetic_term_doc_corpus(12411, 7984 * 2, 128, seed=21)
    copts3 = ClustOptions(nmf_opts=nmf_opts, num_clusters=100,
                          verbose=False)
    t1 = time.perf_counter()
    _, st3 = clust_hier(A3, copts3, Random(3))
    wall_cold = time.perf_counter() - t1
    t1 = time.perf_counter()
    _, st3 = clust_hier(A3, copts3, Random(4))
    dt3 = time.perf_counter() - t1
    print(f"  100 leaves (12411x15968, 128 planted topics): "
          f"{dt3:.2f}s warm ({wall_cold:.0f}s incl compile), "
          f"{st3.nmf_count} solves, {st3.iter_count} rank-2 iterations "
          f"-> {st3.iter_count/dt3:.0f} it/s aggregate", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
