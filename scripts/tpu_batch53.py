"""Probe: finer bucket ladder above 4096 (step 1024 vs shipped 2048) on
the text bench workloads.

Rationale: per-iteration cost is stream-proportional; the 20news root
(n=11237) pads to 12288 under the 2048-step ladder but 11264 under a
1024 step (-8.3% root bytes), and mid-widths save ~6% on average.  Cost
is a bigger chain switch (more width branches -> longer compile), which
the bench excludes.

Run:  python scripts/tpu_batch53.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hierclust as hc
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.scoring import score_clustering

    base = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    from smallk_tpu.ops.aop import as_aop

    workloads = []
    for name, m, n, kc, cs, k in (
        ("12c reuters-shape", 12411, 7984, 16, 11, 12),
        ("15c 20news-shape", 39727, 11237, 20, 13, 15),
    ):
        A, labels = synthetic_term_doc_corpus(m, n, kc, seed=cs)
        A_op = as_aop(A, dtype=jnp.bfloat16)  # prebuilt, like bench.py
        copts = ClustOptions(nmf_opts=base, num_clusters=k, verbose=False)
        workloads.append((name, A_op, labels, copts))

    for step in (2048, 1024):
        hc._BUCKET_STEP = step
        for name, A, labels, copts in workloads:
            t0 = time.perf_counter()
            hc.clust_hier(A, copts, Random(1))  # compile
            t_compile = time.perf_counter() - t0
            dt = float("inf")
            tree = None
            for _ in range(3):
                t0 = time.perf_counter()
                tree, stats = hc.clust_hier(A, copts, Random(2))
                dt = min(dt, time.perf_counter() - t0)
            nmi = score_clustering(tree.assignments, labels)["nmi"]
            print(f"step={step} {name:18s} wall={dt:.3f}s "
                  f"iters={stats.iter_count} nmi={nmi:.3f} "
                  f"(compile {t_compile:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
