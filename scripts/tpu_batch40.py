"""Probe: end-to-end A/B on 20news-shape hierclust (trusted wall-clock
only): fp8 A-storage, cheap spectral (2 power iters), and both.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_batch40.py
"""

import dataclasses
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
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering
    from smallk_tpu.solvers import rank2

    base = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )
    A, labels = synthetic_term_doc_corpus(39727, 11237, 20, seed=13)

    cases = [
        ("bf16 random (baseline)", "bfloat16", "random", 6),
        ("fp8 random", "float8_e4m3fn", "random", 6),
        ("bf16 spectral p2", "bfloat16", "spectral", 2),
        ("fp8 spectral p2", "float8_e4m3fn", "spectral", 2),
    ]
    for name, a_dtype, init, piters in cases:
        rank2.SPECTRAL_POWER_ITERS = piters
        try:
            copts = ClustOptions(
                nmf_opts=dataclasses.replace(base, a_dtype=a_dtype),
                num_clusters=15, verbose=False, init_method=init,
            )
            clust_hier(A, copts, Random(1))  # compile
            dt = float("inf")
            for _rep in range(2):
                t0 = time.perf_counter()
                tree, stats = clust_hier(A, copts, Random(2))
                dt = min(dt, time.perf_counter() - t0)
            nmi = score_clustering(tree.assignments, labels)["nmi"]
            print(f"{name:26s} wall={dt:.3f}s iters={stats.iter_count} "
                  f"nmi={nmi:.3f}", flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            rank2.SPECTRAL_POWER_ITERS = 6


if __name__ == "__main__":
    main()
