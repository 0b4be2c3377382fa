"""TPU batch 25 (round 3): multi-split device chain — perf + parity.

VERDICT r2 #3: one dispatch + one fetch per CHAIN_SEG splits; targets
12c <= 0.25 s and 100-leaf <= 2.0 s warm.  Baselines from batch22
(seq d3+prefetch, same sparse/bf16 harness): 12c 0.407 s, 20news 15c
1.252 s, 100 leaves 1.889 s.

Parity isolation (the batch24 attempt saw chain != seq on TPU):
run chain(seg=1), chain(seg=32) and sequential on the same seed.
  - chain(1) == chain(32) != seq  -> XLA compilation-context rounding
    (same math, different fusion context); logic parity is pinned by
    the CPU bit-identical tests.
  - chain(1) != chain(32)        -> real state-carry bug in the chain.
Matrix ships as COO triplets (as_aop densifies on device) — the tunnel
is ~12 MB/s, never ship a dense host matrix.
"""
import time
import traceback

import numpy as np
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
    from smallk_tpu.engines import hier_chain, hierclust as hc
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.scoring import score_clustering

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    def run(A, leaves, chain, seg, seed=2):
        hier_chain.CHAIN = chain
        hier_chain.CHAIN_SEG = seg
        t1 = time.perf_counter()
        tree, st = hc.clust_hier(
            A, ClustOptions(nmf_opts=nmf_opts, num_clusters=leaves,
                            verbose=False), Random(seed))
        return tree, st, time.perf_counter() - t1

    for tag, (m, n, kc, leaves, seed) in {
        "12c reuters-shape": (12411, 7984, 16, 12, 11),
        "15c 20news-shape": (39727, 11237, 24, 15, 7),
        "100 leaves": (12411, 7984 * 2, 128, 100, 21),
    }.items():
        A, _ = synthetic_term_doc_corpus(m, n, kc, seed=seed)  # scipy CSC
        run(A, leaves, False, 32)  # compile seq
        run(A, leaves, True, 32)   # compile chain
        results = {}
        for name, chain, seg in (("seq", False, 32),
                                 ("chain32", True, 32),
                                 ("chain1", True, 1)):
            best, tree, st = np.inf, None, None
            for _ in range(2):
                tree, st, dt = run(A, leaves, chain, seg)
                best = min(best, dt)
            extra = f" {hier_chain.LAST_STATS}" if chain else ""
            print(f"  {tag} [{name}]: {best:.3f}s "
                  f"(solves {st.nmf_count}, iters {st.iter_count})"
                  f"{extra}", flush=True)
            results[name] = tree
        a_seq = np.asarray(results["seq"].assignments)
        a_c32 = np.asarray(results["chain32"].assignments)
        a_c1 = np.asarray(results["chain1"].assignments)
        print(f"  {tag}: c32==c1: {np.array_equal(a_c32, a_c1)}, "
              f"c32==seq: {np.array_equal(a_c32, a_seq)}, "
              f"agree(c32,seq): "
              f"{score_clustering(a_c32, a_seq)['nmi']:.4f} nmi",
              flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
