"""TPU batch 24 (round 3): multi-split device chain vs speculation.

VERDICT r2 #3: fuse pop+gather+pair-solve for S splits into one device
program; targets 12c <= 0.25 s and 100-leaf <= 2.0 s warm,
bit-identical assignments.  Baselines from batch22 (d3+prefetch):
12c 0.407 s, 20news 15c 1.252-1.562 s, 100 leaves 1.889 s.
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
    from smallk_tpu.common.options import ClustOptions, ClustStats, \
        NmfAlgorithm, NmfOptions, NmfProgressAlgorithm
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hier_chain, hierclust
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

    def opts_for(k):
        return ClustOptions(
            nmf_opts=NmfOptions(
                tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
                min_iter=1, max_iter=5000, verbose=False,
                dtype="float32"),
            num_clusters=k, verbose=False)

    def run(A, k, chain, seed=7):
        hier_chain.CHAIN = chain
        stats = ClustStats()
        t1 = time.perf_counter()
        tree, stats = hierclust.clust_hier(A, opts_for(k), Random(seed),
                                           stats)
        dt = time.perf_counter() - t1
        return tree, stats, dt

    cases = [
        ("12c reuters-shape", 12411, 7984, 12),
        ("15c 20news-shape", 39727, 11237, 15),
        ("100 leaves", 12411, 15968, 100),
    ]
    for name, m, n, k in cases:
        A, _ = synthetic_term_doc_corpus(m, n, max(k, 16), seed=11)
        A = np.asarray(A.todense()).astype(np.float32)
        # warm both paths (compiles), then best-of-2 timed runs
        t_ref, _, _ = run(A, k, False)
        t_ch, _, _ = run(A, k, True)
        times = {"seq(d3+pf)": [], "chain": []}
        trees = {}
        for mode, chain in (("seq(d3+pf)", False), ("chain", True)):
            for _ in range(2):
                tree, stats, dt = run(A, k, chain)
                times[mode].append(dt)
            trees[mode] = tree
            extra = ""
            if chain:
                extra = f"  {hier_chain.LAST_STATS}"
            print(f"  {name} [{mode}]: {min(times[mode]):.3f}s "
                  f"(solves {stats.nmf_count}){extra}", flush=True)
        same = np.array_equal(trees["seq(d3+pf)"].assignments,
                              trees["chain"].assignments)
        pri_same = all(
            a.priority == b.priority for a, b in
            zip(trees["seq(d3+pf)"].nodes, trees["chain"].nodes)
        )
        print(f"  {name}: assignments identical: {same}, "
              f"priorities identical: {pri_same}", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
