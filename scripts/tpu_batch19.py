"""TPU batch 19: end-to-end hierclust with/without speculative dispatch.

batch17 decomposed the per-split cost as exec (~12 ms) + one ~26 ms
result-fetch round trip through the tunnel; speculation (hierclust.py
SPECULATE) dispatches the predicted next pop's pair before paying the
fetch, hiding exec inside the RTT.  Expected ~20-30% on the wall clock.
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
    from smallk_tpu.engines import hierclust as hc
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    for tag, (m, n, kc, leaves, seed) in {
        "12c reuters-shape": (12411, 7984, 16, 12, 11),
        "15c 20news-shape": (39727, 11237, 24, 15, 7),
        "100 leaves": (12411, 7984 * 2, 128, 100, 21),
    }.items():
        A, _ = synthetic_term_doc_corpus(m, n, kc, seed=seed)
        copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=leaves,
                             verbose=False)
        hc.clust_hier(A, copts, Random(1))  # compile
        row = {}
        base_assign = None
        for spec in (False, True):
            hc.SPECULATE = spec
            best = np.inf
            for rep in range(2):
                t1 = time.perf_counter()
                tree, st = hc.clust_hier(A, copts, Random(2))
                best = min(best, time.perf_counter() - t1)
            row[spec] = (best, st.nmf_count, st.iter_count)
            if base_assign is None:
                base_assign = np.asarray(tree.assignments)
            else:
                same = np.array_equal(base_assign,
                                      np.asarray(tree.assignments))
                print(f"  assignments identical: {same}", flush=True)
        hc.SPECULATE = True
        off, on = row[False], row[True]
        print(f"{tag}: off {off[0]:.3f}s  on {on[0]:.3f}s "
              f"({off[0]/on[0]:.2f}x)  solves {off[1]}/{on[1]} "
              f"iters {off[2]}/{on[2]}", flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
