"""TPU batch 22: speculation pipeline ablation (depth x prefetch).

batch19 measured depth-1 speculation; this adds the depth-2 stack and
the background fetch thread (hierclust.SPEC_DEPTH/SPEC_PREFETCH).  If
the tunnel releases the GIL during transfers, depth-2 + prefetch should
approach the exec-bound floor (~12-15 ms/split instead of ~29).
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
    modes = [
        ("off", False, 1, False),
        ("d1", True, 1, False),
        ("d1+pf", True, 1, True),
        ("d2+pf", True, 2, True),
        ("d3+pf", True, 3, True),
    ]

    for tag, (m, n, kc, leaves, seed) in {
        "12c reuters-shape": (12411, 7984, 16, 12, 11),
        "15c 20news-shape": (39727, 11237, 24, 15, 7),
        "100 leaves": (12411, 7984 * 2, 128, 100, 21),
    }.items():
        A, _ = synthetic_term_doc_corpus(m, n, kc, seed=seed)
        copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=leaves,
                             verbose=False)
        hc.clust_hier(A, copts, Random(1))  # compile
        base = None
        out = []
        saved = (hc.SPECULATE, hc.SPEC_DEPTH, hc.SPEC_PREFETCH,
                 hc.SPEC_ADAPTIVE)
        hc.SPEC_ADAPTIVE = False  # forced modes must not be size-capped
        for name, spec, depth, pf in modes:
            hc.SPECULATE, hc.SPEC_DEPTH, hc.SPEC_PREFETCH = spec, depth, pf
            best = np.inf
            for _ in range(2):
                t1 = time.perf_counter()
                tree, st = hc.clust_hier(A, copts, Random(2))
                best = min(best, time.perf_counter() - t1)
            a = np.asarray(tree.assignments)
            if base is None:
                base = a
                same = True
            else:
                same = np.array_equal(base, a)
            out.append(f"{name} {best:.3f}s{'' if same else ' DIFF!'}")
        (hc.SPECULATE, hc.SPEC_DEPTH, hc.SPEC_PREFETCH,
         hc.SPEC_ADAPTIVE) = saved
        print(f"{tag} ({st.nmf_count} solves): " + "  ".join(out),
              flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
