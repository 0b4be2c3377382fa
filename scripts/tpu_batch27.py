"""TPU batch 27 (round 3): 12-cluster chain-run decomposition.

Where do the 0.366 s go?  Spans: root solve, chain dispatch (host time
in _chain_program call), ys fetch, host replay, finalize (top terms +
assignments).  Everything else = python/tree bookkeeping.
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)

SPANS = {}


def span(name, t1):
    SPANS[name] = SPANS.get(name, 0.0) + (time.perf_counter() - t1)


def main():
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hier_chain, hierclust as hc
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

    # --- instrument ----------------------------------------------------
    orig_solve = hc._Rank2Runner.solve

    def solve_timed(self, subset, w_parent=None):
        t1 = time.perf_counter()
        out = orig_solve(self, subset, w_parent)
        span("root/serial solve", t1)
        return out

    hc._Rank2Runner.solve = solve_timed

    orig_prog = hier_chain._chain_program

    def prog_timed(*a, **kw):
        t1 = time.perf_counter()
        out = orig_prog(*a, **kw)
        span("chain dispatch", t1)
        return out

    hier_chain._chain_program = prog_timed

    orig_seg = hier_chain.ChainDriver.run_segment

    def seg_timed(self, *a, **kw):
        t1 = time.perf_counter()
        out = orig_seg(self, *a, **kw)
        span("run_segment total", t1)
        return out

    hier_chain.ChainDriver.run_segment = seg_timed

    orig_np = np.asarray

    # ys fetch happens inside run_segment via np.asarray(ys) — patch the
    # single call site instead: time the d2h by wrapping jax.device_get?
    # simpler: wrap _sync_from_host too
    orig_sync = hier_chain.ChainDriver._sync_from_host

    def sync_timed(self, *a, **kw):
        t1 = time.perf_counter()
        out = orig_sync(self, *a, **kw)
        span("sync_from_host", t1)
        return out

    hier_chain.ChainDriver._sync_from_host = sync_timed

    from smallk_tpu.engines import tree as tree_mod

    orig_terms = tree_mod.Tree.compute_top_terms
    orig_assign = tree_mod.Tree.compute_assignments

    def terms_timed(self, *a, **kw):
        t1 = time.perf_counter()
        out = orig_terms(self, *a, **kw)
        span("top_terms", t1)
        return out

    def assign_timed(self, *a, **kw):
        t1 = time.perf_counter()
        out = orig_assign(self, *a, **kw)
        span("assignments", t1)
        return out

    tree_mod.Tree.compute_top_terms = terms_timed
    tree_mod.Tree.compute_assignments = assign_timed

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )
    m, n = 12411, 7984
    A, _ = synthetic_term_doc_corpus(m, n, 16, seed=11)
    copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=12,
                         verbose=False)
    hc.clust_hier(A, copts, Random(2))  # compile
    for rep in range(2):
        SPANS.clear()
        t1 = time.perf_counter()
        tree, st = hc.clust_hier(A, copts, Random(2))
        total = time.perf_counter() - t1
        other = total - sum(
            v for k2, v in SPANS.items()
            if k2 not in ("chain dispatch", "sync_from_host")
        )
        print(f"  rep{rep}: total {total*1e3:.0f} ms  " + "  ".join(
            f"{k2}={v*1e3:.0f}ms" for k2, v in sorted(SPANS.items()))
            + f"  other={other*1e3:.0f}ms", flush=True)
        print(f"    stats: {hier_chain.LAST_STATS} solves {st.nmf_count}",
              flush=True)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
