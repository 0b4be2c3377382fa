"""Probe: phase decomposition of the timed clust_hier call on the text
bench workloads (12c reuters-shape, 15c 20news-shape).

Phases per timed call:
  op      as_aop dense build, consumed (device_get of a checksum)
  runner  _Rank2Runner construction (host)
  seg[i]  each ChainDriver.run_segment wall
  final   compute_top_terms + compute_assignments
  glue    total - the above (host loop, tree ops, fetches)

Also measures the same call with a PREBUILT operand passed in (as_aop
pass-through) — the reference's timed region starts from its in-memory
SparseMatrix, so a prebuilt device operand is the parity-fair start.

Run:  python scripts/tpu_batch52.py
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
    from smallk_tpu.engines import hier_chain
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.tree import Tree
    from smallk_tpu.ops.aop import as_aop

    base = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    seg_walls = []
    orig_seg = hier_chain.ChainDriver.run_segment

    def timed_seg(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_seg(self, *a, **kw)
        seg_walls.append(time.perf_counter() - t0)
        return out

    hier_chain.ChainDriver.run_segment = timed_seg

    final_walls = []
    orig_tt = Tree.compute_top_terms
    orig_as = Tree.compute_assignments

    def timed_tt(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_tt(self, *a, **kw)
        final_walls.append(time.perf_counter() - t0)
        return out

    def timed_as(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_as(self, *a, **kw)
        final_walls.append(time.perf_counter() - t0)
        return out

    Tree.compute_top_terms = timed_tt
    Tree.compute_assignments = timed_as

    for name, m, n, kc, cs, k in (
        ("12c reuters-shape", 12411, 7984, 16, 11, 12),
        ("15c 20news-shape", 39727, 11237, 20, 13, 15),
    ):
        A, _ = synthetic_term_doc_corpus(m, n, kc, seed=cs)
        copts = ClustOptions(nmf_opts=base, num_clusters=k, verbose=False)
        clust_hier(A, copts, Random(1))  # compile

        # operand build cost, consumed
        t0 = time.perf_counter()
        op = as_aop(A, dtype=jnp.bfloat16)
        float(jax.device_get(op.A[0, 0]))
        t_op_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        op = as_aop(A, dtype=jnp.bfloat16)
        float(jax.device_get(op.A[0, 0]))
        t_op = time.perf_counter() - t0

        for label, arg in (("scipy", A), ("prebuilt", op)):
            best = None
            for _ in range(3):
                seg_walls.clear()
                final_walls.clear()
                t0 = time.perf_counter()
                clust_hier(arg, copts, Random(2))
                dt = time.perf_counter() - t0
                if best is None or dt < best[0]:
                    best = (dt, list(seg_walls), list(final_walls))
            dt, segs, fins = best
            glue = dt - sum(segs) - sum(fins)
            print(
                f"{name:18s} {label:9s} total={dt:.3f}s "
                f"segs={[round(s, 3) for s in segs]} "
                f"final={sum(fins) * 1e3:.0f}ms glue={glue * 1e3:.0f}ms",
                flush=True,
            )
        print(f"{name:18s} op build cold={t_op_cold:.3f}s warm={t_op:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
