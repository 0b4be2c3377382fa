"""Probe: phase decomposition of the 100-leaf graph north-star workload
(bench config: fp8, restarts=1, stall 25 / tol 3e-4, prebuilt operand).

Reports per-segment walls, finalization, glue, and the iteration count,
to locate the 6.5 s: solve iterations vs per-split fixed device work vs
host orchestration.

Run:  python scripts/tpu_batch57.py
"""

import dataclasses as dc
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.device_get(jnp.zeros((1,)))

    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hier_chain
    from smallk_tpu.engines.corpus import planted_partition_graph
    from smallk_tpu.engines.graph import (
        graph_clust_options, normalized_adjacency,
    )
    from smallk_tpu.engines.hierclust import clust_hier
    from smallk_tpu.engines.scoring import score_clustering
    from smallk_tpu.engines.tree import Tree
    from smallk_tpu.ops.aop import as_aop

    G100, labels100 = planted_partition_graph(20000, 100, seed=17)
    Gn100 = normalized_adjacency(G100)
    import sys

    init = sys.argv[1] if len(sys.argv) > 1 else "random"
    gopts = graph_clust_options(100, restarts=1, init_method=init)
    gopts = dc.replace(
        gopts,
        nmf_opts=dc.replace(gopts.nmf_opts, stall_patience=25, tol=3e-4,
                            a_dtype="float8_e4m3fn"),
    )
    op = as_aop(Gn100, dtype=jnp.float8_e4m3fn)

    seg_walls = []
    orig_seg = hier_chain.ChainDriver.run_segment

    def timed_seg(self, i, *a, **kw):
        t0 = time.perf_counter()
        out = orig_seg(self, i, *a, **kw)
        seg_walls.append((i, out[0], time.perf_counter() - t0))
        return out

    hier_chain.ChainDriver.run_segment = timed_seg

    final_walls = []
    for name in ("compute_top_terms", "compute_assignments"):
        orig = getattr(Tree, name)

        def timed(self, *a, _orig=orig, **kw):
            t0 = time.perf_counter()
            out = _orig(self, *a, **kw)
            final_walls.append(time.perf_counter() - t0)
            return out

        setattr(Tree, name, timed)

    clust_hier(op, gopts, Random(1))  # compile
    best = None
    for _ in range(2):
        seg_walls.clear()
        final_walls.clear()
        t0 = time.perf_counter()
        tree, stats = clust_hier(op, gopts, Random(2))
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, list(seg_walls), list(final_walls),
                    stats.iter_count, stats.nmf_count)
    dt, segs, fins, iters, solves = best
    nmi = score_clustering(tree.assignments, labels100)["nmi"]
    seg_time = sum(s[2] for s in segs)
    print(f"total={dt:.3f}s iters={iters} solves={solves} nmi={nmi:.3f}")
    print(f"segments ({len(segs)}): sum={seg_time:.3f}s "
          f"final={sum(fins):.3f}s glue={dt - seg_time - sum(fins):.3f}s")
    for i0, i1, w in segs:
        print(f"  seg [{i0:3d}->{i1:3d}]  {w:.3f}s  "
              f"({(w / max(i1 - i0, 1)) * 1e3:.1f} ms/split)")


if __name__ == "__main__":
    main()
