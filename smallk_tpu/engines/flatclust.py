"""Flat clustering by direct NMF.

Reference: flatclust/src/flat_clust.cpp (RunFlatClust :25-124, dispatch over
{dense,sparse} x {HALS, RANK2, BPP} — MU excluded :38-70) reusing the same
NmfSolve loop, then argmax assignments, fuzzy probabilities, top terms and
result files (flatclust/src/main.cpp:268-277, common/src/flat_clust_output.cpp).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..common.options import (
    ClustOptions,
    NmfAlgorithm,
    NmfOptions,
    NmfStats,
    OutputFormat,
)
from ..ops.aop import as_aop
from ..solvers.solve import nmf_solve
from .assignments import (
    compute_assignments,
    compute_fuzzy_assignments,
    top_terms_matrix,
)

_FLATCLUST_ALGORITHMS = (
    NmfAlgorithm.HALS, NmfAlgorithm.RANK2, NmfAlgorithm.BPP
)


def run_flatclust(
    A,
    W0: np.ndarray,
    H0: np.ndarray,
    opts: NmfOptions,
    stats: Optional[NmfStats] = None,
    mesh=None,
):
    """Factor A and derive flat clustering results.

    Returns (W, H, assignments, fuzzy, success); top terms are derived by
    the caller via assignments.top_terms_matrix(W, maxterms).

    With `mesh`, A/W/H are sharded over the (terms, docs) mesh and the
    solve runs under GSPMD (parallel/mesh.sharded_nmf_solve).
    """
    if opts.algorithm not in _FLATCLUST_ALGORITHMS:
        raise ValueError(
            "flatclust: algorithm must be HALS, RANK2, or BPP "
            "(reference flat_clust.cpp:38-70 excludes MU)"
        )
    opts.validate()
    dtype = jnp.dtype(opts.dtype)
    a_op = as_aop(A, dtype=jnp.dtype(opts.a_dtype or opts.dtype))

    import time

    t0 = time.perf_counter()
    if mesh is not None:
        from ..parallel.mesh import sharded_nmf_solve

        res = sharded_nmf_solve(
            a_op, jnp.asarray(W0, dtype), jnp.asarray(H0, dtype), opts,
            mesh,
        )
    else:
        res = nmf_solve(
            a_op, jnp.asarray(W0, dtype), jnp.asarray(H0, dtype), opts
        )
    W = np.asarray(res.W)
    H = np.asarray(res.H)
    if stats is not None:
        stats.elapsed_us = int((time.perf_counter() - t0) * 1e6)
        stats.iteration_count = int(res.iterations)

    assignments = compute_assignments(H)
    fuzzy = compute_fuzzy_assignments(H).astype(np.float32)
    return W, H, assignments, fuzzy, bool(res.success)


def write_flatclust_results(
    outdir: str,
    assignments: np.ndarray,
    fuzzy: np.ndarray,
    W: np.ndarray,
    dictionary,
    maxterms: int,
    fmt: OutputFormat,
    num_clusters: int,
    assignments_prefix: str = "assignments_",
):
    """Write clusters_N.{xml,json}, <prefix>N.csv, assignments_fuzzy_N.csv
    (reference FlatClustWriteResults, flat_clust_output.cpp:52-178; the
    hierclust flat path uses prefix 'assignments_flat_', :152-155)."""
    import os

    from ..io.writers import make_flatclust_writer

    n = len(assignments)
    k = num_clusters
    ext = "xml" if fmt == OutputFormat.XML else "json"

    apath = os.path.join(outdir, f"{assignments_prefix}{k}.csv")
    with open(apath, "w") as f:
        f.write(",".join(str(int(a)) for a in assignments))
        f.write("\n")

    fpath = os.path.join(outdir, f"assignments_fuzzy_{k}.csv")
    with open(fpath, "w") as f:
        for c in range(n):
            f.write(",".join(f"{fuzzy[r, c]:.3e}" for r in range(k)))
            f.write("\n")

    terms = top_terms_matrix(W, maxterms)  # (maxterms, k)
    term_lists = [list(terms[:, c]) for c in range(k)]
    doc_counts = {}
    for a in assignments:
        doc_counts[int(a)] = doc_counts.get(int(a), 0) + 1

    rpath = os.path.join(outdir, f"clusters_{k}.{ext}")
    writer = make_flatclust_writer(fmt)
    with open(rpath, "w") as f:
        writer.write(f, n, doc_counts, term_lists, dictionary)
    return apath, fpath, rpath


def run_hier_nmf2(
    A,
    opts: ClustOptions,
    rng,
    stats=None,
    mesh=None,
    checkpoint_path=None,
):
    """Full hierarchical workload: tree + optional flat refinement.

    Reference: RunHierNmf2 (hierclust/include/run_hier_nmf2.hpp:17-76).
    Returns (tree, stats, flat) where flat is None or a dict with
    W, H, assignments, fuzzy.  `mesh` distributes both phases;
    `checkpoint_path` makes the tree phase preemption-safe (resumes
    from an existing checkpoint).
    """
    from ..common.options import ClustStats
    from .hierclust import clust_flat, clust_hier

    stats = stats if stats is not None else ClustStats()
    tree, stats = clust_hier(A, opts, rng, stats, mesh=mesh,
                             checkpoint_path=checkpoint_path)

    flat = None
    if opts.flat:
        W, H, ok = clust_flat(A, tree, opts, rng, mesh=mesh)
        flat = {
            "W": W,
            "H": H,
            "assignments": compute_assignments(H),
            "fuzzy": compute_fuzzy_assignments(H).astype(np.float32),
            "success": ok,
        }
    return tree, stats, flat
