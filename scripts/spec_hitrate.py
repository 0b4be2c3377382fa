"""Measure the hierclust pop-prediction hit rate (CPU).

The tree loop's only cross-split dependency is the priority pop: split
i+1 factors the children of the max-priority leaf, and the only unknown
at dispatch time of split i is the pair of priorities split i produces.
If the pop usually lands on the best PRE-EXISTING leaf (whose docs are
already known), a speculative dispatch of that leaf's child pair can
overlap the ~RTT-bound fetch of split i — this script measures how often
that speculation would hit.
"""
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from smallk_tpu.common.options import (  # noqa: E402
    ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
)
from smallk_tpu.common.rng import Random  # noqa: E402
from smallk_tpu.engines import hierclust as hc  # noqa: E402
from smallk_tpu.engines.corpus import synthetic_term_doc_corpus  # noqa: E402
from smallk_tpu.engines.tree import Tree  # noqa: E402

nmf_opts = NmfOptions(
    tol=1e-4, algorithm=NmfAlgorithm.RANK2,
    prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
    min_iter=1, max_iter=5000, verbose=False, dtype="float32",
    a_dtype="float32", stall_patience=100,
)

orig = Tree.min_max_leaf_priorities
events = []


def traced(self):
    mn, mx, idx = orig(self)
    # prediction available before the last split's children were scored:
    # the best leaf EXCLUDING the two newest children
    newest = getattr(self, "_newest", None)
    best_old, best_old_pr = None, -np.inf
    for q, leaf in enumerate(self.is_leaf):
        if not leaf or (newest and q in newest):
            continue
        pr = self.nodes[q].priority
        if pr > best_old_pr:
            best_old_pr, best_old = pr, q
    events.append((idx, best_old))
    return mn, mx, idx


orig_split = Tree.split


def split_traced(self, index, W, H=None, labels=None):
    out = orig_split(self, index, W, H=H, labels=labels)
    self._newest = (self.index0, self.index1)
    return out


Tree.min_max_leaf_priorities = traced
Tree.split = split_traced

for tag, (m, n, kc, leaves) in {
    "12c": (12411, 7984, 16, 12),
    "25c": (12411, 7984, 32, 25),
    "100 leaves": (12411, 7984 * 2, 128, 100),
}.items():
    for seed in (2, 5):
        A, _ = synthetic_term_doc_corpus(m, n, kc, seed=seed + 9)
        copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=leaves,
                             verbose=False)
        events.clear()
        tree, st = hc.clust_hier(A, copts, Random(seed))
        hits = sum(1 for idx, pred in events if idx == pred)
        print(f"{tag} seed {seed}: {hits}/{len(events)} pops predictable "
              f"({100 * hits / max(len(events), 1):.0f}%), "
              f"{st.nmf_count} solves")
