"""Depth-2 pop predictability (CPU): at split i's dispatch, predict the
next TWO pops as the two best leaves with already-final priorities
(excluding split i's children, whose priorities are still in flight, and
P1's own children for the second slot).  A depth-2 speculation pipeline
needs both to land."""
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
pops = []


def traced(self):
    mn, mx, idx = orig(self)
    newest = getattr(self, "_newest", None)
    # two best leaves whose priorities were final before the in-flight
    # split's children were scored
    cand = sorted(
        (
            (self.nodes[q].priority, q)
            for q, leaf in enumerate(self.is_leaf)
            if leaf and not (newest and q in newest)
            and self.nodes[q].priority > 0
        ),
        reverse=True,
    )
    p1 = cand[0][1] if cand else None
    p2 = cand[1][1] if len(cand) > 1 else None
    pops.append((idx, p1, p2))
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
    "100 leaves": (12411, 7984 * 2, 128, 100),
}.items():
    for seed in (2, 5):
        A, _ = synthetic_term_doc_corpus(m, n, kc, seed=seed + 9)
        copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=leaves,
                             verbose=False)
        pops.clear()
        hc.clust_hier(A, copts, Random(seed))
        h1 = sum(1 for i, (idx, p1, _) in enumerate(pops) if idx == p1)
        # depth-2: pop i predicted by slot-1 at i-1 AND by slot-2 at i-2
        h2 = sum(
            1 for i in range(2, len(pops))
            if pops[i][0] == pops[i - 1][1] == pops[i - 2][2]
        )
        print(f"{tag} seed {seed}: depth-1 {h1}/{len(pops)}  "
              f"depth-2 {h2}/{max(len(pops) - 2, 0)}")
