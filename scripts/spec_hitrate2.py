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
pops = []   # actual pop sequence
preds = []  # (P1, P2) made at each split's DISPATCH time


def traced(self):
    mn, mx, idx = orig(self)
    pops.append(idx)
    return mn, mx, idx


orig_split = Tree.split


def split_traced(self, index, W, H=None, labels=None):
    out = orig_split(self, index, W, H=H, labels=labels)
    # dispatch-time prediction: this split's pair is now in flight, its
    # children (index0/index1) are the ONLY leaves without final
    # priorities — everything else is fair game for the next two pops
    cand = sorted(
        (
            (self.nodes[q].priority, q)
            for q, leaf in enumerate(self.is_leaf)
            if leaf and q not in (self.index0, self.index1)
            and self.nodes[q].priority > 0
        ),
        reverse=True,
    )
    p1 = cand[0][1] if cand else None
    p2 = cand[1][1] if len(cand) > 1 else None
    preds.append((p1, p2))
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
        preds.clear()
        hc.clust_hier(A, copts, Random(seed))
        # preds[s] was made at the dispatch of split s+1 (split_root does
        # not fire Tree.split), which followed pops[s]; it predicts the
        # NEXT two pops, pops[s+1] and pops[s+2]
        n1 = n2 = h1 = h2 = 0
        for s, (p1, p2) in enumerate(preds):
            if s + 1 < len(pops):
                n1 += 1
                h1 += pops[s + 1] == p1
            if s + 2 < len(pops):
                n2 += 1
                h2 += pops[s + 1] == p1 and pops[s + 2] == p2
        print(f"{tag} seed {seed}: depth-1 {h1}/{n1}  depth-2 {h2}/{n2}")
