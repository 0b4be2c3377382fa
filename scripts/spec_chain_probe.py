"""Classify each pop against the previous two splits' children (CPU).

spec_hitrate2 showed pop i+1 is the best already-scored leaf (90-100%)
but pop i+2 is never the SECOND-best scored leaf — so where does it
come from?  If pop i+2 is reliably the best-priority CHILD of split i+1,
then a chained device program (pair solve -> pick best child -> solve
its pair too) predicts two pops per dispatch and halves the fetch count.
"""
import sys
from collections import Counter

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
history = []  # (popped, children_of_that_split)


def traced(self):
    mn, mx, idx = orig(self)
    history.append([idx, None])
    return mn, mx, idx


orig_split = Tree.split


def split_traced(self, index, W, H=None, labels=None):
    out = orig_split(self, index, W, H=H, labels=labels)
    if history:
        history[-1][1] = (self.index0, self.index1)
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
        history.clear()
        tree, _ = hc.clust_hier(A, copts, Random(seed))
        cls = Counter()
        for i in range(1, len(history)):
            pop = history[i][0]
            prev_children = history[i - 1][1]
            if prev_children and pop in prev_children:
                # which child: the higher-priority one?
                c0, c1 = prev_children
                best = c0 if tree.nodes[c0].priority >= \
                    tree.nodes[c1].priority else c1
                # NOTE: priorities read post-run are final (children may
                # have been split since) but set_node_priority is only
                # called once per node, so they equal the at-the-time
                # values.
                cls["prev-best-child" if pop == best
                    else "prev-other-child"] += 1
            elif i >= 2 and history[i - 2][1] and pop in history[i - 2][1]:
                cls["grandprev-child"] += 1
            else:
                cls["older-leaf"] += 1
        print(f"{tag} seed {seed}: {dict(cls)} of {len(history)-1} pops")
