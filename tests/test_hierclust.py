"""Hierarchical clustering engine tests.

Reference test model: golden-tree comparison on fixed initializers
(tests/scripts/test_smallk.sh); here replaced by structural checks on
synthetic data with planted cluster structure (SURVEY.md §4 implications).
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from smallk_tpu.common.options import (
    ClustOptions,
    NmfAlgorithm,
    NmfOptions,
    NmfProgressAlgorithm,
)
from smallk_tpu.common.rng import Random
from smallk_tpu.engines.hierclust import clust_flat, clust_hier
from smallk_tpu.engines.priority import compute_priority
from smallk_tpu.engines.tree import Tree


def _planted_matrix(m=60, n=80, k=4, seed=0, noise=0.01):
    """Block matrix with k planted clusters of docs sharing term blocks."""
    rng = np.random.RandomState(seed)
    A = noise * rng.rand(m, n)
    docs_per = n // k
    terms_per = m // k
    labels = np.zeros(n, dtype=int)
    for c in range(k):
        cols = slice(c * docs_per, (c + 1) * docs_per if c < k - 1 else n)
        rows = slice(c * terms_per, (c + 1) * terms_per)
        A[rows, cols] += 1.0 + rng.rand(
            rows.stop - rows.start,
            (cols.stop or n) - cols.start,
        )
        labels[cols] = c
    return A, labels


def _clust_opts(k, flat=False, dtype="float64"):
    return ClustOptions(
        nmf_opts=NmfOptions(
            tol=1e-4,
            algorithm=NmfAlgorithm.RANK2,
            prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO,
            height=0, width=0, k=2,
            min_iter=1, max_iter=5000, verbose=False, dtype=dtype,
        ),
        num_clusters=k, verbose=False, flat=flat,
    )


def _purity(assignments, labels):
    """Fraction of docs in the majority true class of their cluster."""
    total = 0
    for c in np.unique(assignments):
        if c < 0:
            continue
        mask = assignments == c
        counts = np.bincount(labels[mask])
        total += counts.max()
    return total / len(labels)


class TestClustHier:
    def test_planted_clusters_recovered(self):
        A, labels = _planted_matrix(k=4)
        opts = _clust_opts(4)
        tree, stats = clust_hier(A, opts, Random(17))

        # 4 leaves, assignments cover all docs (maybe minus outliers)
        leaves = [q for q, leaf in enumerate(tree.is_leaf) if leaf]
        assert len(leaves) == 4
        assert stats.nmf_count >= 7  # root + 2 per split minimum

        a = tree.assignments
        assigned = a >= 0
        assert assigned.mean() > 0.9
        assert _purity(a[assigned], labels[assigned]) > 0.95

    def test_sparse_input(self):
        A, labels = _planted_matrix(k=3, noise=0.0)
        A_sp = sp.csc_matrix(A)
        opts = _clust_opts(3)
        tree, _ = clust_hier(A_sp, opts, Random(1))
        a = tree.assignments
        assigned = a >= 0
        assert _purity(a[assigned], labels[assigned]) > 0.95

    def test_tree_structure_consistent(self):
        A, _ = _planted_matrix(k=4)
        opts = _clust_opts(4)
        tree, _ = clust_hier(A, opts, Random(3))
        # every non-root node has a valid parent or is a root child
        for q, node in enumerate(tree.nodes):
            if not node.is_valid:
                continue
            if node.parent_index >= 0:
                parent = tree.nodes[node.parent_index]
                assert q in (
                    parent.left_child_index, parent.right_child_index
                )
            # docs of children partition the parent docs (minus drops)
            if node.left_child_index >= 0:
                lc = tree.nodes[node.left_child_index].docs
                rc = tree.nodes[node.right_child_index].docs
                merged = np.sort(np.concatenate([lc, rc]))
                assert len(np.intersect1d(lc, rc)) == 0
                assert np.isin(merged, node.docs).all()

    def test_determinism(self):
        A, _ = _planted_matrix(k=3)
        opts = _clust_opts(3)
        t1, _ = clust_hier(A, opts, Random(11))
        t2, _ = clust_hier(A, opts, Random(11))
        np.testing.assert_array_equal(t1.assignments, t2.assignments)

    def test_initdir_fixed_initializers(self, tmp_path):
        """Fixed Winit_N/Hinit_N files give deterministic trees
        (reference determinism hook, clust_hier_generic.hpp:568)."""
        from smallk_tpu.io.delimited import write_delimited

        A, _ = _planted_matrix(m=30, n=40, k=3)
        rng = np.random.RandomState(0)
        for i in range(1, 12):
            write_delimited(
                str(tmp_path / f"Winit_{i}.csv"), rng.rand(30, 2), 15
            )
            write_delimited(
                str(tmp_path / f"Hinit_{i}.csv"), rng.rand(2, 40), 15
            )
        import dataclasses

        opts = dataclasses.replace(_clust_opts(3), initdir=str(tmp_path))
        t1, _ = clust_hier(A, opts, Random(1))
        t2, _ = clust_hier(A, opts, Random(999))  # rng unused with initdir
        np.testing.assert_array_equal(t1.assignments, t2.assignments)


class TestClustFlat:
    def test_flat_refinement(self):
        A, labels = _planted_matrix(k=4)
        opts = _clust_opts(4, flat=True)
        tree, _ = clust_hier(A, opts, Random(17))
        W, H, ok = clust_flat(A, tree, opts, Random(17))
        assert ok
        assert W.shape == (60, 4) and H.shape == (4, 80)
        flat_assign = np.argmax(H, axis=0)
        assert _purity(flat_assign, labels) > 0.9


class TestPriority:
    def test_degenerate_parent(self):
        w_parent = np.zeros(10)
        w_child = np.random.RandomState(0).rand(10, 2)
        assert compute_priority(w_parent, w_child) == -3.0

    def test_identical_children_high_score(self):
        # children ranked identically to parent -> NDCG product near 1
        rng = np.random.RandomState(1)
        w = np.sort(rng.rand(50))[::-1] + 0.1
        w_child = np.stack([w, w], axis=1)
        p = compute_priority(w, w_child)
        assert 0.5 < p <= 1.5

    def test_score_in_range(self):
        rng = np.random.RandomState(2)
        for seed in range(5):
            r = np.random.RandomState(seed)
            p = compute_priority(r.rand(40), r.rand(40, 2))
            assert -3 <= p <= 2


class TestTreeWriters:
    def test_write_outputs(self, tmp_path):
        from smallk_tpu.common.options import OutputFormat
        from smallk_tpu.io.writers import make_hierclust_writer

        A, _ = _planted_matrix(k=3)
        opts = _clust_opts(3)
        tree, _ = clust_hier(A, opts, Random(17))

        apath = str(tmp_path / "assignments_3.csv")
        tree.write_assignments(apath)
        first = open(apath).readline().strip().split(",")
        assert len(first) == 80

        dictionary = [f"term{i}" for i in range(60)]
        for fmt, name in ((OutputFormat.XML, "tree_3.xml"),
                          (OutputFormat.JSON, "tree_3.json")):
            path = str(tmp_path / name)
            tree.write_tree(make_hierclust_writer(fmt), path, dictionary)
            content = open(path).read()
            assert "term" in content
        # JSON must parse
        import json

        data = json.loads(open(str(tmp_path / "tree_3.json")).read())
        assert data["doc_count"] == tree.leaf_doc_count
        assert len(data["nodes"]) == 4  # 2*(3-1)


class TestHierCheckpoint:
    def test_resume_matches_uninterrupted(self, tmp_path):
        """Interrupt after 2 splits, resume from checkpoint: the final
        tree must equal the uninterrupted run's (same RNG stream)."""
        A, _ = _planted_matrix(k=5, n=100)
        opts = _clust_opts(5)

        ref_tree, ref_stats = clust_hier(A, opts, Random(13))

        ck = str(tmp_path / "hier.npz")
        with pytest.raises(KeyboardInterrupt):
            clust_hier(A, opts, Random(13), checkpoint_path=ck,
                       _interrupt_after=2)
        assert (tmp_path / "hier.npz").exists()

        # fresh rng: its state is restored from the checkpoint
        tree, stats = clust_hier(A, opts, Random(999), checkpoint_path=ck)
        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)
        assert stats.nmf_count == ref_stats.nmf_count

    def test_resume_from_pre_labels_checkpoint(self, tmp_path):
        """Checkpoints written before the device-resident refactor stored
        full H slabs (Hbuf_*/root_H); loading converts them to split
        masks via H(0,:) > H(1,:)."""
        A, _ = _planted_matrix(k=5, n=100)
        opts = _clust_opts(5)

        ref_tree, _ = clust_hier(A, opts, Random(13))

        ck = str(tmp_path / "hier.npz")
        with pytest.raises(KeyboardInterrupt):
            clust_hier(A, opts, Random(13), checkpoint_path=ck,
                       _interrupt_after=2)

        # rewrite the checkpoint into the legacy format: each Lbuf_<i>
        # bool mask becomes an Hbuf_<i> slab whose row-0 > row-1 iff left
        with np.load(ck, allow_pickle=False) as z:
            arrs = {k: z[k] for k in z.files}
        legacy = {}
        for key, val in arrs.items():
            if key.startswith("Lbuf_"):
                left = np.asarray(val, bool)
                H = np.stack([left.astype(np.float64),
                              1.0 - left.astype(np.float64)])
                legacy["Hbuf_" + key[len("Lbuf_"):]] = H
            else:
                legacy[key] = val
        np.savez(ck, **legacy)

        tree, _ = clust_hier(A, opts, Random(999), checkpoint_path=ck)
        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)

    def test_checkpoint_written_and_final(self, tmp_path):
        A, _ = _planted_matrix(k=3)
        opts = _clust_opts(3)
        ck = str(tmp_path / "h.npz")
        t1, _ = clust_hier(A, opts, Random(4), checkpoint_path=ck)
        # resume-from-complete: loop body is skipped, results identical
        t2, _ = clust_hier(A, opts, Random(5), checkpoint_path=ck)
        np.testing.assert_array_equal(t1.assignments, t2.assignments)


class TestSpeculation:
    """Speculative next-pop dispatch must never change results — the RNG
    save/restore makes hits draw the sequential seeds and misses roll
    back (hierclust._Rank2Runner speculation block).  These need doc
    counts above _MIN_BUCKET so the pair path (and with it speculation)
    actually engages — the other fixtures in this file are too small."""

    @pytest.fixture(autouse=True)
    def _no_chain(self, monkeypatch):
        # the multi-split chain supersedes speculation when eligible;
        # these tests exercise the sequential engine's speculation path
        from smallk_tpu.engines import hier_chain

        monkeypatch.setattr(hier_chain, "CHAIN", False)

    @staticmethod
    def _big(seed=3):
        return _planted_matrix(m=96, n=1400, k=6, seed=seed)

    def test_bit_identical_with_and_without(self, monkeypatch):
        from smallk_tpu.engines import hierclust as hc

        A, _ = self._big()
        opts = _clust_opts(6)

        monkeypatch.setattr(hc, "SPECULATE", False)
        ref_tree, ref_stats = clust_hier(A, opts, Random(21))

        monkeypatch.setattr(hc, "SPECULATE", True)
        tree, stats = clust_hier(A, opts, Random(21))

        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)
        for n1, n2 in zip(tree.nodes, ref_tree.nodes):
            assert n1.priority == n2.priority
            if n1.docs is not None or n2.docs is not None:
                np.testing.assert_array_equal(n1.docs, n2.docs)
        assert stats.nmf_count == ref_stats.nmf_count
        assert stats.iter_count == ref_stats.iter_count

    def test_speculation_engages(self):
        """Guard against the pair/speculation path silently gating off:
        at least one speculative dispatch must hit.  Needs a corpus with
        realistically decaying split priorities (new children rarely
        outrank existing leaves there — scripts/spec_hitrate.py measured
        90-100%); on blocky planted matrices children often win the pop
        and speculation mostly misses, which is also fine, just not a
        useful canary."""
        from smallk_tpu.engines import hierclust as hc
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

        A, _ = synthetic_term_doc_corpus(1500, 1400, 8, seed=5)
        opts = _clust_opts(8, dtype="float32")

        hits = 0
        orig = hc._Rank2Runner.take_spec

        def counting(self, node):
            nonlocal hits
            had = bool(self._spec) and self._spec[0][0] == node
            out = orig(self, node)
            hits += bool(had and out is not None)
            return out

        hc._Rank2Runner.take_spec = counting
        try:
            clust_hier(A, opts, Random(21))
        finally:
            hc._Rank2Runner.take_spec = orig
        assert hits >= 1

    def test_resume_with_speculation_pending(self, tmp_path):
        """The checkpoint records the PRE-speculation RNG state; resuming
        mid-tree must reproduce the uninterrupted run exactly even though
        the interrupt landed while a speculative draw was outstanding."""
        A, _ = self._big(seed=4)
        opts = _clust_opts(6)

        ref_tree, ref_stats = clust_hier(A, opts, Random(33))

        ck = str(tmp_path / "spec.npz")
        with pytest.raises(KeyboardInterrupt):
            clust_hier(A, opts, Random(33), checkpoint_path=ck,
                       _interrupt_after=2)
        tree, stats = clust_hier(A, opts, Random(999), checkpoint_path=ck)
        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)
        assert stats.nmf_count == ref_stats.nmf_count

    @pytest.mark.parametrize("depth,prefetch", [(1, True), (3, True),
                                                (2, False)])
    def test_depth_and_prefetch_parity(self, monkeypatch, depth, prefetch):
        """Any speculation depth and either fetch mechanism must leave
        results bit-identical to the sequential schedule."""
        from smallk_tpu.engines import hierclust as hc

        A, _ = self._big()
        opts = _clust_opts(6)

        monkeypatch.setattr(hc, "SPECULATE", False)
        ref_tree, ref_stats = clust_hier(A, opts, Random(21))

        monkeypatch.setattr(hc, "SPECULATE", True)
        monkeypatch.setattr(hc, "SPEC_DEPTH", depth)
        monkeypatch.setattr(hc, "SPEC_PREFETCH", prefetch)
        tree, stats = clust_hier(A, opts, Random(21))

        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)
        assert stats.nmf_count == ref_stats.nmf_count
        assert stats.iter_count == ref_stats.iter_count

    def test_adaptive_depth_caps_on_device_bound_operands(self, monkeypatch):
        """Operands at/above SPEC_DEVICE_BOUND elements cap the speculation
        stack at depth 1 (tpu_batch22: deeper speculation loses once the
        pair solves dominate the fetch round trip), and the capped run
        stays bit-identical to the sequential schedule."""
        from smallk_tpu.engines import hierclust as hc

        A, _ = self._big()
        opts = _clust_opts(6)

        monkeypatch.setattr(hc, "SPECULATE", False)
        ref_tree, ref_stats = clust_hier(A, opts, Random(21))

        monkeypatch.setattr(hc, "SPECULATE", True)
        monkeypatch.setattr(hc, "SPEC_DEVICE_BOUND", A.size)  # force the cap
        depth_seen = []
        orig_init = hc._Rank2Runner.__init__

        def spy(self, *a, **kw):
            orig_init(self, *a, **kw)
            depth_seen.append(self.spec_depth)

        monkeypatch.setattr(hc._Rank2Runner, "__init__", spy)
        tree, stats = clust_hier(A, opts, Random(21))
        assert depth_seen == [1]

        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)
        assert stats.nmf_count == ref_stats.nmf_count

        # a small operand keeps the full stack depth
        depth_seen.clear()
        monkeypatch.setattr(hc, "SPEC_DEVICE_BOUND", A.size + 1)
        clust_hier(A, opts, Random(21))
        assert depth_seen == [hc.SPEC_DEPTH]


class TestMultiSplitChain:
    """The multi-split device chain (engines/hier_chain.py) must produce
    trees BIT-IDENTICAL to the sequential engine: same priorities, same
    per-node docs, same assignments, same solve/iteration counts.  The
    chain pre-draws each segment's initializer seeds from the same host
    stream and rolls back to exactly the consumed count, and every
    deviation from the common path (outlier gate, tiny children, solver
    failure) bails to the sequential engine for one split."""

    @staticmethod
    def _seq_vs_chain(A, opts, seed, seg, monkeypatch):
        from smallk_tpu.engines import hier_chain

        monkeypatch.setattr(hier_chain, "CHAIN", False)
        ref_tree, ref_stats = clust_hier(A, opts, Random(seed))

        monkeypatch.setattr(hier_chain, "CHAIN", True)
        monkeypatch.setattr(hier_chain, "CHAIN_SEG", seg)
        tree, stats = clust_hier(A, opts, Random(seed))
        return ref_tree, ref_stats, tree, stats

    @staticmethod
    def _assert_identical(ref_tree, ref_stats, tree, stats):
        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)
        assert list(tree.is_leaf) == list(ref_tree.is_leaf)
        for q, (n1, n2) in enumerate(zip(tree.nodes, ref_tree.nodes)):
            assert n1.priority == n2.priority, f"node {q} priority"
            assert n1.pop_priority == n2.pop_priority, f"node {q} pop"
            assert n1.parent_index == n2.parent_index, f"node {q} parent"
            if n1.docs is not None or n2.docs is not None:
                np.testing.assert_array_equal(n1.docs, n2.docs,
                                              err_msg=f"node {q} docs")
            t1 = getattr(n1, "term_indices", None)
            t2 = getattr(n2, "term_indices", None)
            assert (t1 is None) == (t2 is None), f"node {q} terms"
            if t1 is not None:
                np.testing.assert_array_equal(t1, t2,
                                              err_msg=f"node {q} terms")
        assert stats.nmf_count == ref_stats.nmf_count
        assert stats.iter_count == ref_stats.iter_count
        assert stats.max_count == ref_stats.max_count

    @pytest.mark.parametrize("seg", [2, 32])
    def test_bit_identical_clean_path(self, monkeypatch, seg):
        from smallk_tpu.engines import hier_chain
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

        A, _ = synthetic_term_doc_corpus(700, 1400, 10, seed=5)
        A = np.asarray(A.todense()).astype(np.float64)
        opts = _clust_opts(10)
        out = self._seq_vs_chain(A, opts, 21, seg, monkeypatch)
        self._assert_identical(*out)
        # the chain must actually have carried splits (not bailed out)
        assert hier_chain.LAST_STATS["committed"] >= 5

    def test_bit_identical_spectral(self, monkeypatch):
        """Spectral init under the chain must equal sequential spectral
        bit-for-bit: both trace hierclust._solve_from_draw (VERDICT r3
        #1b/#3)."""
        import dataclasses

        from smallk_tpu.engines import hier_chain
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

        A, _ = synthetic_term_doc_corpus(700, 1400, 10, seed=5)
        A = np.asarray(A.todense()).astype(np.float64)
        opts = dataclasses.replace(_clust_opts(10),
                                   init_method="spectral")
        out = self._seq_vs_chain(A, opts, 21, 32, monkeypatch)
        self._assert_identical(*out)
        assert hier_chain.LAST_STATS["committed"] >= 5

    def test_bit_identical_f32(self, monkeypatch):
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

        A, _ = synthetic_term_doc_corpus(700, 1400, 10, seed=5)
        A = np.asarray(A.todense()).astype(np.float32)
        opts = _clust_opts(10, dtype="float32")
        out = self._seq_vs_chain(A, opts, 21, 32, monkeypatch)
        self._assert_identical(*out)

    def test_bail_on_outlier_gate_and_reentry(self, monkeypatch):
        """A tiny planted cluster + a high unbalanced threshold forces
        TrialSplit's outlier branch: the chain must bail, let the
        sequential engine drop/recycle, resync, and continue — with the
        final tree still bit-identical."""
        from smallk_tpu.engines import hier_chain

        rng = np.random.RandomState(5)
        m, n = 300, 1400
        A = np.zeros((m, n))
        col = 0
        for c, sz in enumerate([650, 620, 130]):
            rows = slice(c * 100, (c + 1) * 100)
            block = rng.rand(100, sz) * (rng.rand(100, sz) < 0.25)
            block[0, :] += 0.5
            A[rows, col:col + sz] = block
            col += sz
        A += (np.random.RandomState(6).rand(m, n) < 0.02) * 0.1

        opts = ClustOptions(
            nmf_opts=NmfOptions(
                tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
                min_iter=1, max_iter=5000, verbose=False,
                dtype="float64",
            ),
            num_clusters=3, verbose=False, unbalanced=0.45,
            trial_allowance=2,
        )
        out = self._seq_vs_chain(A, opts, 7, 32, monkeypatch)
        self._assert_identical(*out)
        # trial retries happened (more solves than 2 splits account for)
        assert out[1].nmf_count > 5
        assert hier_chain.LAST_STATS["bails"] >= 1

    def test_done_path(self, monkeypatch):
        """More requested clusters than splittable leaves: the chain must
        stop on the all-negative-priority condition exactly where the
        sequential engine does."""
        rng = np.random.RandomState(2)
        m, n = 200, 900
        A = np.zeros((m, n))
        A[:100, :450] = rng.rand(100, 450) * (rng.rand(100, 450) < 0.25)
        A[100:, 450:] = rng.rand(100, 450) * (rng.rand(100, 450) < 0.25)
        A[0, :] += 0.5
        A[100, :] += 0.5
        opts = ClustOptions(
            nmf_opts=NmfOptions(
                tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
                min_iter=1, max_iter=5000, verbose=False,
                dtype="float64",
            ),
            num_clusters=8, verbose=False, unbalanced=0.45,
            trial_allowance=2,
        )
        out = self._seq_vs_chain(A, opts, 7, 3, monkeypatch)
        self._assert_identical(*out)

    def test_chain_ineligible_paths_fall_back(self, monkeypatch, tmp_path):
        """initdir / checkpointing / sparse operands / size_ndcg must not
        use the chain (ChainDriver.available gates)."""
        from smallk_tpu.engines import hier_chain
        from smallk_tpu.engines import hierclust as hc

        A, _ = _planted_matrix(m=96, n=1400, k=6, seed=3)
        opts = _clust_opts(6)
        monkeypatch.setattr(hier_chain, "CHAIN", True)

        calls = []
        orig = hier_chain.ChainDriver.run_segment

        def spy(self, *a, **kw):
            calls.append(1)
            return orig(self, *a, **kw)

        monkeypatch.setattr(hier_chain.ChainDriver, "run_segment", spy)

        # checkpointing now RUNS under the chain (segment-granularity
        # saves) ...
        clust_hier(A, opts, Random(21),
                   checkpoint_path=str(tmp_path / "c.npz"))
        assert len(calls) >= 1
        calls.clear()

        # ... but the test interrupt hook still forces the sequential
        # engine (its cadence contract is per split)
        with pytest.raises(KeyboardInterrupt):
            clust_hier(A, opts, Random(21), _interrupt_after=2)
        assert calls == []

        import dataclasses

        # the dense default path DOES use it (small sparse inputs are
        # densified by as_aop and use it too)
        clust_hier(A, opts, Random(21))
        assert len(calls) >= 1

        # spectral init now RUNS under the chain (VERDICT r3 #1b): the
        # shared _solve_from_draw body handles the spectral start
        calls.clear()
        clust_hier(A, dataclasses.replace(opts, init_method="spectral"),
                   Random(21))
        assert len(calls) >= 1

    def test_root_runs_in_chain(self, monkeypatch):
        """On the clean path the root factorization rides inside the
        first segment program — the host serial solve must never run."""
        from smallk_tpu.engines import hierclust as hc
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

        A, _ = synthetic_term_doc_corpus(700, 1400, 10, seed=5)
        A = np.asarray(A.todense()).astype(np.float64)

        def boom(self, subset=None, w_parent=None, max_attempts=3):
            raise AssertionError("host serial solve called on the "
                                 "clean chain path")

        monkeypatch.setattr(hc._Rank2Runner, "solve", boom)
        tree, stats = clust_hier(A, _clust_opts(8), Random(21))
        assert int(np.sum(tree.is_leaf)) == 8
        assert stats.nmf_count >= 15  # root + 7 pairs

    @pytest.mark.parametrize("dtype", ["float64", "float32"])
    def test_bit_identical_graph_options(self, monkeypatch, dtype):
        """size_ndcg pop policy + best-of-R restarts (the graph-workflow
        preset) run through the chain and stay bit-identical to the
        sequential engine."""
        import dataclasses

        from smallk_tpu.engines import hier_chain
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

        A, _ = synthetic_term_doc_corpus(700, 1400, 10, seed=5)
        A = np.asarray(A.todense()).astype(
            np.float64 if dtype == "float64" else np.float32)
        opts = dataclasses.replace(
            _clust_opts(10, dtype=dtype),
            priority_method="size_ndcg", restarts=3,
        )
        out = self._seq_vs_chain(A, opts, 21, 32, monkeypatch)
        self._assert_identical(*out)
        assert hier_chain.LAST_STATS["committed"] >= 5


class TestPrefetchPool:
    """Direct unit coverage for the background fetch pool (otherwise
    only exercised incidentally through speculation)."""

    def test_take_returns_fetched_value(self):
        from smallk_tpu.engines.hierclust import _PrefetchPool

        pool = _PrefetchPool()
        try:
            t1 = pool.submit(np.arange(5.0))
            t2 = pool.submit(np.arange(3.0) * 2)
            np.testing.assert_array_equal(pool.take(t2),
                                          np.arange(3.0) * 2)
            np.testing.assert_array_equal(pool.take(t1), np.arange(5.0))
        finally:
            pool.close()

    def test_drop_before_and_after_fetch(self):
        import time

        from smallk_tpu.engines.hierclust import _PrefetchPool

        pool = _PrefetchPool(workers=1)  # one worker so t4 stays queued
        try:
            t1 = pool.submit(np.ones(4))
            pool.take(t1)  # force the worker past t1
            t2 = pool.submit(np.ones(2))
            time.sleep(0.05)  # t2 result has landed
            pool.drop(t2)
            assert t2 not in pool._out
            # drop-while-queued: block the worker with a slow fetch
            class Slow:
                def __array__(self, dtype=None, copy=None):
                    time.sleep(0.2)
                    return np.zeros(1)

            t3 = pool.submit(Slow())
            t4 = pool.submit(np.full(2, 7.0))
            pool.drop(t4)  # cancelled while still queued behind t3
            t5 = pool.submit(np.full(2, 9.0))
            np.testing.assert_array_equal(pool.take(t5), np.full(2, 9.0))
            assert t4 not in pool._out
            pool.drop(t3)
        finally:
            pool.close()

    def test_exception_surfaces_on_take(self):
        from smallk_tpu.engines.hierclust import _PrefetchPool

        class Boom:
            def __array__(self, dtype=None, copy=None):
                raise RuntimeError("device fell over")

        pool = _PrefetchPool()
        try:
            tok = pool.submit(Boom())
            with pytest.raises(RuntimeError, match="device fell over"):
                pool.take(tok)
        finally:
            pool.close()


class TestCheckpointGuards:
    def test_mismatched_config_rejected(self, tmp_path):
        """Resuming with a different cluster count (or shape) must fail
        loudly instead of corrupting buffer indexing."""
        A, _ = _planted_matrix(k=5, n=100)
        ck = str(tmp_path / "h.npz")
        with pytest.raises(KeyboardInterrupt):
            clust_hier(A, _clust_opts(5), Random(13), checkpoint_path=ck,
                       _interrupt_after=2)
        with pytest.raises(ValueError, match="num_clusters"):
            clust_hier(A, _clust_opts(4), Random(13), checkpoint_path=ck)

    def test_initdir_resume_preserves_file_order(self, tmp_path):
        """With initdir, the resumed run must continue from the NEXT
        unconsumed Winit/Hinit file, not restart at _1 (the consumption
        counter is checkpointed)."""
        import dataclasses

        from smallk_tpu.io.delimited import write_delimited

        A, _ = _planted_matrix(m=30, n=40, k=3)
        rng = np.random.RandomState(0)
        ini = tmp_path / "inits"
        ini.mkdir()
        for i in range(1, 12):
            write_delimited(str(ini / f"Winit_{i}.csv"),
                            rng.rand(30, 2), 15)
            write_delimited(str(ini / f"Hinit_{i}.csv"),
                            rng.rand(2, 40), 15)
        opts = dataclasses.replace(_clust_opts(4), initdir=str(ini))

        ref_tree, _ = clust_hier(A, opts, Random(1))

        ck = str(tmp_path / "h.npz")
        with pytest.raises(KeyboardInterrupt):
            clust_hier(A, opts, Random(1), checkpoint_path=ck,
                       _interrupt_after=1)
        tree, _ = clust_hier(A, opts, Random(1), checkpoint_path=ck)
        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)


def test_on_node_failure_leaf(monkeypatch):
    """on_node_failure="leaf": an unsplittable node (every solve retry
    fails) becomes a permanent leaf instead of aborting the run
    (graph-preset production behavior; the reference aborts,
    clust_hier_generic.hpp:123-151)."""
    import dataclasses

    from smallk_tpu.engines import hierclust as hc

    A, _ = _planted_matrix(m=96, n=900, k=5, seed=4)
    opts = _clust_opts(5)

    # force every non-root solve to fail
    orig_solve = hc._Rank2Runner.solve
    calls = {"n": 0}

    def failing_solve(self, subset=None, w_parent=None, max_attempts=3):
        if subset is None:
            return orig_solve(self, subset, w_parent, max_attempts)
        calls["n"] += 1
        return hc._NodeSolve(None, None, None, -1.0, False)

    monkeypatch.setattr(hc._Rank2Runner, "solve", failing_solve)
    monkeypatch.setattr(hc, "PAIR_BATCHING", False)
    from smallk_tpu.engines import hier_chain

    monkeypatch.setattr(hier_chain, "CHAIN", False)

    with pytest.raises(RuntimeError):
        clust_hier(A, opts, Random(3))

    opts_leaf = dataclasses.replace(opts, on_node_failure="leaf")
    tree, stats = clust_hier(A, opts_leaf, Random(3))
    # both root children became permanent leaves; the run completed
    leaves = [q for q, lf in enumerate(tree.is_leaf) if lf]
    assert len(leaves) == 2
    assert all(tree.nodes[q].priority == -2.0 for q in leaves)
    assert (tree.assignments >= 0).all()


def test_chain_checkpoint_resume(monkeypatch, tmp_path):
    """Checkpointing now coexists with the chain (segment-granularity
    saves): interrupting mid-run and resuming reproduces the
    uninterrupted chain run exactly."""
    from smallk_tpu.engines import hier_chain
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

    A, _ = synthetic_term_doc_corpus(700, 1400, 10, seed=5)
    A = np.asarray(A.todense()).astype(np.float64)
    opts = _clust_opts(10)
    monkeypatch.setattr(hier_chain, "CHAIN", True)
    monkeypatch.setattr(hier_chain, "CHAIN_SEG", 4)

    ref_tree, ref_stats = clust_hier(A, opts, Random(21))

    ckpt = str(tmp_path / "chain.ckpt")
    calls = {"n": 0}
    orig = hier_chain.ChainDriver.run_segment

    def interrupting(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt("test interrupt")
        return orig(self, *a, **kw)

    monkeypatch.setattr(hier_chain.ChainDriver, "run_segment",
                        interrupting)
    with pytest.raises(KeyboardInterrupt):
        clust_hier(A, opts, Random(21), checkpoint_path=ckpt)
    monkeypatch.setattr(hier_chain.ChainDriver, "run_segment", orig)
    assert os.path.exists(ckpt)

    tree, stats = clust_hier(A, opts, Random(21), checkpoint_path=ckpt)
    np.testing.assert_array_equal(tree.assignments, ref_tree.assignments)
    assert [n.priority for n in tree.nodes] == \
        [n.priority for n in ref_tree.nodes]


class TestChunkGatherPath:
    """Sparse single-device fast path: per-node chunk-gathered subset
    operands (ops/ell_cols) instead of full-width masked solves
    (VERDICT r4 #2 / reference SubMatrixColsCompact scaling)."""

    def _sparse_setup(self, seed=1):
        from smallk_tpu.ops.ell import EllAOp

        A, labels = _planted_matrix(m=60, n=90, k=3, seed=seed,
                                    noise=0.0)
        A_sp = sp.csc_matrix(A)
        op = EllAOp.from_scipy(A_sp, dtype=np.float64)
        return A_sp, op, labels

    def _spy_gathers(self, monkeypatch):
        """Count chunk-gather plans (each chunk-tier solve/pair builds
        one per subset) — proves the fast path actually engaged.  Also
        shrink the bucket floor so the tiny test corpus is eligible."""
        import smallk_tpu.engines.hierclust as hc
        from smallk_tpu.ops.ell_cols import CscChunks

        monkeypatch.setattr(hc, "_MIN_BUCKET", 8)
        calls = []
        orig = CscChunks.gather_host

        def spy(self, subset, wc):
            calls.append(len(subset))
            return orig(self, subset, wc)

        monkeypatch.setattr(CscChunks, "gather_host", spy)
        return calls

    def test_chunk_path_engages_and_recovers(self, monkeypatch):
        from smallk_tpu.engines import hier_chain

        calls = self._spy_gathers(monkeypatch)
        A_sp, op, labels = self._sparse_setup()
        opts = _clust_opts(3)
        tree, stats = clust_hier(op, opts, Random(1), host_A=A_sp)
        a = tree.assignments
        assigned = a >= 0
        assert _purity(a[assigned], labels[assigned]) > 0.95
        # the chunk machinery actually ran: either sequential host-plan
        # gathers or (since the chain grew sparse support) chain commits
        assert len(calls) > 0 or hier_chain.LAST_STATS["committed"] > 0

    def test_chunk_matches_masked_path(self, monkeypatch):
        """The chunk-gathered and masked full-width formulations factor
        the same subsets from the same seeds.  Their f64 products differ
        only in summation order (~1e-16), which can flip exact ties on a
        noiseless corpus, so ties are broken with noise and agreement is
        required to be near-exact rather than bitwise."""
        from smallk_tpu.ops.ell import EllAOp

        calls = self._spy_gathers(monkeypatch)
        A, labels = _planted_matrix(m=60, n=90, k=3, seed=1, noise=0.01)
        A_sp = sp.csc_matrix(A)
        op = EllAOp.from_scipy(A_sp, dtype=np.float64)
        opts = _clust_opts(3)
        t1, _ = clust_hier(op, opts, Random(9), host_A=A_sp)   # chunks
        n_chunk_calls = len(calls)
        t2, _ = clust_hier(op, opts, Random(9))                # masked
        assert n_chunk_calls > 0 and len(calls) == n_chunk_calls
        agree = np.mean(t1.assignments == t2.assignments)
        assert agree >= 0.97, f"agreement {agree}"

    def test_runner_built_chunks(self, monkeypatch):
        """A sparse operand + scipy host_A must build the chunk table
        and route subset solves through it."""
        import smallk_tpu.engines.hierclust as hc
        from smallk_tpu.common.options import ClustStats
        from smallk_tpu.engines.hierclust import (
            _InitializerSource,
            _Rank2Runner,
        )

        monkeypatch.setattr(hc, "_MIN_BUCKET", 8)
        A_sp, op, labels = self._sparse_setup()
        opts = _clust_opts(3)
        rng = Random(3)
        inits = _InitializerSource(60, 90, rng, None, dtype=np.float64)
        r = _Rank2Runner(op, opts, inits, ClustStats(), np.float64,
                         host_A=A_sp)
        assert r._A_chunks is not None
        assert r._A_ext is None
        wc = r._chunk_bucket(np.arange(30))
        assert wc is not None and wc < r._A_chunks.C + 1
        res = r.solve(np.arange(30), w_parent=None)
        assert res.ok and res.left.shape == (30,)


class TestSparseChain:
    """Multi-split chain on SPARSE operands (VERDICT r4 #2): chunk-
    gathered subset solves inside the chain program, bit-identical to
    the sequential chunk path (both trace _solve_from_draw on
    identically-planned gathered operands)."""

    def _sparse_corpus(self, seed=5):
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
        from smallk_tpu.ops.ell import EllAOp

        A, _ = synthetic_term_doc_corpus(700, 1400, 10, seed=seed)
        A_sp = sp.csc_matrix(A).astype(np.float64)
        op = EllAOp.from_scipy(A_sp, dtype=np.float64)
        return A_sp, op

    def test_bit_identical_sparse(self, monkeypatch):
        from smallk_tpu.engines import hier_chain

        A_sp, op = self._sparse_corpus()
        opts = _clust_opts(10)

        monkeypatch.setattr(hier_chain, "CHAIN", False)
        ref_tree, ref_stats = clust_hier(op, opts, Random(21),
                                         host_A=A_sp)
        monkeypatch.setattr(hier_chain, "CHAIN", True)
        monkeypatch.setattr(hier_chain, "CHAIN_SEG", 32)
        tree, stats = clust_hier(op, opts, Random(21), host_A=A_sp)

        assert hier_chain.LAST_STATS["committed"] >= 5
        np.testing.assert_array_equal(tree.assignments,
                                      ref_tree.assignments)
        assert stats.nmf_count == ref_stats.nmf_count
        assert stats.iter_count == ref_stats.iter_count

    def test_sparse_chain_engages_without_dense(self, monkeypatch):
        """The chain must report segments on a sparse operand (no
        _A_ext) and produce a sane tree."""
        from smallk_tpu.engines import hier_chain

        A_sp, op = self._sparse_corpus(seed=7)
        opts = _clust_opts(8)
        monkeypatch.setattr(hier_chain, "CHAIN_SEG", 8)
        tree, stats = clust_hier(op, opts, Random(3), host_A=A_sp)
        assert hier_chain.LAST_STATS["segments"] >= 1
        assert hier_chain.LAST_STATS["committed"] >= 4
        leaves = sum(tree.is_leaf)
        assert leaves == 8


class TestBudgetSegmentedNodeSolve:
    """Watchdog-safe node solves (dispatch-budget environments): a
    full-width node solve estimated past the budget runs in segments
    with exact stopping-criterion parity — the tree must equal the
    un-budgeted run's."""

    def test_tree_parity_under_budget(self, monkeypatch):
        import smallk_tpu.engines.hierclust as hc
        from smallk_tpu.engines import hier_chain

        A, labels = _planted_matrix(m=60, n=90, k=3, seed=2, noise=0.01)
        opts = _clust_opts(3)

        monkeypatch.delenv("SMALLK_TPU_DISPATCH_BUDGET_S",
                           raising=False)
        monkeypatch.setattr(hier_chain, "CHAIN", False)
        t_ref, s_ref = clust_hier(A, opts, Random(21))

        # tiny budget + a forced estimate gate: every full-width solve
        # segments.  Initializer draw and pg0 carry are exact, so the
        # tree must match bitwise.
        monkeypatch.setenv("SMALLK_TPU_DISPATCH_BUDGET_S", "1e-9")
        t_seg, s_seg = clust_hier(A, opts, Random(21))
        np.testing.assert_array_equal(t_seg.assignments,
                                      t_ref.assignments)
        assert s_seg.nmf_count == s_ref.nmf_count

    def test_root_gate_engages(self, monkeypatch):
        """With a configured budget and a huge estimate the chain must
        bail the root to the host segmented path (and still build the
        same tree)."""
        from smallk_tpu.engines import hier_chain
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

        A, _ = synthetic_term_doc_corpus(700, 1400, 6, seed=5)
        A = np.asarray(A.todense()).astype(np.float64)
        opts = _clust_opts(6)
        monkeypatch.delenv("SMALLK_TPU_DISPATCH_BUDGET_S",
                           raising=False)
        monkeypatch.setattr(hier_chain, "CHAIN", True)
        t_ref, _ = clust_hier(A, opts, Random(21))
        assert hier_chain.LAST_STATS["committed"] > 0  # chain ran

        # budget chosen so the 150-iteration full-width root estimate
        # exceeds it (root gate fires) while the per-step width filter
        # keeps the narrow buckets (the chain still runs segments) —
        # both gates are model-based, so this is deterministic
        monkeypatch.setenv("SMALLK_TPU_DISPATCH_BUDGET_S", "0.02")
        t_b, _ = clust_hier(A, opts, Random(21))
        assert hier_chain.LAST_STATS["bails"] >= 1  # root gate fired
        np.testing.assert_array_equal(t_b.assignments,
                                      t_ref.assignments)
