"""Flatclust and preprocessor engine tests."""

import json
import os

import numpy as np
import pytest
import scipy.sparse as sp

from smallk_tpu.common.options import (
    NmfAlgorithm,
    NmfOptions,
    OutputFormat,
)
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.engines.flatclust import run_flatclust, write_flatclust_results
from smallk_tpu.engines.preprocess import preprocess_tf


class TestFlatclust:
    def _run(self, alg=NmfAlgorithm.HALS, k=5):
        rng = np.random.RandomState(0)
        m, n = 50, 64
        A = rng.rand(m, n)
        W0 = random_matrix(m, k, Random(1))
        H0 = random_matrix(k, n, Random(2))
        opts = NmfOptions(
            tol=1e-3, algorithm=alg, height=m, width=n, k=k,
            min_iter=5, max_iter=500, verbose=False, dtype="float64",
        )
        return run_flatclust(A, W0, H0, opts)

    def test_hals(self):
        W, H, assignments, fuzzy, ok = self._run()
        assert ok
        assert assignments.shape == (64,)
        assert set(np.unique(assignments)).issubset(set(range(5)))
        # fuzzy probabilities sum to 1 per doc
        np.testing.assert_allclose(fuzzy.sum(axis=0), 1.0, atol=1e-5)

    def test_bpp(self):
        W, H, assignments, fuzzy, ok = self._run(NmfAlgorithm.BPP)
        assert ok

    def test_mu_rejected(self):
        with pytest.raises(ValueError):
            self._run(NmfAlgorithm.MU)

    def test_write_results(self, tmp_path):
        W, H, assignments, fuzzy, ok = self._run(k=5)
        dictionary = [f"term{i}" for i in range(50)]
        apath, fpath, rpath = write_flatclust_results(
            str(tmp_path), assignments, fuzzy, W, dictionary,
            maxterms=5, fmt=OutputFormat.JSON, num_clusters=5,
        )
        assert os.path.exists(apath) and os.path.exists(fpath)
        data = json.loads(open(rpath).read())
        assert data["doc_count"] == 64
        assert len(data["nodes"]) == 5
        # fuzzy file: one line per doc, k values each
        lines = open(fpath).read().strip().splitlines()
        assert len(lines) == 64
        assert len(lines[0].split(",")) == 5

        # XML variant
        _, _, xpath = write_flatclust_results(
            str(tmp_path), assignments, fuzzy, W, dictionary,
            maxterms=5, fmt=OutputFormat.XML, num_clusters=5,
        )
        assert "<DataSet" in open(xpath).read()


class TestPreprocessor:
    def _toy(self):
        # 6 terms x 8 docs with known prunable structure
        rows = []
        cols = []
        vals = []

        def add(r, c, v):
            rows.append(r); cols.append(c); vals.append(v)

        # term 0: frequent (every doc) -> pruned by df == width rule
        for c in range(8):
            add(0, c, 5)
        # terms 1-4: normal occupancy
        for r in range(1, 5):
            for c in range(8):
                if (r + c) % 2 == 0:
                    add(r, c, r + 1)
        # term 5: rare (1 occurrence, count 1) -> pruned by docs_per_term=3
        add(5, 0, 1)
        return sp.csc_matrix(
            (vals, (rows, cols)), shape=(6, 8), dtype=np.float64
        )

    def test_prunes_rows(self):
        A = self._toy()
        res = preprocess_tf(A, docs_per_term=3, terms_per_doc=1,
                            verbose=False)
        # term 0 (in all docs) and term 5 (count 1) pruned
        assert 0 not in res.term_indices
        assert 5 not in res.term_indices

    def test_prunes_cols(self):
        rng = np.random.RandomState(0)
        A = sp.random(40, 30, density=0.3, random_state=rng, format="csc")
        A.data = np.ceil(A.data * 5)
        res = preprocess_tf(A, docs_per_term=1, terms_per_doc=10,
                            verbose=False)
        # every surviving column has >= 10 nonzeros
        assert (np.diff(res.tf_matrix.indptr) >= 10).all()
        assert len(res.doc_indices) == res.matrix.shape[1]

    def test_dedup_keeps_max_index(self):
        # two identical columns (1 and 5): survivor must be column 5
        A = np.zeros((10, 6))
        rng = np.random.RandomState(1)
        for c in range(6):
            A[rng.choice(10, 6, replace=False), c] = 1 + rng.randint(1, 4, 6)
        A[:, 5] = A[:, 1]
        res = preprocess_tf(sp.csc_matrix(A), docs_per_term=1,
                            terms_per_doc=1, verbose=False)
        assert 5 in res.doc_indices
        assert 1 not in res.doc_indices

    def test_tfidf_normalized(self):
        rng = np.random.RandomState(2)
        A = sp.random(50, 40, density=0.3, random_state=rng, format="csc")
        A.data = np.ceil(A.data * 9)
        res = preprocess_tf(A, docs_per_term=2, terms_per_doc=3,
                            verbose=False)
        norms = np.sqrt(
            np.asarray(res.matrix.power(2).sum(axis=0)).ravel()
        )
        np.testing.assert_allclose(norms, 1.0, atol=1e-12)

    def test_tfidf_formula(self):
        # hand-check one entry: score = (1+log(count)) * log(n/df)
        A = self._toy()
        res = preprocess_tf(A, docs_per_term=3, terms_per_doc=1,
                            verbose=False)
        M = res.tf_matrix
        n = M.shape[1]
        df = np.bincount(M.indices, minlength=M.shape[0])
        r, c = M.indices[0], 0
        raw = (1 + np.log(M.data[0])) * np.log(n / df[r])
        # normalize by the column norm of raw scores
        col = M[:, 0]
        raws = (1 + np.log(col.data)) * np.log(n / df[col.indices])
        expected = raw / np.linalg.norm(raws)
        np.testing.assert_allclose(res.matrix[r, c], expected, rtol=1e-12)

    def test_boolean_mode(self):
        rng = np.random.RandomState(4)
        A = sp.random(30, 20, density=0.4, random_state=rng, format="csc")
        A.data = np.ceil(A.data * 9)
        res = preprocess_tf(A, docs_per_term=2, terms_per_doc=2,
                            boolean_mode=True, verbose=False)
        assert (res.tf_matrix.data == 1).all()

    def test_all_cols_pruned_raises(self):
        A = sp.csc_matrix(np.ones((4, 4)))
        with pytest.raises(ValueError):
            preprocess_tf(A, docs_per_term=1, terms_per_doc=100,
                          verbose=False)

    def test_20news_shape_performance(self):
        """Roughly 20news-sized synthetic corpus completes quickly."""
        import time

        rng = np.random.RandomState(3)
        m, n = 39771, 11237
        nnz = 877_453
        rows = rng.randint(0, m, nnz)
        cols = rng.randint(0, n, nnz)
        vals = rng.randint(1, 20, nnz).astype(np.float64)
        A = sp.csc_matrix((vals, (rows, cols)), shape=(m, n))
        t0 = time.time()
        res = preprocess_tf(A, docs_per_term=3, terms_per_doc=5,
                            verbose=False)
        elapsed = time.time() - t0
        assert res.matrix.shape[0] > 0
        # reference does this in 63 ms in C++; allow generous Python budget
        assert elapsed < 30.0


class TestSyntheticCorpus:
    """engines/corpus.py: the reuters-statistics benchmark corpus."""

    def test_statistics_and_determinism(self):
        import scipy.sparse as sp

        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

        A, labels = synthetic_term_doc_corpus(800, 600, 8, seed=4,
                                              mean_doc_len=40)
        assert sp.issparse(A) and A.shape == (800, 600)
        assert labels.shape == (600,) and labels.max() < 8
        # tf-idf unit-L2 columns (nonempty docs)
        norms = np.sqrt(np.asarray(A.multiply(A).sum(axis=0))).ravel()
        nonempty = np.asarray((A != 0).sum(axis=0)).ravel() > 0
        np.testing.assert_allclose(norms[nonempty], 1.0, rtol=1e-5)
        assert (A.data >= 0).all()

        A2, labels2 = synthetic_term_doc_corpus(800, 600, 8, seed=4,
                                                mean_doc_len=40)
        assert (A != A2).nnz == 0
        np.testing.assert_array_equal(labels, labels2)

    def test_hierclust_recovers_planted_clusters(self):
        from smallk_tpu.common.options import (
            ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
        )
        from smallk_tpu.engines.corpus import synthetic_term_doc_corpus
        from smallk_tpu.engines.hierclust import clust_hier
        from smallk_tpu.engines.scoring import score_clustering

        A, labels = synthetic_term_doc_corpus(600, 400, 4, seed=7,
                                              mean_doc_len=40)
        opts = ClustOptions(
            nmf_opts=NmfOptions(
                tol=1e-4, algorithm=NmfAlgorithm.RANK2,
                prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
                min_iter=1, max_iter=2000, verbose=False, dtype="float64",
            ),
            num_clusters=4, verbose=False,
        )
        tree, _ = clust_hier(A.astype(np.float64), opts, Random(1))
        report = score_clustering(tree.assignments, labels)
        assert report["nmi"] > 0.6
