"""Opt-in real-corpus golden harness (VERDICT r3 missing #2).

Mirrors the reference's acceptance tier — fixture runs on the real
reuters / 20news corpora with fixed initializers
(/root/reference/tests/scripts/test_smallk.sh:24-237) — as a skippable
pytest module: set SMALLK_DATA=/path/to/smallk_data (the xdata
smallk_data checkout, with its test/ golden folder) to activate.

The reference compares outputs byte-for-byte against goldens produced
by its own binary; this framework computes in different (TPU-shaped)
arithmetic, so the comparisons here are tolerance-based structural
metrics: factor matrices within a relative-Frobenius budget,
reconstruction error no worse than the golden's, assignments in
near-total agreement, tree topology equal.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

DATA = os.environ.get("SMALLK_DATA", "")

pytestmark = pytest.mark.skipif(
    not (DATA and os.path.isdir(DATA)),
    reason="SMALLK_DATA not set (real-corpus goldens unavailable)",
)


def _path(*parts):
    return os.path.join(DATA, *parts)


def _load_csv(path):
    from smallk_tpu.io.delimited import load_delimited

    return np.asarray(load_delimited(path, dtype=np.float64))


def _load_mtx(path):
    from smallk_tpu.io.matrix_market import load_matrix_market

    return load_matrix_market(path)


def _rel_fro(X, Y):
    return float(np.linalg.norm(X - Y) / max(np.linalg.norm(Y), 1e-30))


class TestNmfGolden:
    """nmf --matrixfile reuters.mtx --algorithm BPP --k 8
    --infile_W nmf_init_w.csv --infile_H nmf_init_h.csv --miniter 1
    vs test/nmf_result_w.csv / nmf_result_h.csv (~22 iterations)."""

    def test_bpp_k8_reuters(self):
        import jax.numpy as jnp

        from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
        from smallk_tpu.ops.aop import as_aop
        from smallk_tpu.solvers.solve import nmf_solve

        A = _load_mtx(_path("reuters.mtx"))
        W0 = _load_csv(_path("nmf_init_w.csv"))
        H0 = _load_csv(_path("nmf_init_h.csv"))
        m, n = A.shape
        opts = NmfOptions(
            tol=0.005, algorithm=NmfAlgorithm.BPP, height=m, width=n,
            k=8, min_iter=1, max_iter=5000, verbose=False,
            dtype="float64",
        )
        res = nmf_solve(as_aop(A, dtype=jnp.float64),
                        jnp.asarray(W0), jnp.asarray(H0), opts)
        assert bool(res.success)
        W = np.asarray(res.W)
        H = np.asarray(res.H)
        Wg = _load_csv(_path("test", "nmf_result_w.csv"))
        Hg = _load_csv(_path("test", "nmf_result_h.csv"))
        # same init + same update rule => same basin; small drift only
        assert _rel_fro(W, Wg) < 0.05
        assert _rel_fro(H, Hg) < 0.05
        # reconstruction no worse than the golden's
        Ad = np.asarray(A.todense())
        err = np.linalg.norm(Ad - W @ H)
        err_g = np.linalg.norm(Ad - Wg @ Hg)
        assert err <= err_g * 1.001


class TestPreprocessorGolden:
    """preprocess_tf --indir $DATA vs test/reduced_*_20news goldens."""

    def test_reduced_matrix(self, tmp_path):
        from smallk_tpu.cli.preprocessor_cli import main as pp_main

        rc = pp_main([
            "--indir", DATA, "--outdir", str(tmp_path),
        ])
        assert rc == 0
        got = _load_mtx(str(tmp_path / "reduced_matrix.mtx"))
        want = _load_mtx(_path("test", "reduced_matrix_20news.mtx"))
        assert got.shape == want.shape
        assert got.nnz == want.nnz
        d = got.tocsc() - want.tocsc()
        # file precision is 4 digits; allow last-digit rounding
        assert abs(d).max() < 2e-4
        for name, golden in (
            ("reduced_dictionary.txt", "reduced_dictionary_20news.txt"),
            ("reduced_documents.txt", "reduced_documents_20news.txt"),
        ):
            with open(tmp_path / name) as f:
                got_lines = f.read().splitlines()
            with open(_path("test", golden)) as f:
                want_lines = f.read().splitlines()
            assert got_lines == want_lines


def _run_hierclust_golden(matrix, dictfile, clusters, initdir,
                          golden_assign, tmp_path):
    from smallk_tpu.cli.hierclust_cli import main as hc_main

    rc = hc_main([
        "--matrixfile", _path(matrix),
        "--dictfile", _path(dictfile),
        "--clusters", str(clusters),
        "--initdir", _path("test", initdir),
        "--miniter", "1",
        "--dtype", "float64",
        "--outdir", str(tmp_path),
        "--verbose", "0",
    ])
    assert rc == 0
    got = np.loadtxt(tmp_path / f"assignments_{clusters}.csv",
                     delimiter=",", dtype=np.int64)
    want = np.loadtxt(_path("test", golden_assign), delimiter=",",
                      dtype=np.int64)
    assert got.shape == want.shape
    agreement = float((got == want).mean())
    # pinned initializers => identical tree up to f.p. boundary flips
    assert agreement >= 0.99, f"assignment agreement {agreement:.4f}"


class TestHierclustGolden:
    def test_reuters_12(self, tmp_path):
        _run_hierclust_golden(
            "reuters.mtx", "reuters_dictionary.txt", 12,
            "matrices.reuters", "reuters_assignments_12.csv", tmp_path,
        )

    def test_news20_15(self, tmp_path):
        _run_hierclust_golden(
            "news20.mtx", "news20_dictionary.txt", 15,
            "matrices.20news", "news20_assignments_15.csv", tmp_path,
        )


class TestFlatclustGolden:
    """flatclust HALS k=16 on rnd_256_256.csv with fixed W/H inits."""

    def test_rnd_256(self, tmp_path):
        from smallk_tpu.cli.flatclust_cli import main as fc_main

        rc = fc_main([
            "--matrixfile", _path("rnd_256_256.csv"),
            "--dictfile", _path("reuters_dictionary.txt"),
            "--clusters", "16",
            "--infile_W", _path("flatclust_init_w.csv"),
            "--infile_H", _path("flatclust_init_h.csv"),
            "--miniter", "1", "--maxiter", "5000",
            "--algorithm", "HALS",
            "--dtype", "float64",
            "--outdir", str(tmp_path),
            "--verbose", "0",
        ])
        assert rc == 0
        got = np.loadtxt(tmp_path / "assignments_16.csv", delimiter=",",
                         dtype=np.int64)
        want = np.loadtxt(_path("test", "flatclust_rnd_assignments_16.csv"),
                          delimiter=",", dtype=np.int64)
        assert got.shape == want.shape
        assert float((got == want).mean()) >= 0.99
