"""pysmallk-parity API tests (reference: pysmallk/tests/*.py drivers)."""

import numpy as np
import pytest
import scipy.sparse as sp

from smallk_tpu.api import (
    Flatclust,
    Hierclust,
    Matrixgen,
    Preprocessor,
    SmallkAPI,
)


def test_smallkapi_nmf(tmp_path):
    api = SmallkAPI()
    rng = np.random.RandomState(0)
    api.load_matrix(matrix=rng.rand(30, 24))
    assert api.is_matrix_loaded()
    api.nmf(4, "BPP", outdir=str(tmp_path))
    W, H = api.get_W(), api.get_H()
    assert W.shape == (30, 4) and H.shape == (4, 24)
    assert api.get_version_string()
    api.finalize()


def test_smallkapi_scipy_sparse(tmp_path):
    api = SmallkAPI()
    rng = np.random.RandomState(1)
    A = sp.random(40, 30, density=0.3, random_state=rng, format="csr")
    api.load_matrix(matrix=A)
    api.nmf(3, "HALS", outdir=str(tmp_path), tol=0.01)
    assert api.get_W().shape == (40, 3)
    api.finalize()


def test_flatclust_class(tmp_path):
    fc = Flatclust()
    fc.seed(5)
    rng = np.random.RandomState(2)
    fc.load_matrix(matrix=rng.rand(40, 32))
    fc.load_dictionary(dictionary=[f"t{i}" for i in range(40)])
    ok = fc.cluster(4, algorithm="HALS", verbose=False, tol=0.001,
                    dtype="float64")
    assert ok
    assert fc.get_assignments().shape == (32,)
    terms = fc.get_top_terms()
    assert len(terms) == 4 * 5
    fc.write_output(outdir=str(tmp_path), format="JSON")
    import os

    assert os.path.exists(str(tmp_path / "clusters_4.json"))


def test_hierclust_class(tmp_path):
    hc = Hierclust()
    hc.seed(7)
    rng = np.random.RandomState(3)
    A = sp.random(60, 50, density=0.25, random_state=rng, format="csc")
    A.data = np.ceil(A.data * 5)
    hc.load_matrix(matrix=A)
    hc.load_dictionary(dictionary=[f"t{i}" for i in range(60)])
    hc.cluster(4, verbose=False, flat=1, dtype="float64")
    assert hc.get_assignments().shape == (50,)
    assert hc.get_top_indices().shape == (5, 4)
    hc.write_output(outdir=str(tmp_path), format="XML")
    import os

    assert os.path.exists(str(tmp_path / "tree_4.xml"))
    assert os.path.exists(str(tmp_path / "assignments_flat_4.csv"))


def test_matrixgen_class(tmp_path):
    mg = Matrixgen()
    mg.seed(1)
    U = mg.uniform(10, 8)
    assert U.shape == (10, 8)
    assert mg.identity(4, 4).trace() == 4
    assert mg.ones(3, 3).sum() == 9
    assert mg.zeros(3, 3).sum() == 0
    S = mg.sparse(20, 10, 3)
    assert sp.issparse(S)
    mg.write_output(str(tmp_path / "m.mtx"), precision=6)


def test_preprocessor_class(tmp_path):
    pre = Preprocessor()
    rng = np.random.RandomState(4)
    A = sp.random(50, 40, density=0.3, random_state=rng, format="csc")
    A.data = np.ceil(A.data * 9)
    pre.load_matrix(matrix=A)
    pre.load_dictionary(dictionary=[f"t{i}" for i in range(50)])
    pre.load_documents(documents=[f"d{i}" for i in range(40)])
    pre.preprocess(docsperterm=2, termsperdoc=3)
    assert len(pre.get_reduced_dictionary()) == pre.result.matrix.shape[0]
    assert len(pre.get_reduced_documents()) == pre.result.matrix.shape[1]
    assert pre.get_reduced_scores().size == pre.result.matrix.nnz
    pre.write_output(
        str(tmp_path / "reduced_matrix.mtx"),
        str(tmp_path / "reduced_dictionary.txt"),
        str(tmp_path / "reduced_documents.txt"),
    )
    import os

    assert os.path.exists(str(tmp_path / "reduced_matrix.mtx"))
