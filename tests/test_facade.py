"""Facade API tests (reference: smallk namespace semantics +
examples/smallk_example.cpp flow)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import smallk_tpu as smallk
from smallk_tpu.io.delimited import load_delimited, write_delimited
from smallk_tpu.io.matrix_market import write_matrix_market


@pytest.fixture(autouse=True)
def fresh():
    smallk.Initialize()
    yield
    smallk.Finalize()


def test_version():
    assert smallk.GetVersionString() == smallk.__version__
    assert smallk.GetMajorVersion() >= 0


def test_defaults_match_reference():
    # reference defaults: smallk.hpp:102-311
    assert smallk.GetOutputPrecision() == 6
    assert smallk.GetNmfTolerance() == 0.005
    assert smallk.GetMaxIter() == 5000
    assert smallk.GetMinIter() == 5
    assert smallk.GetHierNmf2Tolerance() == 0.0001
    assert smallk.GetMaxTerms() == 5
    assert smallk.GetOutputFormat() == smallk.OutputFormat.JSON


def test_setters_validate():
    with pytest.raises(ValueError):
        smallk.SetNmfTolerance(0.0)
    with pytest.raises(ValueError):
        smallk.SetHierNmf2Tolerance(1.5)
    smallk.SetNmfTolerance(0.01)
    assert smallk.GetNmfTolerance() == 0.01
    smallk.Reset()
    assert smallk.GetNmfTolerance() == 0.005


def test_requires_initialize():
    smallk.Finalize()
    with pytest.raises(RuntimeError):
        smallk.LoadMatrix(matrix=np.ones((3, 3)))


def test_nmf_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    A = rng.rand(40, 30)
    path = str(tmp_path / "a.csv")
    write_delimited(path, A, 12)

    smallk.SetOutputDir(str(tmp_path))
    smallk.SeedRNG(42)
    smallk._state.dtype = "float64"
    smallk.LoadMatrix(path)
    assert smallk.IsMatrixLoaded()
    smallk.Nmf(5, smallk.Algorithm.BPP)

    W = smallk.LockedBufferW()
    H = smallk.LockedBufferH()
    assert W.shape == (40, 5) and H.shape == (5, 30)
    # output files written
    W2 = load_delimited(str(tmp_path / "w.csv"))
    assert W2.shape == (40, 5)
    rel = np.linalg.norm(A - W @ H) / np.linalg.norm(A)
    assert rel < 0.5


def test_nmf_mu_forced_delta(tmp_path):
    """MU must run with DELTA_FNORM stopping (smallk.cpp:574-582) —
    exercised by simply running MU through the facade."""
    rng = np.random.RandomState(1)
    smallk.SetOutputDir(str(tmp_path))
    smallk._state.dtype = "float64"
    smallk.SeedRNG(7)
    smallk.LoadMatrix(matrix=rng.rand(20, 16))
    smallk.SetMaxIter(200)
    smallk.Nmf(3, smallk.Algorithm.MU)
    assert smallk.LockedBufferW().shape == (20, 3)


def test_hiernmf2_with_flat(tmp_path):
    rng = np.random.RandomState(2)
    A = sp.random(60, 50, density=0.2, random_state=rng, format="csc")
    A.data = np.ceil(A.data * 5)
    mtx = str(tmp_path / "a.mtx")
    write_matrix_market(mtx, A)

    smallk.SetOutputDir(str(tmp_path))
    smallk._state.dtype = "float64"
    smallk.SeedRNG(11)
    smallk.LoadMatrix(mtx)
    smallk.LoadDictionary([f"t{i}" for i in range(60)])
    smallk.SetOutputFormat(smallk.OutputFormat.JSON)
    smallk.HierNmf2WithFlat(4)

    assert os.path.exists(str(tmp_path / "assignments_4.csv"))
    assert os.path.exists(str(tmp_path / "tree_4.json"))
    assert os.path.exists(str(tmp_path / "assignments_flat_4.csv"))
    assert os.path.exists(str(tmp_path / "clusters_4.json"))


def test_load_matrix_buffer_forms():
    # dense column-major buffer
    buf = np.arange(12, dtype=np.float64)  # 3x4 col-major
    smallk.LoadMatrix(buf, 3, 3, 4)
    A = smallk._state.matrix
    assert A.shape == (3, 4)
    assert A[0, 1] == 3.0  # second column starts at offset 3

    # CSC buffers
    data = [1.0, 2.0]
    rows = [0, 2]
    cols = [0, 1, 2]
    smallk.LoadMatrix(3, 2, 2, data, rows, cols)
    S = smallk._state.matrix
    assert S.shape == (3, 2) and S[0, 0] == 1.0 and S[2, 1] == 2.0


def test_compile_cache_opt_in(tmp_path):
    """SMALLK_TPU_COMPILE_CACHE=<dir> persists compiled programs.

    Subprocess: the facade reads the env var at import, before jax's
    first backend use (too late in this already-initialized process).
    """
    import subprocess
    import sys

    cache = tmp_path / "xla_cache"
    cache.mkdir()
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "import smallk_tpu\n"
        "from smallk_tpu.common.options import NmfAlgorithm, NmfOptions\n"
        "from smallk_tpu.ops.aop import as_aop\n"
        "from smallk_tpu.solvers.solve import nmf_solve\n"
        "import jax.numpy as jnp\n"
        "rs = np.random.RandomState(0)\n"
        "op = as_aop(rs.rand(32, 24).astype(np.float32))\n"
        "o = NmfOptions(algorithm=NmfAlgorithm.HALS, height=32, width=24,\n"
        "               k=4, max_iter=5, min_iter=1, verbose=False)\n"
        "r = nmf_solve(op, jnp.asarray(rs.rand(32, 4), jnp.float32),\n"
        "              jnp.asarray(rs.rand(4, 24), jnp.float32), o)\n"
        "r.W.block_until_ready()\n"
    )
    env = dict(os.environ, SMALLK_TPU_COMPILE_CACHE=str(cache))
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=300)
    assert any(cache.iterdir()), "no cache entries written"
