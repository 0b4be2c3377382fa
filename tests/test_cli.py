"""CLI tool tests: the five reference tools driven through main(argv).

Mirrors the reference end-to-end shell scripts (tests/scripts/*.sh) with
numerical checks instead of byte-exact cmp (SURVEY.md §4).
"""

import json
import os

import numpy as np
import pytest
import scipy.sparse as sp

from smallk_tpu.cli.flatclust_cli import main as flatclust_main
from smallk_tpu.cli.hierclust_cli import main as hierclust_main
from smallk_tpu.cli.matrixgen_cli import main as matrixgen_main
from smallk_tpu.cli.nmf_cli import main as nmf_main
from smallk_tpu.cli.preprocessor_cli import main as preprocessor_main
from smallk_tpu.io.delimited import load_delimited
from smallk_tpu.io.matrix_market import load_matrix_market, write_matrix_market


def test_matrixgen_then_nmf(tmp_path):
    mat = str(tmp_path / "rnd.csv")
    assert matrixgen_main([
        "--height", "64", "--width", "48", "--filename", mat,
        "--seed", "42",
    ]) == 0
    A = load_delimited(mat)
    assert A.shape == (64, 48)

    wout = str(tmp_path / "w.csv")
    hout = str(tmp_path / "h.csv")
    assert nmf_main([
        "--matrixfile", mat, "--k", "6", "--algorithm", "HALS",
        "--tol", "0.001", "--outfile_W", wout, "--outfile_H", hout,
        "--seed", "1", "--verbose", "0", "--dtype", "float64",
    ]) == 0
    W = load_delimited(wout)
    H = load_delimited(hout)
    assert W.shape == (64, 6) and H.shape == (6, 48)
    rel = np.linalg.norm(A - W @ H) / np.linalg.norm(A)
    assert rel < 0.5


def test_nmf_fixed_init_deterministic(tmp_path):
    mat = str(tmp_path / "rnd.csv")
    matrixgen_main(["--height", "30", "--width", "20", "--filename", mat,
                    "--seed", "7"])
    winit = str(tmp_path / "winit.csv")
    hinit = str(tmp_path / "hinit.csv")
    matrixgen_main(["--height", "30", "--width", "4", "--filename", winit,
                    "--seed", "8", "--precision", "15"])
    matrixgen_main(["--height", "4", "--width", "20", "--filename", hinit,
                    "--seed", "9", "--precision", "15"])

    outs = []
    for i in range(2):
        wout = str(tmp_path / f"w{i}.csv")
        assert nmf_main([
            "--matrixfile", mat, "--k", "4", "--infile_W", winit,
            "--infile_H", hinit, "--outfile_W", wout,
            "--outfile_H", str(tmp_path / f"h{i}.csv"),
            "--verbose", "0", "--dtype", "float64",
        ]) == 0
        outs.append(load_delimited(wout))
    np.testing.assert_array_equal(outs[0], outs[1])


@pytest.fixture
def corpus(tmp_path):
    """Synthetic sparse term-doc corpus on disk."""
    rng = np.random.RandomState(0)
    m, n = 120, 90
    A = sp.random(m, n, density=0.15, random_state=rng, format="csc")
    A.data = np.ceil(A.data * 9)
    mtx = str(tmp_path / "corpus.mtx")
    write_matrix_market(mtx, A)
    dic = str(tmp_path / "dict.txt")
    with open(dic, "w") as f:
        for i in range(m):
            f.write(f"term{i}\n")
    return mtx, dic, tmp_path


def test_hierclust_cli(corpus):
    mtx, dic, tmp_path = corpus
    outdir = str(tmp_path)
    assert hierclust_main([
        "--matrixfile", mtx, "--dictfile", dic, "--clusters", "5",
        "--outdir", outdir, "--format", "JSON", "--verbose", "0",
        "--seed", "3", "--flat", "1", "--dtype", "float64",
    ]) == 0
    tree = json.load(open(os.path.join(outdir, "tree_5.json")))
    assert len(tree["nodes"]) == 8  # 2*(5-1)
    assign = open(os.path.join(outdir, "assignments_5.csv")).readline()
    assert len(assign.strip().split(",")) == 90
    # flat outputs
    assert os.path.exists(os.path.join(outdir, "assignments_flat_5.csv"))
    assert os.path.exists(os.path.join(outdir, "assignments_fuzzy_5.csv"))
    assert os.path.exists(os.path.join(outdir, "clusters_5.json"))


def test_flatclust_cli(corpus):
    mtx, dic, tmp_path = corpus
    outdir = str(tmp_path)
    assert flatclust_main([
        "--matrixfile", mtx, "--dictfile", dic, "--clusters", "4",
        "--algorithm", "HALS", "--outdir", outdir, "--format", "XML",
        "--verbose", "0", "--seed", "5", "--dtype", "float64",
        "--tol", "0.001",
    ]) == 0
    xml = open(os.path.join(outdir, "clusters_4.xml")).read()
    assert "<DataSet" in xml and "term" in xml
    assign = open(os.path.join(outdir, "assignments_4.csv")).readline()
    assert len(assign.strip().split(",")) == 90


def test_preprocessor_cli(tmp_path):
    rng = np.random.RandomState(1)
    m, n = 80, 60
    A = sp.random(m, n, density=0.25, random_state=rng, format="csc")
    A.data = np.ceil(A.data * 9)
    indir = tmp_path / "in"
    indir.mkdir()
    write_matrix_market(str(indir / "matrix.mtx"), A)
    with open(indir / "dictionary.txt", "w") as f:
        for i in range(m):
            f.write(f"term{i}\n")
    with open(indir / "documents.txt", "w") as f:
        for i in range(n):
            f.write(f"doc{i}\n")
    outdir = tmp_path / "out"
    outdir.mkdir()
    assert preprocessor_main([
        "--indir", str(indir), "--outdir", str(outdir),
        "--docs_per_term", "2", "--terms_per_doc", "3",
    ]) == 0
    R = load_matrix_market(str(outdir / "reduced_matrix.mtx"))
    terms = open(outdir / "reduced_dictionary.txt").read().splitlines()
    docs = open(outdir / "reduced_documents.txt").read().splitlines()
    assert R.shape == (len(terms), len(docs))
    # tf-idf columns are unit norm
    norms = np.sqrt(np.asarray(R.power(2).sum(axis=0)).ravel())
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)  # file precision 4


def test_hierclust_cli_new_flags(corpus):
    """--checkpoint / --restarts / --priority / --graph / Result exit
    codes (VERDICT r3 #6/#10)."""
    mtx, dic, tmp_path = corpus
    outdir = str(tmp_path / "o1")
    os.makedirs(outdir, exist_ok=True)
    ckpt = str(tmp_path / "run.ckpt")
    args = [
        "--matrixfile", mtx, "--dictfile", dic, "--clusters", "4",
        "--outdir", outdir, "--verbose", "0", "--seed", "3",
        "--dtype", "float64", "--checkpoint", ckpt,
        "--restarts", "2", "--priority", "size_ndcg",
    ]
    assert hierclust_main(args) == 0
    assert os.path.exists(ckpt)
    a1 = open(os.path.join(outdir, "assignments_4.csv")).read()

    # checkpoint round trip: a second run resumes from the completed
    # checkpoint and must reproduce the same assignments
    outdir2 = str(tmp_path / "o2")
    os.makedirs(outdir2, exist_ok=True)
    args2 = list(args)
    args2[args2.index(outdir)] = outdir2
    assert hierclust_main(args2) == 0
    a2 = open(os.path.join(outdir2, "assignments_4.csv")).read()
    assert a1 == a2


def test_hierclust_cli_graph_preset(tmp_path):
    """--graph normalizes the adjacency and applies the graph presets."""
    from smallk_tpu.engines.corpus import planted_partition_graph

    G, labels = planted_partition_graph(300, 4, seed=5)
    mtx = str(tmp_path / "graph.mtx")
    write_matrix_market(mtx, G)
    dic = str(tmp_path / "nodes.txt")
    with open(dic, "w") as f:
        for i in range(G.shape[0]):
            f.write(f"node{i}\n")
    outdir = str(tmp_path)
    assert hierclust_main([
        "--matrixfile", mtx, "--dictfile", dic, "--clusters", "4",
        "--outdir", outdir, "--verbose", "0", "--seed", "3",
        "--dtype", "float64", "--graph",
    ]) == 0
    assign = np.array(
        open(os.path.join(outdir, "assignments_4.csv")).readline()
        .strip().split(","), dtype=np.int64)
    assert assign.shape[0] == 300
    # the planted 4-community graph must be mostly recovered
    from smallk_tpu.engines.scoring import score_clustering

    assert score_clustering(assign, labels)["nmi"] > 0.6


def test_cli_result_exit_codes(tmp_path):
    """entry() maps errors onto the reference's Result codes
    (common/include/nmf.hpp:17-26)."""
    from smallk_tpu.cli.hierclust_cli import entry as hier_entry
    from smallk_tpu.common.options import Result

    # missing input file -> BAD_PARAM
    rc = hier_entry([
        "--matrixfile", str(tmp_path / "missing.mtx"),
        "--dictfile", str(tmp_path / "missing.txt"),
        "--clusters", "4",
    ])
    assert rc == int(Result.BAD_PARAM)
    # argparse usage error (missing required flag) -> BAD_PARAM
    assert hier_entry(["--clusters", "4"]) == int(Result.BAD_PARAM)
    # --help -> OK
    assert hier_entry(["--help"]) == int(Result.OK)


def test_compile_cache_flag(tmp_path, monkeypatch):
    """--compile-cache DIR persists compiled programs (all five tools
    accept it; exercised through matrixgen, the cheapest).  The env var
    and the process-global jax cache config are restored afterwards so
    later tests see no order-dependent side effects."""
    import os

    import jax

    from smallk_tpu.cli.matrixgen_cli import main as mg_main

    monkeypatch.delenv("SMALLK_TPU_COMPILE_CACHE", raising=False)
    prev_cache_dir = jax.config.jax_compilation_cache_dir
    cache = tmp_path / "cache"
    cache.mkdir()
    out = tmp_path / "m.csv"
    try:
        rc = mg_main(["--height", "8", "--width", "6",
                      "--filename", str(out),
                      "--type", "UNIFORM", "--compile-cache", str(cache)])
        assert rc in (0, None)
        assert out.exists()
        assert os.environ.get("SMALLK_TPU_COMPILE_CACHE") == str(cache)
    finally:
        os.environ.pop("SMALLK_TPU_COMPILE_CACHE", None)
        jax.config.update("jax_compilation_cache_dir", prev_cache_dir)
