"""Operand-layer tests: sparse/dense/masked/ELL product equivalence.

Reference model: TestSparseGemm (tests/src/test_sparse_gemm.cpp) — all
sparse GEMM variants vs a dense reference over random shapes/sparsities.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from smallk_tpu.engines.embeddings import NmfEmbeddings
from smallk_tpu.ops.aop import DenseAOp, MaskedAOp, SparseAOp, as_aop
from smallk_tpu.ops.ell import EllAOp

DTYPE = jnp.float64


def _random_problem(m, n, k, density, seed):
    rng = np.random.RandomState(seed)
    A = sp.random(m, n, density=density, random_state=rng, format="csc")
    W = rng.rand(m, k)
    H = rng.rand(k, n)
    return A, W, H


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize(
    "m,n,k,density",
    [(40, 30, 4, 0.1), (100, 80, 8, 0.02), (17, 65, 3, 0.3),
     (64, 64, 2, 0.05)],
)
def test_sparse_matches_dense(m, n, k, density, seed):
    A, W, H = _random_problem(m, n, k, density, seed)
    Wd, Hd = jnp.asarray(W), jnp.asarray(H)
    dense = DenseAOp(jnp.asarray(A.toarray()))
    sparse = SparseAOp.from_scipy(A, dtype=DTYPE)
    ell = EllAOp.from_scipy(A, dtype=DTYPE)

    ref_tn = np.asarray(dense.mm_tn(Wd))
    ref_nt = np.asarray(dense.mm_nt(Hd))
    for op in (sparse, ell):
        np.testing.assert_allclose(np.asarray(op.mm_tn(Wd)), ref_tn,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.mm_nt(Hd)), ref_nt,
                                   rtol=1e-10, atol=1e-12)


def test_empty_rows_and_cols():
    # matrix with some all-zero rows and columns
    A = sp.csc_matrix(
        (np.array([1.0, 2.0, 3.0]),
         (np.array([1, 3, 1]), np.array([0, 0, 2]))),
        shape=(5, 4),
    )
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.rand(5, 3))
    H = jnp.asarray(rng.rand(3, 4))
    dense = DenseAOp(jnp.asarray(A.toarray()))
    for op in (SparseAOp.from_scipy(A, DTYPE), EllAOp.from_scipy(A, DTYPE)):
        np.testing.assert_allclose(
            np.asarray(op.mm_tn(W)), np.asarray(dense.mm_tn(W)), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(op.mm_nt(H)), np.asarray(dense.mm_nt(H)), atol=1e-12
        )


def test_masked_equals_zeroed_columns():
    A, W, H = _random_problem(30, 20, 4, 0.2, 7)
    mask_np = (np.random.RandomState(1).rand(20) > 0.5).astype(np.float64)
    base = DenseAOp(jnp.asarray(A.toarray()))
    masked = MaskedAOp(base, jnp.asarray(mask_np))
    zeroed = DenseAOp(jnp.asarray(A.toarray() * mask_np[None, :]))
    Wd, Hd = jnp.asarray(W), jnp.asarray(H)
    np.testing.assert_allclose(
        np.asarray(masked.mm_tn(Wd)), np.asarray(zeroed.mm_tn(Wd)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(masked.mm_nt(Hd)), np.asarray(zeroed.mm_nt(Hd)),
        atol=1e-12,
    )


def test_as_aop_densify_scatter_matches():
    A, _, _ = _random_problem(25, 18, 3, 0.15, 3)
    # duplicate entries: scatter-add must sum them like triplet compress
    coo = A.tocoo()
    dup = sp.coo_matrix(
        (np.concatenate([coo.data, coo.data[:5]]),
         (np.concatenate([coo.row, coo.row[:5]]),
          np.concatenate([coo.col, coo.col[:5]]))),
        shape=A.shape,
    )
    op = as_aop(dup, dtype=DTYPE)
    assert isinstance(op, DenseAOp)
    np.testing.assert_allclose(
        np.asarray(op.A), dup.tocsc().toarray(), atol=1e-12
    )


@pytest.mark.parametrize("blocks", [dict(doc_block=0, term_block=0),
                                    dict(doc_block=16, term_block=16)])
def test_ell_in_solver(blocks):
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.solvers.solve import nmf_solve

    A, _, _ = _random_problem(60, 48, 4, 0.1, 9)
    W0 = jnp.asarray(random_matrix(60, 4, Random(1)))
    H0 = jnp.asarray(random_matrix(4, 48, Random(2)))
    opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.BPP, height=60, width=48, k=4,
        min_iter=2, max_iter=50, verbose=False, dtype="float64",
    )
    ref = nmf_solve(DenseAOp(jnp.asarray(A.toarray())), W0, H0, opts)
    out = nmf_solve(EllAOp.from_scipy(A, DTYPE, **blocks), W0, H0, opts)
    assert int(out.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(out.W), np.asarray(ref.W),
                               rtol=1e-8, atol=1e-10)


def test_embeddings_retrieval():
    rng = np.random.RandomState(0)
    W = rng.rand(50, 4)
    H = rng.rand(4, 30)
    emb = NmfEmbeddings(W, H)

    idx, vals = emb.top_docs_for_topic(2, k=5)
    assert len(idx) == 5
    # verify against numpy
    expect = np.argsort(-H[2, :])[:5]
    np.testing.assert_array_equal(np.sort(idx), np.sort(expect))

    idx, _ = emb.top_terms_for_topic(1, k=3)
    expect = np.argsort(-W[:, 1])[:3]
    np.testing.assert_array_equal(np.sort(idx), np.sort(expect))

    sim_idx, sim_vals = emb.similar_docs(0, k=5)
    assert 0 not in sim_idx and len(sim_idx) == 5
    assert (np.diff(sim_vals) <= 1e-6).all()  # descending scores

    q = np.zeros(50)
    q[:5] = 1.0
    idx, _ = emb.search(q, k=4)
    assert len(idx) == 4


def test_embeddings_save_load(tmp_path):
    rng = np.random.RandomState(1)
    emb = NmfEmbeddings(rng.rand(20, 3), rng.rand(3, 10))
    path = str(tmp_path / "emb.npz")
    emb.save(path)
    emb2 = NmfEmbeddings.load(path)
    np.testing.assert_allclose(
        np.asarray(emb2.docs.table), np.asarray(emb.docs.table)
    )


@pytest.mark.parametrize("doc_block,term_block", [(64, 0), (100, 0),
                                                  (1024, 0), (0, 32),
                                                  (64, 32)])
def test_ell_blocked_matches_dense(doc_block, term_block):
    """Minor-blocked bucket families (the large-matrix gather-locality
    fix, scripts/tpu_batch18.py): blocked mm_nt/mm_tn == dense in every
    doc/term blocking combination, and the operand still round-trips as
    a jit argument pytree."""
    import jax

    A, W, H = _random_problem(70, 300, 5, 0.05, seed=9)
    Wd, Hd = jnp.asarray(W), jnp.asarray(H)
    dense = DenseAOp(jnp.asarray(A.toarray()))
    ell = EllAOp.from_scipy(A, dtype=DTYPE, doc_block=doc_block,
                            term_block=term_block)
    if doc_block:
        assert len(ell.row_blocks) == -(-300 // doc_block)
    else:
        assert ell.row_blocks is None
    if term_block:
        assert len(ell.col_blocks) == -(-70 // term_block)
    else:
        assert ell.col_blocks is None

    np.testing.assert_allclose(
        np.asarray(ell.mm_nt(Hd)), np.asarray(dense.mm_nt(Hd)),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ell.mm_tn(Wd)), np.asarray(dense.mm_tn(Wd)),
        rtol=1e-10, atol=1e-12,
    )

    # pytree: pass through jit as an argument (the only way big operands
    # may reach compiled code — closures bake them into the HLO)
    out = jax.jit(lambda op, h: op.mm_nt(h))(ell, Hd)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense.mm_nt(Hd)),
        rtol=1e-10, atol=1e-12,
    )
    out = jax.jit(lambda op, w: op.mm_tn(w))(ell, Wd)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense.mm_tn(Wd)),
        rtol=1e-10, atol=1e-12,
    )


def test_ell_fine_ladder_matches_dense(monkeypatch):
    """Quarter-step bucket refinement (ops/ell._target_lengths): a
    populous pow-2 class splits into {5/8,3/4,7/8,1}xL sub-buckets,
    cutting gather padding (the 1M-doc bench corpus pads 80-nnz columns
    to 128 = 1.6x waste under pow-2).  Forced on here via the population
    gate; products must match dense exactly and the padded footprint
    must shrink."""
    import smallk_tpu.ops.ell as ell_mod

    # lengths concentrated at ~80 -> pow-2 class 128, fine target 80/88
    rng = np.random.RandomState(11)
    m, n = 400, 256
    cols, rows, vals = [], [], []
    for j in range(n):
        nzc = rng.randint(75, 82)
        r = rng.choice(m, size=nzc, replace=False)
        rows.append(r)
        cols.append(np.full(nzc, j))
        vals.append(rng.rand(nzc))
    import scipy.sparse as sp

    A = sp.csc_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))), shape=(m, n))
    W = jnp.asarray(rng.rand(m, 3), DTYPE)
    H = jnp.asarray(rng.rand(3, n), DTYPE)
    dense = DenseAOp(jnp.asarray(A.toarray(), DTYPE))

    coarse = EllAOp.from_scipy(A, dtype=DTYPE)  # gate 4096 > n: pow-2
    monkeypatch.setattr(ell_mod, "_FINE_SPLIT_MIN", 64)
    fine = EllAOp.from_scipy(A, dtype=DTYPE)
    assert fine.padded_nnz < coarse.padded_nnz
    # every column fits a {80, 88} sub-bucket, not the 128 pow-2 class
    assert all(idx.shape[1] < 128 for idx, _ in fine.col_buckets)

    for op in (coarse, fine):
        np.testing.assert_allclose(
            np.asarray(op.mm_tn(W)), np.asarray(dense.mm_tn(W)),
            rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(op.mm_nt(H)), np.asarray(dense.mm_nt(H)),
            rtol=1e-10, atol=1e-12,
        )


def test_ell_doc_blocked_auto_threshold():
    """auto only engages on very wide matrices (>= 2 x _DOC_BLOCK)."""
    from smallk_tpu.ops.ell import _DOC_BLOCK

    A, _, _ = _random_problem(20, 500, 2, 0.05, seed=3)
    assert EllAOp.from_scipy(A, dtype=DTYPE).row_blocks is None
    assert 2 * _DOC_BLOCK > 500  # the auto gate really was exercised


def test_ell_doc_blocked_shards():
    """Blocked operand placed over a (1, N) virtual mesh computes the
    same products (GSPMD path of parallel.mesh.shard_operand)."""
    import jax
    from smallk_tpu.parallel.mesh import make_mesh, shard_operand

    n_dev = len(jax.devices())
    A, W, H = _random_problem(60, 240, 4, 0.06, seed=4)
    Wd, Hd = jnp.asarray(W), jnp.asarray(H)
    dense = DenseAOp(jnp.asarray(A.toarray()))
    ell = EllAOp.from_scipy(A, dtype=DTYPE, doc_block=64, term_block=16,
                            pad_multiple=n_dev)
    mesh = make_mesh((1, n_dev))
    sharded = shard_operand(ell, mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.mm_nt(Hd)), np.asarray(dense.mm_nt(Hd)),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.mm_tn(Wd)), np.asarray(dense.mm_tn(Wd)),
        rtol=1e-10, atol=1e-12,
    )


@pytest.mark.parametrize("storage", ["bfloat16", "float8_e4m3fn"])
def test_ell_low_precision_storage_solver_parity(storage):
    """Quantized A-storage must not round the product OUTPUTS below the
    factor/compute dtype.  Regression: bf16-ELL products returned bf16
    W'A / AH', which biased BPP's f32 gradient sign tests and collapsed
    every pivot to the zero solution — factors zeroed out within an
    iteration on the 1M-doc flagship config while dense-bf16 (whose
    products follow the factor-dtype contract) was healthy."""
    from smallk_tpu.common.options import NmfAlgorithm, NmfOptions
    from smallk_tpu.common.rng import Random, random_matrix
    from smallk_tpu.solvers.solve import nmf_solve

    A, _, _ = _random_problem(300, 400, 8, 0.1, 11)
    W0 = jnp.asarray(random_matrix(300, 8, Random(1)), jnp.float32)
    H0 = jnp.asarray(random_matrix(8, 400, Random(2)), jnp.float32)
    opts = NmfOptions(
        tol=1e-9, algorithm=NmfAlgorithm.BPP, height=300, width=400,
        k=8, min_iter=1, max_iter=10, verbose=False, dtype="float32",
        a_dtype=storage,
    )
    dt = jnp.dtype(storage)
    for blocks in (dict(), dict(doc_block=128, term_block=128)):
        op = EllAOp.from_scipy(A, dt, **blocks)
        # product outputs carry the factor dtype, not the storage dtype
        assert op.mm_tn(W0).dtype == jnp.float32
        assert op.mm_nt(H0).dtype == jnp.float32
        out = nmf_solve(op, W0, H0, opts)
        assert bool(out.success)
        assert float(jnp.max(out.W)) > 0.0 and float(jnp.max(out.H)) > 0.0
    # bf16 storage tracks the dense-bf16 run (identical quantization of
    # A, same factor-dtype products) to f32 noise
    if storage == "bfloat16":
        dense = nmf_solve(
            DenseAOp(jnp.asarray(A.toarray(), jnp.bfloat16)), W0, H0,
            opts)
        ell = nmf_solve(EllAOp.from_scipy(A, dt), W0, H0, opts)
        np.testing.assert_allclose(np.asarray(ell.W),
                                   np.asarray(dense.W), rtol=2e-2,
                                   atol=1e-4)


class TestCscChunks:
    """Chunk-expanded column-subset operand (ops/ell_cols.py) vs dense
    A[:, subset] — the TPU SubMatrixColsCompact equivalent (reference
    sparse_matrix_impl.hpp:479)."""

    @pytest.mark.parametrize("seed", range(3))
    @pytest.mark.parametrize("L0", [None, 4, 16])
    def test_subset_products_match_dense(self, seed, L0):
        import jax

        from smallk_tpu.ops.ell_cols import CscChunks

        m, n, k = 60, 90, 2
        A, W, H = _random_problem(m, n, k, 0.15, seed)
        chunks = CscChunks.from_scipy(A, dtype=DTYPE, L0=L0)
        rng = np.random.RandomState(seed + 100)
        subset = np.sort(rng.choice(n, size=25, replace=False))
        wc = 1
        while wc < max(chunks.subset_chunk_count(subset), 25, 64):
            wc <<= 1
        Ad = A[:, subset].toarray()

        # host plan
        idx_docs, idx_chunks, slot = chunks.gather_host(subset, wc)
        op = chunks.gathered(jnp.asarray(idx_chunks),
                             jnp.asarray(slot), wc)
        Wd = jnp.asarray(W)
        Hs = jnp.asarray(np.pad(H[:, subset], ((0, 0), (0, wc - 25))))
        WtA = np.asarray(op.mm_tn(Wd))
        np.testing.assert_allclose(WtA[:, :25], W.T @ Ad, atol=1e-12)
        np.testing.assert_allclose(WtA[:, 25:], 0.0, atol=0)
        AHt = np.asarray(op.mm_nt(Hs))
        np.testing.assert_allclose(AHt, Ad @ H[:, subset].T, atol=1e-12)

        # device plan from a boolean mask agrees with the host plan
        mask = np.zeros(n, dtype=bool)
        mask[subset] = True

        @jax.jit
        def dev_products(mask, W, Hs):
            idx_d, idx_c, sl = chunks.gather_device(mask, wc)
            opd = chunks.gathered(idx_c, sl, wc)
            return idx_d, opd.mm_tn(W), opd.mm_nt(Hs)

        idx_d, WtA2, AHt2 = dev_products(jnp.asarray(mask), Wd, Hs)
        np.testing.assert_array_equal(np.asarray(idx_d), idx_docs)
        np.testing.assert_allclose(np.asarray(WtA2), WtA, atol=1e-12)
        np.testing.assert_allclose(np.asarray(AHt2), AHt, atol=1e-12)

    def test_empty_and_long_columns(self):
        from smallk_tpu.ops.ell_cols import CscChunks

        m, n = 40, 12
        rng = np.random.RandomState(0)
        A = sp.lil_matrix((m, n))
        A[:, 3] = rng.rand(m, 1)          # full column (many chunks)
        A[0, 7] = 2.0                     # single-entry column
        # column 5 left empty
        A = A.tocsc()
        chunks = CscChunks.from_scipy(A, dtype=DTYPE, L0=8)
        subset = np.array([3, 5, 7])
        wc = 16
        _, idx_chunks, slot = chunks.gather_host(subset, wc)
        op = chunks.gathered(jnp.asarray(idx_chunks),
                             jnp.asarray(slot), wc)
        W = jnp.asarray(rng.rand(m, 2))
        WtA = np.asarray(op.mm_tn(W))
        Ad = A[:, subset].toarray()
        np.testing.assert_allclose(WtA[:, :3], np.asarray(W).T @ Ad,
                                   atol=1e-12)
        np.testing.assert_allclose(WtA[:, 3:], 0.0)

    def test_rank2_solve_on_gathered_operand(self):
        """A rank-2 NMF on the gathered operand matches the same solve
        on the dense extracted submatrix (f64, same initializers)."""
        from smallk_tpu.common.options import (
            NmfAlgorithm,
            NmfOptions,
        )
        from smallk_tpu.ops.ell_cols import CscChunks
        from smallk_tpu.solvers.solve import nmf_solve

        m, n = 50, 80
        A, _, _ = _random_problem(m, n, 2, 0.2, 5)
        A.data[:] = np.abs(A.data)
        chunks = CscChunks.from_scipy(A, dtype=DTYPE)
        rng = np.random.RandomState(2)
        subset = np.sort(rng.choice(n, size=30, replace=False))
        wc = 64
        _, idx_chunks, slot = chunks.gather_host(subset, wc)
        op = chunks.gathered(jnp.asarray(idx_chunks),
                             jnp.asarray(slot), wc)
        W0 = rng.rand(m, 2)
        H0 = np.pad(rng.rand(2, 30), ((0, 0), (0, wc - 30)))
        opts = NmfOptions(
            tol=1e-6, algorithm=NmfAlgorithm.RANK2, height=m, width=wc,
            k=2, min_iter=1, max_iter=200, verbose=False,
            dtype="float64",
        )
        r1 = nmf_solve(op, jnp.asarray(W0), jnp.asarray(H0), opts)
        dense_sub = np.zeros((m, wc))
        dense_sub[:, :30] = A[:, subset].toarray()
        r2 = nmf_solve(DenseAOp(jnp.asarray(dense_sub)),
                       jnp.asarray(W0), jnp.asarray(H0), opts)
        assert bool(r1.success) and bool(r2.success)
        np.testing.assert_allclose(np.asarray(r1.W), np.asarray(r2.W),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(r1.H), np.asarray(r2.H),
                                   atol=1e-8)
