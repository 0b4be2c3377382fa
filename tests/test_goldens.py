"""Golden regression tests.

The reference pins behavior with Matlab golden CSVs and byte-exact output
comparisons (SURVEY.md §4).  Here the goldens are fixed-seed f64 CPU runs
of this framework, committed under tests/fixtures/ — they pin the solver
semantics across refactors (any intentional change regenerates them with
/tmp-style scripts and is reviewed as a behavioral diff).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from smallk_tpu.common.options import (
    NmfAlgorithm,
    NmfOptions,
    NmfProgressAlgorithm,
)
from smallk_tpu.ops.aop import DenseAOp
from smallk_tpu.solvers.solve import nmf_solve

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "nmf_goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    return np.load(FIXTURE)


@pytest.mark.parametrize("alg", ["MU", "HALS", "BPP", "RANK2"])
def test_solver_matches_golden(goldens, alg):
    A = goldens["A"]
    m, n = A.shape
    if alg == "RANK2":
        W0, H0, k = goldens["W0r2"], goldens["H0r2"], 2
    else:
        W0, H0, k = goldens["W0"], goldens["H0"], 4
    prog = (NmfProgressAlgorithm.DELTA_FNORM if alg == "MU"
            else NmfProgressAlgorithm.PG_RATIO)
    opts = NmfOptions(
        tol=1e-5, algorithm=NmfAlgorithm(alg), prog_est_algorithm=prog,
        height=m, width=n, k=k, min_iter=5, max_iter=300,
        verbose=False, dtype="float64",
    )
    r = nmf_solve(
        DenseAOp(jnp.asarray(A)), jnp.asarray(W0), jnp.asarray(H0), opts
    )
    assert int(r.iterations) == int(goldens[f"iters_{alg}"])
    np.testing.assert_allclose(
        np.asarray(r.W), goldens[f"W_{alg}"], rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r.H), goldens[f"H_{alg}"], rtol=1e-10, atol=1e-12
    )
