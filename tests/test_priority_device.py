"""Host/device NDCG-priority parity.

compute_priority is the numpy transcription of the reference's
compute_priority (clust_hier_util.hpp:105-173); compute_priority_device is
the jnp version traced inside hierclust's fused node programs.  They must
agree exactly (f64 on the CPU test backend) including the sentinel and
tie/zero edge cases.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from smallk_tpu.engines.priority import (
    compute_priority,
    compute_priority_device,
)


def _pair(rng, m, zero_frac=0.0, ties=False):
    w_parent = rng.rand(m)
    if zero_frac:
        w_parent[rng.rand(m) < zero_frac] = 0.0
    w_child = rng.rand(m, 2)
    if ties:
        # duplicate values exercise the stable-sort tie-breaking that the
        # reference's desc_ordered defines (lower index wins)
        w_parent = np.round(w_parent, 1)
        w_child = np.round(w_child, 1)
    return w_parent, w_child


@pytest.mark.parametrize("m", [16, 100, 257])
@pytest.mark.parametrize("zero_frac,ties", [(0.0, False), (0.3, False),
                                            (0.0, True), (0.5, True)])
def test_device_matches_host(m, zero_frac, ties):
    rng = np.random.RandomState(m + int(zero_frac * 10) + int(ties))
    for _ in range(5):
        w_parent, w_child = _pair(rng, m, zero_frac, ties)
        host = compute_priority(w_parent, w_child)
        dev = float(compute_priority_device(
            jnp.asarray(w_parent), jnp.asarray(w_child)
        ))
        assert dev == pytest.approx(host, rel=1e-12, abs=1e-12)


def test_degenerate_parent_sentinel():
    w_child = np.random.RandomState(0).rand(32, 2)
    for nnz in (0, 1):
        w_parent = np.zeros(32)
        w_parent[:nnz] = 1.0
        assert compute_priority(w_parent, w_child) == -3.0
        assert float(compute_priority_device(
            jnp.asarray(w_parent), jnp.asarray(w_child)
        )) == -3.0


def test_all_nonzero_parent():
    rng = np.random.RandomState(3)
    w_parent = rng.rand(64) + 0.1  # strictly positive: no weight-1 tail
    w_child = rng.rand(64, 2)
    host = compute_priority(w_parent, w_child)
    dev = float(compute_priority_device(
        jnp.asarray(w_parent), jnp.asarray(w_child)
    ))
    assert dev == pytest.approx(host, rel=1e-12)
