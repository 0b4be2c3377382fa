"""Profiling/observability utility tests."""

import time

import numpy as np

from smallk_tpu.common.profiling import (
    Timer,
    block_and_time,
    debug_nans,
    timed,
)


def test_timer():
    t = Timer()
    t.start()
    time.sleep(0.01)
    t.stop()
    assert 0.005 < t.report_seconds() < 1.0
    assert t.report_microseconds() > 5000
    t.reset()
    assert t.report_seconds() == 0.0


def test_timed_sink():
    sink = {}
    with timed("phase", sink):
        time.sleep(0.005)
    assert sink["phase"] > 0.001


def test_block_and_time():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2.0)
    secs, out = block_and_time(f, jnp.ones((8, 8)), reps=3)
    assert secs >= 0
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_debug_nans_scoped():
    import jax

    before = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before
