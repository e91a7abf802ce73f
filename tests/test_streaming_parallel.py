"""Sequence-parallel front end: sharded == unsharded up to the wrap
frames; halo exchange rides ppermute."""

import numpy as np

import jax.numpy as jnp
from jax.sharding import Mesh

import jax

from rtlsdr_wsprd_tpu.frontend.decimate import decimate_stage1_xla
from rtlsdr_wsprd_tpu.frontend.filters import R1, STAGE1_TAPS
from rtlsdr_wsprd_tpu.parallel.streaming import (
    decimate_stage1_sharded,
    valid_frames,
)


def test_time_sharded_matches_unsharded():
    n_dev = 8
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("seq",))
    rng = np.random.default_rng(12)
    L = n_dev * R1 * 256
    xI = rng.normal(0, 1, L).astype(np.float32)
    xQ = rng.normal(0, 1, L).astype(np.float32)

    shi, shq = decimate_stage1_sharded(
        jnp.asarray(xI), jnp.asarray(xQ), mesh)
    shi, shq = np.asarray(shi), np.asarray(shq)

    n_ref = valid_frames(L)
    ri, rq = decimate_stage1_xla(jnp.asarray(xI), jnp.asarray(xQ), n_ref)

    assert shi.shape == (L // R1,)
    wrap = STAGE1_TAPS // R1 - 1
    np.testing.assert_allclose(shi[:n_ref], np.asarray(ri), rtol=0, atol=1e-5)
    np.testing.assert_allclose(shq[:n_ref], np.asarray(rq), rtol=0, atol=1e-5)
    assert L // R1 - n_ref == wrap


def test_time_sharded_stage2_matches_unsharded():
    """Stage-2 halo exchange: sharded 30 ksps -> 375 sps equals the
    unsharded kernel up to the wrap frames; chaining stage-1 + stage-2
    sharded covers the full raw -> baseband path."""
    from rtlsdr_wsprd_tpu.frontend.decimate import decimate_stage2_xla
    from rtlsdr_wsprd_tpu.frontend.filters import R2, STAGE2_TAPS
    from rtlsdr_wsprd_tpu.parallel.streaming import (
        decimate_stage2_sharded,
        valid_frames_stage2,
    )

    n_dev = 8
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("seq",))
    rng = np.random.default_rng(21)
    M = n_dev * R2 * 64
    mI = rng.normal(0, 1, M).astype(np.float32)
    mQ = rng.normal(0, 1, M).astype(np.float32)

    shi, shq = decimate_stage2_sharded(
        jnp.asarray(mI), jnp.asarray(mQ), mesh)
    shi, shq = np.asarray(shi), np.asarray(shq)

    n_ref = valid_frames_stage2(M)
    ri, rq = decimate_stage2_xla(jnp.asarray(mI), jnp.asarray(mQ), n_ref)

    assert shi.shape == (M // R2,)
    wrap = STAGE2_TAPS // R2 - 1
    np.testing.assert_allclose(shi[:n_ref], np.asarray(ri), rtol=0,
                               atol=1e-5)
    np.testing.assert_allclose(shq[:n_ref], np.asarray(rq), rtol=0,
                               atol=1e-5)
    assert M // R2 - n_ref == wrap
