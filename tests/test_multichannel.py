"""Multi-channel batched decode: parity with the single-window path and
mesh-sharded execution on the virtual CPU device mesh."""

import numpy as np
import pytest

import jax

from rtlsdr_wsprd_tpu.config import DecoderOptions
from rtlsdr_wsprd_tpu.models.decoder import decode_window
from rtlsdr_wsprd_tpu.parallel.mesh import channel_sharding, local_mesh
from rtlsdr_wsprd_tpu.parallel.multichannel import decode_channels
from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db, read_iq_file
from rtlsdr_wsprd_tpu.runtime.synth import synth_window_at_snr


def _window(messages, snr_db, f0, seed, **kw):
    i, q = synth_window_at_snr(messages, snr_db=snr_db, f0=f0, seed=seed, **kw)
    i, q = normalize_minus3db(i, q)
    return i, q


@pytest.fixture(scope="module")
def batch3():
    """3 channels: 2-signal, 1-signal, noise-only."""
    wins = [
        _window(["K1JT FN20 37", "K9AN EN50 33"], [5.0, 0.0],
                [-50.0, 40.0], seed=101),
        _window("G4ABC IO91 30", 3.0, 10.0, seed=202),
    ]
    rng = np.random.default_rng(303)
    z = rng.normal(0, 1.0, (45000, 2)).astype(np.float32)
    wins.append(normalize_minus3db(z[:, 0], z[:, 1]))
    return wins


def test_multichannel_matches_single_window(batch3):
    options = DecoderOptions()
    iq = np.stack([i + 1j * q for i, q in batch3]).astype(np.complex64)
    batched = decode_channels(iq, options)

    for b, (i, q) in enumerate(batch3):
        single = decode_window(i, q, options)
        got = sorted((s.call, s.loc, s.pwr) for s in batched[b])
        want = sorted((s.call, s.loc, s.pwr) for s in single)
        assert got == want, f"channel {b}: {got} != {want}"
        for sb, ss in zip(
            sorted(batched[b], key=lambda s: s.call),
            sorted(single, key=lambda s: s.call),
        ):
            assert sb.freq == pytest.approx(ss.freq, abs=1e-7)
            assert sb.snr == pytest.approx(ss.snr, abs=0.1)
            assert sb.dt == pytest.approx(ss.dt, abs=0.01)


def test_multichannel_sharded_over_mesh(batch3):
    """Same decode, sharded over all 8 virtual devices."""
    options = DecoderOptions()
    # pad the batch to the mesh size with copies
    wins = (batch3 * 3)[:8]
    iq = np.stack([i + 1j * q for i, q in wins]).astype(np.complex64)
    mesh = local_mesh(8)
    sharding = channel_sharding(mesh)
    batched = decode_channels(iq, options, sharding=sharding)

    ref = decode_channels(iq, options)
    for b in range(8):
        got = sorted((s.call, s.loc, s.pwr) for s in batched[b])
        want = sorted((s.call, s.loc, s.pwr) for s in ref[b])
        assert got == want


def test_multichannel_golden_capture(golden_iq_path):
    """The golden 0 dB capture decodes identically through the batched
    path (reference spot: K1JT FN20 dBm 20, tests/run_tests.sh:64-65)."""
    i, q = read_iq_file(golden_iq_path)
    iq = np.stack([i + 1j * q, i + 1j * q]).astype(np.complex64)
    spots = decode_channels(iq, DecoderOptions())
    for b in range(2):
        assert len(spots[b]) == 1
        s = spots[b][0]
        assert (s.call, s.loc, s.pwr) == ("K1JT", "FN20", "20")


def test_graft_entry_contract():
    """__graft_entry__.entry() compiles single-chip; dryrun_multichip
    runs on the full virtual mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.snr.shape[0] == args[0].shape[0]

    mod.dryrun_multichip(len(jax.devices()))
