"""IQ file IO + synthetic generator tests."""

import numpy as np
import pytest

from rtlsdr_wsprd_tpu.config import DF, DT, NSPERSYM, NSYM, SIGNAL_SAMPLES
from rtlsdr_wsprd_tpu.runtime import (
    normalize_minus3db,
    read_c2_file,
    read_iq_file,
    selftest_iq,
    synth_window_at_snr,
    synth_wspr_baseband,
    write_c2_file,
    write_iq_file,
)
from rtlsdr_wsprd_tpu.utils import WsprHashTable, get_wspr_channel_symbols


def test_iq_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    i = rng.normal(size=SIGNAL_SAMPLES).astype(np.float32)
    q = rng.normal(size=SIGNAL_SAMPLES).astype(np.float32)
    p = tmp_path / "x.iq"
    write_iq_file(i, q, p)
    assert p.stat().st_size == 8 * SIGNAL_SAMPLES
    i2, q2 = read_iq_file(p, normalize=False)
    # write negates Q, read negates it back
    np.testing.assert_array_equal(i2, i)
    np.testing.assert_array_equal(q2, q)


def test_iq_read_normalizes_to_half(tmp_path):
    i = np.zeros(SIGNAL_SAMPLES, dtype=np.float32)
    q = np.zeros(SIGNAL_SAMPLES, dtype=np.float32)
    i[7] = 4.0
    q[9] = -2.0
    p = tmp_path / "x.iq"
    write_iq_file(i, q, p)
    i2, q2 = read_iq_file(p)
    assert np.max(np.abs(np.stack([i2, q2]))) == pytest.approx(0.5)
    assert i2[7] == pytest.approx(0.5)
    assert q2[9] == pytest.approx(-0.25)


def test_c2_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    i = rng.normal(size=SIGNAL_SAMPLES).astype(np.float32)
    q = rng.normal(size=SIGNAL_SAMPLES).astype(np.float32)
    p = tmp_path / "x.c2"
    write_c2_file(i, q, p, dial_freq_hz=14095600.0, name="test")
    i2, q2, freq = read_c2_file(p, normalize=False)
    assert freq == 14095600.0
    np.testing.assert_array_equal(i2, i)
    np.testing.assert_array_equal(q2, q)


def test_golden_iq_loads(golden_iq_path):
    i, q = read_iq_file(golden_iq_path)
    assert i.shape == (SIGNAL_SAMPLES,)
    assert np.max(np.abs(np.stack([i, q]))) == pytest.approx(0.5, abs=1e-6)


def test_synth_tone_frequencies():
    # constant symbol -> single tone at f0 + (sym-1.5)*DF
    for sym, expect in [(0, -1.5), (1, -0.5), (2, 0.5), (3, 1.5)]:
        symbols = np.full(NSYM, sym, dtype=np.uint8)
        iq = synth_wspr_baseband(symbols, f0=0.0, t0=0.0, amp=1.0,
                                 n_samples=NSYM * NSPERSYM)
        spec = np.fft.fftshift(np.abs(np.fft.fft(iq)))
        freqs = np.fft.fftshift(np.fft.fftfreq(iq.size, d=DT))
        peak = freqs[np.argmax(spec)]
        assert peak == pytest.approx(expect * DF, abs=0.01)


def test_synth_continuous_phase():
    ht = WsprHashTable()
    symbols = get_wspr_channel_symbols("K1JT FN20QI 20", ht)
    iq = synth_wspr_baseband(symbols, f0=50.0, t0=0.0, amp=1.0,
                             n_samples=NSYM * NSPERSYM)
    # constant envelope + no phase jumps at symbol boundaries
    np.testing.assert_allclose(np.abs(iq), 1.0, atol=1e-5)
    dphi = np.angle(iq[1:] * np.conj(iq[:-1]))
    # max per-sample increment: |f| <= 50 + 1.5*DF + margin
    assert np.max(np.abs(dphi)) < 2 * np.pi * DT * 60


def test_selftest_signal_placement():
    i, q = selftest_iq()
    assert i.shape == (SIGNAL_SAMPLES,)
    start = int(round(2.0 / DT))
    assert np.all(i[:start] == 0)
    span = np.abs(i[start : start + NSYM * NSPERSYM])
    assert span.max() > 0.5


def test_synth_window_at_snr_power():
    # measured tone SNR should track the request within ~1.5 dB
    i, q = synth_window_at_snr("K1JT FN20QI 20", snr_db=10.0, f0=0.0, seed=3)
    iq = i + 1j * q
    # Welch-ish estimate: power at tone bins vs noise floor
    n = SIGNAL_SAMPLES
    spec = np.abs(np.fft.fft(iq)) ** 2 / n
    freqs = np.fft.fftfreq(n, d=DT)
    sig_band = np.abs(freqs) < 4 * DF
    noise_band = (np.abs(freqs) > 50) & (np.abs(freqs) < 150)
    psig = spec[sig_band].sum() / n  # total signal power (approx)
    n0 = spec[noise_band].mean() / n * n * DT  # density via bin width
    measured = 10 * np.log10(psig / (n0 * 2500.0))
    assert measured == pytest.approx(10.0, abs=1.5)


def test_normalize_empty_safe():
    i, q = normalize_minus3db(np.zeros(4, np.float32), np.zeros(4, np.float32))
    assert np.all(np.isfinite(i)) and np.all(np.isfinite(q))
