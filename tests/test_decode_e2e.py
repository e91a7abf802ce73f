"""End-to-end decode parity against the full reference decoder oracle.

The oracle is the reference wsprd compiled with our FFT shim
(tests/oracle/), giving exact reference spot values for any input.
"""

import numpy as np
import pytest

from rtlsdr_wsprd_tpu.config import DecoderOptions
from rtlsdr_wsprd_tpu.models import decode_window
from rtlsdr_wsprd_tpu.runtime import read_iq_file, selftest_iq, synth_window_at_snr
from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db

import oracle


def _ref(i, q, tmp_path, **kw):
    if not oracle.available():
        pytest.skip("reference oracle unavailable")
    return oracle.wspr_decode_reference(i, q, dialfreq=14095600,
                                        workdir=str(tmp_path), **kw)


def _assert_spots_match(mine, ref):
    assert len(mine) == len(ref)
    for m, r in zip(mine, ref):
        assert m.call == r.call
        assert m.loc == r.loc
        assert m.pwr == r.pwr
        assert m.message == r.message
        assert m.freq == pytest.approx(r.freq, abs=0.5e-6)  # 0.5 Hz
        assert m.snr == pytest.approx(r.snr, abs=0.5)
        assert m.dt == pytest.approx(r.dt, abs=0.05)
        assert m.drift == pytest.approx(r.drift, abs=0.01)


OPTS = DecoderOptions(freq=14095600)


def test_golden_capture_parity(golden_iq_path, tmp_path):
    """The north-star check: decode parity at 0 dB SNR on the
    reference's own golden capture (BASELINE.md)."""
    i, q = read_iq_file(golden_iq_path)
    mine = decode_window(i, q, OPTS)
    ref = _ref(i, q, tmp_path)
    assert [s.message for s in mine] == ["K1JT FN20 20"]
    _assert_spots_match(mine, ref)
    # exact-field agreement observed in practice; sync is the most
    # sensitive float in the chain
    assert mine[0].sync == pytest.approx(ref[0].sync, abs=1e-3)


def test_selftest_decode(tmp_path):
    """The reference self-test contract (rtlsdr_wsprd.c:729-789)."""
    i, q = normalize_minus3db(*selftest_iq())
    mine = decode_window(i, q, OPTS)
    assert mine and mine[0].call == "K1JT"
    assert mine[0].loc == "FN20"
    assert mine[0].pwr == "20"
    ref = _ref(i, q, tmp_path)
    _assert_spots_match(mine, ref)


def test_multi_signal_parity(tmp_path):
    """Three overlapping transmissions; the weak ones require pass-2 /
    subtraction behavior to co-exist with the strong one."""
    msgs = ["K1JT FN20QI 20", "W1AW FN31PR 10", "VA2GKA FN35 37"]
    i, q = synth_window_at_snr(msgs, snr_db=[5, -5, -15], f0=[-80, 0, 60],
                               t0=[2.0, 1.0, 3.0], seed=7)
    i, q = normalize_minus3db(i, q)
    mine = decode_window(i, q, OPTS)
    ref = _ref(i, q, tmp_path)
    assert sorted(s.call for s in mine) == ["K1JT", "VA2GKA", "W1AW"]
    _assert_spots_match(mine, ref)


@pytest.mark.parametrize("snr_db", [0, -15, -22])
def test_snr_sweep_message_parity(snr_db, tmp_path):
    i, q = synth_window_at_snr("K1JT FN20QI 20", snr_db=snr_db, f0=20.0, seed=11)
    i, q = normalize_minus3db(i, q)
    mine = decode_window(i, q, OPTS)
    ref = _ref(i, q, tmp_path)
    assert [s.message for s in mine] == [s.message for s in ref]


def test_quickmode(tmp_path):
    i, q = read_iq_file("/root/reference/signals/refSignalSnr0dB.iq")
    opts = OPTS.with_(quickmode=True)
    mine = decode_window(i, q, opts)
    ref = _ref(i, q, tmp_path, quickmode=True)
    _assert_spots_match(mine, ref)


def test_single_pass_mode(tmp_path):
    """-S: npasses=1, no subtraction (rtlsdr_wsprd.c:967-970)."""
    i, q = read_iq_file("/root/reference/signals/refSignalSnr0dB.iq")
    opts = OPTS.with_(npasses=1, subtraction=False)
    mine = decode_window(i, q, opts)
    ref = _ref(i, q, tmp_path, npasses=1, subtraction=False)
    _assert_spots_match(mine, ref)


def test_empty_window():
    rng = np.random.default_rng(5)
    i = rng.normal(0, 0.1, 45000).astype(np.float32)
    q = rng.normal(0, 0.1, 45000).astype(np.float32)
    i, q = normalize_minus3db(i, q)
    spots = decode_window(i, q, OPTS)
    assert spots == []


def test_prefixed_message_roundtrip(tmp_path):
    """Type 2 (prefixed/suffixed callsign, no grid) end-to-end decode
    through the full pipeline (pack_prefix wsprsim_utils.c:80-142 /
    unpackpfx wsprd_utils.c:152-194)."""
    from rtlsdr_wsprd_tpu.models.decoder import WsprDecoder

    dec = WsprDecoder(OPTS.with_(usehashtable=True),
                      hashtable_path=str(tmp_path / "hashtable.txt"))
    i, q = synth_window_at_snr("PJ4/K1ABC 37", snr_db=5, f0=15.0, seed=33)
    i, q = normalize_minus3db(i, q)
    spots = dec.decode(i, q)
    # reference parity: type 2 fills message/callsign but leaves the
    # call/loc/pwr columns EMPTY (wsprd_utils.c:266-279 sets only
    # call_loc_pow + callsign on that branch)
    assert [s.message for s in spots] == ["PJ4/K1ABC 37"]
    assert spots[0].call == "" and spots[0].loc == ""
    assert not spots[0].noprint  # 37 dBm is a legal power -> printed


def test_hashed_message_roundtrip(tmp_path):
    """Type 3 (<call> grid6 pwr) decode; hashtable lookup resolves the
    callsign when a prior type-1 decode inserted it."""
    from rtlsdr_wsprd_tpu.models.decoder import WsprDecoder

    dec = WsprDecoder(OPTS.with_(usehashtable=True),
                      hashtable_path=str(tmp_path / "hashtable.txt"))
    # first window: plain call teaches the hashtable
    i, q = synth_window_at_snr("K1ABC EN50 33", snr_db=5, f0=-30.0, seed=21)
    i, q = normalize_minus3db(i, q)
    spots = dec.decode(i, q)
    assert [s.call for s in spots] == ["K1ABC"]
    # second window: hashed call resolves
    i, q = synth_window_at_snr("<K1ABC> EN50WC 33", snr_db=5, f0=-30.0, seed=22)
    i, q = normalize_minus3db(i, q)
    spots = dec.decode(i, q)
    assert [s.call for s in spots] == ["<K1ABC>"]
    assert spots[0].loc == "EN50WC"
