"""Unit tests for the staged decode machinery: lane-compacted sync
variants, host-driven FEC rounds, and device-resident window state."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtlsdr_wsprd_tpu.ops.fano import build_mettab
from rtlsdr_wsprd_tpu.ops.subtract import subtract_rows, subtract_signal2
from rtlsdr_wsprd_tpu.ops.sync import (
    fine_sync,
    fine_sync_lanes,
    soft_symbols_jittered,
    soft_symbols_lanes,
)
from rtlsdr_wsprd_tpu.parallel.multichannel import (
    _DeviceWindows,
    _fano_rounds,
)
from rtlsdr_wsprd_tpu.utils.channel import (
    INTERLEAVE_PERM,
    get_wspr_channel_symbols,
)
from rtlsdr_wsprd_tpu.utils.hashtable import WsprHashTable

_METTAB = build_mettab()


@pytest.fixture(scope="module")
def batch_decode_env():
    """3 windows (signal, signal, noise) + expected per-window spots,
    shaped to reuse the device_batch=3 quickmode executables compiled
    by the other suites."""
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel.multichannel import decode_channels
    from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db
    from rtlsdr_wsprd_tpu.runtime.synth import synth_window_at_snr

    rng = np.random.default_rng(99)
    wins = []
    for msg, f0, seed in (("K1JT FN20 37", -40.0, 1), ("K9AN EN50 33",
                                                       30.0, 2)):
        i, q = synth_window_at_snr(msg, snr_db=5.0, f0=f0, seed=seed)
        wins.append(normalize_minus3db(i, q))
    z = rng.normal(0, 1.0, (45000, 2)).astype(np.float32)
    wins.append(normalize_minus3db(z[:, 0], z[:, 1]))
    wi = np.stack([i for i, q in wins])
    wq = np.stack([q for i, q in wins])
    clean = decode_channels(wi, wq, DecoderOptions(quickmode=True),
                            device_batch=3)
    expect = [sorted((s.call, s.loc, s.pwr) for s in ch) for ch in clean]
    assert expect[0] and expect[1]  # both signals decode cleanly
    return wi, wq, expect


def test_offset_correlator_matches_bruteforce(rng):
    """The offset-tensorized correlator (one matmul against the static
    offset-shifted tone matrix, via the pure-exponential phase
    identity) must equal the direct per-offset formulation: slice the
    window at each offset, derotate with the 256-sample phasor,
    correlate with E_TONE."""
    from rtlsdr_wsprd_tpu.ops import sync as S

    C = 3
    wr = jnp.asarray(rng.normal(0, 1, (C, S.WLEN)).astype(np.float32))
    wi = jnp.asarray(rng.normal(0, 1, (C, S.WLEN)).astype(np.float32))
    freq = jnp.asarray(np.linspace(-90, 100, C).astype(np.float32))
    drift = jnp.asarray(np.linspace(-3, 3, C).astype(np.float32))
    offsets = (0, 8, 127, 129, 256)  # span the full lag/jitter range

    p = np.asarray(S._tone_mags_offsets(wr, wi, freq, drift, offsets))
    assert p.shape == (C, 162, len(offsets), 4)

    ecr, eci = S._cand_phasor_conj(freq, drift)  # (C,162,256)
    etr = jnp.asarray(S.E_TONE_R)
    eti = jnp.asarray(S.E_TONE_I)
    for k, o in enumerate(offsets):
        xr = wr[:, o:o + S.NSIG].reshape(C, 162, 256)
        xi = wi[:, o:o + S.NSIG].reshape(C, 162, 256)
        yr, yi = S._derotate(xr, xi, ecr, eci)
        ref = np.asarray(S._tone_mags(yr, yi, etr, eti))
        np.testing.assert_allclose(p[:, :, k], ref, rtol=2e-4, atol=2e-3)


def test_lane_variants_match_per_window(rng):
    """fine_sync_lanes / soft_symbols_lanes over cross-window lanes must
    equal the per-window forms exactly (same slices, same einsums)."""
    B = 2
    sig_i = jnp.asarray(rng.normal(0, .1, (B, 45000)).astype(np.float32))
    sig_q = jnp.asarray(rng.normal(0, .1, (B, 45000)).astype(np.float32))
    lane_w = jnp.asarray(np.repeat(np.arange(B), 2).astype(np.int32))
    freq = jnp.asarray(np.linspace(-80, 90, 2 * B).astype(np.float32))
    shift = jnp.asarray((np.arange(2 * B) * 313 - 500).astype(np.int32))
    drift = jnp.asarray(np.linspace(-2, 2, 2 * B).astype(np.float32))

    fl = fine_sync_lanes(sig_i, sig_q, lane_w, freq, shift, drift, lagstep=16)
    jl = soft_symbols_lanes(sig_i, sig_q, lane_w, fl.freq, fl.shift, drift,
                            quickmode=True)
    for b in range(B):
        m = np.asarray(lane_w) == b
        fw = fine_sync(sig_i[b], sig_q[b], freq[m], shift[m], drift[m],
                       lagstep=16)
        jw = soft_symbols_jittered(sig_i[b], sig_q[b], fw.freq, fw.shift,
                                   drift[m], quickmode=True)
        assert np.array_equal(np.asarray(fl.shift)[m], np.asarray(fw.shift))
        assert np.allclose(np.asarray(fl.freq)[m], np.asarray(fw.freq))
        assert np.allclose(np.asarray(fl.sync)[m], np.asarray(fw.sync),
                           rtol=1e-6)
        assert np.array_equal(np.asarray(jl.symbols)[:, m],
                              np.asarray(jw.symbols))


def _hard_symbols(message: str) -> np.ndarray:
    """Deinterleaved 0/255 soft symbols of a clean encoding."""
    chan = get_wspr_channel_symbols(message, WsprHashTable())
    soft = np.where(chan >= 2, 255, 0).astype(np.uint8)  # data bit = sym>>1
    return soft[np.asarray(INTERLEAVE_PERM)]


def test_fano_rounds_first_success_in_jitter_order():
    """Two gate-passing jitters both decodable: the FIRST in schedule
    order must win (wsprd/wsprd.c:739-766 break-on-success)."""
    J, G = 4, 3
    good = _hard_symbols("K1JT FN20 37")
    noise = np.random.default_rng(5).integers(
        120, 136, (162,)).astype(np.uint8)  # undecodable mush
    deint = np.zeros((J, G, 162), np.uint8)
    gate = np.zeros((J, G), bool)
    # lane 0: jitters 1 and 3 pass the gate, both decodable
    deint[1, 0] = good
    deint[3, 0] = good
    gate[[1, 3], 0] = True
    # lane 1: jitter 0 passes but is garbage, jitter 2 decodable
    deint[0, 1] = noise
    deint[2, 1] = good
    gate[[0, 2], 1] = True
    # lane 2: nothing passes
    decoded = _fano_rounds(gate, deint, delta=60, dev_maxcycles=16,
                           full_maxcycles=10000)
    assert set(decoded) == {0, 1}
    assert decoded[0][0] == 1   # first gate-passing jitter wins
    assert decoded[1][0] == 2   # garbage attempt fails, next succeeds
    assert decoded[0][1] == decoded[1][1]  # same message bytes

    # the host-only FEC mode (default on tunneled backends) must
    # produce the identical first-success map, jitters, bytes and
    # cycle counts — Fano is deterministic
    from rtlsdr_wsprd_tpu import native

    if native.AVAILABLE:
        host = _fano_rounds(gate, deint, delta=60, dev_maxcycles=16,
                            full_maxcycles=10000, fec="host")
        assert host == decoded


def test_fano_rounds_host_prefetch_matches_dense():
    """The prefetch-fed host FEC driver (stage-B attempt compaction +
    on-demand column fetch) must equal the dense-array host driver,
    including lanes that only decode past the prefetch depth."""
    from rtlsdr_wsprd_tpu import native
    from rtlsdr_wsprd_tpu.parallel.multichannel import (
        PREFETCH_ATTEMPTS,
        _fano_rounds_host,
        _fano_rounds_host_prefetch,
    )

    if not native.AVAILABLE:
        pytest.skip("native hostdsp unavailable")
    J, G = 8, 4
    good = _hard_symbols("K1JT FN20 37")
    noise = np.random.default_rng(7).integers(
        120, 136, (162,)).astype(np.uint8)
    deint = np.zeros((J, G, 162), np.uint8)
    gate = np.zeros((J, G), bool)
    # lane 0: decodes on its first gate-passing jitter
    deint[2, 0] = good
    gate[2, 0] = True
    # lane 1: all 6 gate-passers are garbage except the LAST (past the
    # prefetch depth of 4) -> exercises the deferred column fetch
    for j in range(6):
        deint[j, 1] = noise
        gate[j, 1] = True
    deint[5, 1] = good
    # lane 2: gate-passing garbage only (never decodes)
    deint[[1, 3], 2] = noise
    gate[[1, 3], 2] = True
    # lane 3: nothing passes

    dense = _fano_rounds_host(gate, deint, delta=60, maxcycles=10000)

    M = min(PREFETCH_ATTEMPTS, J)
    pre_j = np.full((G, M), J, np.int32)
    pre_syms = np.zeros((G, M, 162), np.uint8)
    for g in range(G):
        js = np.nonzero(gate[:, g])[0][:M]
        pre_j[g, :len(js)] = js
        pre_syms[g, :len(js)] = deint[js, g]

    fetched = []

    def fetch_rest(lanes):
        fetched.append(list(lanes))
        return np.stack([deint[:, g] for g in lanes])

    pre = _fano_rounds_host_prefetch(gate, pre_j, pre_syms, fetch_rest,
                                     delta=60, maxcycles=10000)
    assert pre == dense
    assert fetched == [[1]]  # only the past-prefetch lane pulled a column


def test_decode_channels_host_fec_matches_hybrid(batch_decode_env):
    """decode_channels(fec='host') routes FEC through the stage-B
    prefetch + native decoder and must produce the same spots as the
    hybrid device path."""
    from rtlsdr_wsprd_tpu import native
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel.multichannel import decode_channels

    if not native.AVAILABLE:
        pytest.skip("native hostdsp unavailable")
    wi, wq, expect = batch_decode_env
    spots = decode_channels(wi, wq, DecoderOptions(quickmode=True),
                            device_batch=3, fec="host")
    got = [sorted((s.call, s.loc, s.pwr) for s in ch) for ch in spots]
    assert got == expect


def test_stage_a_rows_matches_packed(batch_decode_env):
    """The row-sliced stage A used for later passes must equal the
    contiguous-slab form on the same windows."""
    import jax.numpy as jnp

    from rtlsdr_wsprd_tpu.parallel.multichannel import (
        _stage_a_packed,
        _stage_a_rows,
    )

    wi, wq, _ = batch_decode_env
    si, sq = jnp.asarray(wi), jnp.asarray(wq)
    md = jnp.full((2,), 4, jnp.int32)
    rows = jnp.asarray(np.array([2, 0], np.int32))
    got = np.asarray(_stage_a_rows(si, sq, rows, md,
                                   fmin=-110.0, fmax=110.0))
    ref = np.asarray(_stage_a_packed(si[np.array([2, 0])],
                                     sq[np.array([2, 0])], md,
                                     fmin=-110.0, fmax=110.0))
    np.testing.assert_array_equal(got, ref)


def test_decode_channels_pipelined_matches_sequential(batch_decode_env):
    """The 2-deep pipelined stream decode must yield each batch's spots
    identical to sequential decode_channels calls, in order."""
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel.multichannel import (
        decode_channels_pipelined,
    )

    wi, wq, expect = batch_decode_env
    out = list(decode_channels_pipelined(
        [(wi, wq), (wi, wq), (wi, wq)], DecoderOptions(quickmode=True),
        device_batch=3))
    assert len(out) == 3
    for spots in out:
        got = [sorted((s.call, s.loc, s.pwr) for s in ch) for ch in spots]
        assert got == expect


def test_decode_channels_pipelined_accepts_prepared_handles(
        batch_decode_env):
    """Feeding prepare_windows() handles (device-resident windows, as
    from the on-device front end or bench.py's chip-bound headline)
    must decode identically to host-array feed."""
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel.multichannel import (
        decode_channels_pipelined,
        prepare_windows,
    )

    wi, wq, expect = batch_decode_env
    handles = [prepare_windows(wi, wq, device_batch=3) for _ in range(2)]
    out = list(decode_channels_pipelined(
        iter(handles), DecoderOptions(quickmode=True), device_batch=3))
    assert len(out) == 2
    for spots in out:
        got = [sorted((s.call, s.loc, s.pwr) for s in ch) for ch in spots]
        assert got == expect


def test_strict_hash_order_serializes_batches(monkeypatch):
    """strict_hash_order + usehashtable must fully serialize batches:
    batch k+1's decode may only START after batch k's completed (so
    every hashtable insert is visible to the next batch)."""
    import time

    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel import multichannel as mc

    timeline = []

    def fake_decode(i, q, options, ht, windows=None, fec="auto", **kw):
        k = sum(1 for ev, _ in timeline if ev == "start")
        timeline.append(("start", time.perf_counter()))
        if k == 0:
            time.sleep(0.25)  # make any overlap visible
        timeline.append(("end", time.perf_counter()))
        return [[] for _ in range(windows.B)]

    monkeypatch.setattr(mc, "decode_channels", fake_decode)
    z = np.zeros((1, 45000), np.float32)
    opts = DecoderOptions(quickmode=True, usehashtable=True)
    out = list(mc.decode_channels_pipelined(
        iter([(z, z), (z, z)]), opts, WsprHashTable(), depth=2,
        device_batch=1, strict_hash_order=True))
    assert len(out) == 2
    starts = [t for ev, t in timeline if ev == "start"]
    ends = [t for ev, t in timeline if ev == "end"]
    assert len(starts) == 2
    assert starts[1] >= ends[0]


@pytest.mark.slow
def test_strict_hash_order_resolves_cross_batch_type3():
    """A type-2 decode in batch k teaches the 15-bit callsign hash; the
    type-3 <hash> spot in batch k+1 must resolve to the full call under
    strict_hash_order (the reference's sequential window order,
    wsprd/wsprd_utils.c:275-300)."""
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel.multichannel import (
        decode_channels_pipelined,
    )
    from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db
    from rtlsdr_wsprd_tpu.runtime.synth import synth_window_at_snr

    def win(msg, seed):
        i, q = synth_window_at_snr(msg, snr_db=8.0, f0=20.0, seed=seed)
        i, q = normalize_minus3db(i, q)
        return i[None], q[None]

    batches = [win("PJ4/K1ABC 37", 41), win("<PJ4/K1ABC> FK52UD 37", 42)]
    opts = DecoderOptions(quickmode=True, usehashtable=True)
    ht = WsprHashTable()
    out = list(decode_channels_pipelined(
        iter(batches), opts, ht, depth=2, device_batch=1,
        strict_hash_order=True))
    assert len(out) == 2
    # type 2 decoded in batch 0 (call field empty, full message string)
    assert any(s.message == "PJ4/K1ABC 37" for s in out[0][0])
    # its hash taught the type-3 <call> resolution in batch 1
    assert "<PJ4/K1ABC>" in {s.call for s in out[1][0]}


@pytest.mark.slow
def test_pipelined_type3_resolves_under_forced_race(monkeypatch):
    """VERDICT r4 item 1: the pipelined hash-teaching guarantee must
    hold BY CONSTRUCTION, not by timing. Force the race — hold the
    TEACHER batch's decode until the type-3 batch has fully decoded
    (so its spot assembles as ``<...>``) — with the full 2-deep
    overlap (strict_hash_order=False): yield-time re-resolution
    (resolve_type3_spots) must still deliver the resolved ``<call>``
    message, byte-identical to the sequential reference fields
    (wsprd/wsprd_utils.c:280-308)."""
    import threading

    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel import multichannel as mc
    from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db
    from rtlsdr_wsprd_tpu.runtime.synth import synth_window_at_snr

    def win(msg, seed):
        i, q = synth_window_at_snr(msg, snr_db=8.0, f0=20.0, seed=seed)
        i, q = normalize_minus3db(i, q)
        return i[None], q[None]

    batches = [win("PJ4/K1ABC 37", 41), win("<PJ4/K1ABC> FK52UD 37", 42)]

    user_done = threading.Event()
    lock = threading.Lock()
    state = {"calls": 0, "raw_user_calls": None}
    real = mc.decode_channels

    def racing(i, q, options, ht, **kw):
        with lock:
            k = state["calls"]
            state["calls"] += 1
        if k == 0:
            # the teacher batch decodes (and teaches) only AFTER the
            # type-3 batch finished decoding — the worst-case race
            assert user_done.wait(timeout=600.0), "user batch stalled"
            return real(i, q, options, ht, **kw)
        res = real(i, q, options, ht, **kw)
        state["raw_user_calls"] = {s.call for ch in res for s in ch}
        user_done.set()
        return res

    monkeypatch.setattr(mc, "decode_channels", racing)
    opts = DecoderOptions(quickmode=True, usehashtable=True)
    ht = WsprHashTable()
    out = list(mc.decode_channels_pipelined(
        iter(batches), opts, ht, depth=2, device_batch=1,
        strict_hash_order=False))
    assert len(out) == 2
    # the race genuinely happened: at decode time the hash was untaught
    assert "<...>" in state["raw_user_calls"]
    # ...and yield-time re-resolution still delivered the teacher
    assert any(s.message == "PJ4/K1ABC 37" for s in out[0][0])
    spot = next(s for s in out[1][0] if s.ihash >= 0)
    assert spot.call == "<PJ4/K1ABC>"
    assert spot.message == "<PJ4/K1ABC> FK52UD 37"
    assert (spot.loc, spot.pwr) == ("FK52UD", "37")


def test_resolve_type3_spots_rebuilds_exact_fields():
    """resolve_type3_spots must rebuild call/message exactly as
    unpack_message would have with the hash taught — including the
    C's truncation quirks — and must not touch non-type-3 spots or
    still-unknown hashes."""
    from rtlsdr_wsprd_tpu.models.decoder import Spot
    from rtlsdr_wsprd_tpu.parallel.multichannel import resolve_type3_spots
    from rtlsdr_wsprd_tpu.utils.nhash import nhash

    def spot(**kw):
        base = dict(freq=14.0971, sync=0.5, snr=-10.0, dt=0.1, drift=0.0,
                    jitter=0, message="<...> FK52UD 37", call="<...>",
                    loc="FK52UD", pwr="37", cycles=10, ihash=-1)
        base.update(kw)
        return Spot(**base)

    taught = WsprHashTable()
    # teach by unpacking a REAL type-3 message with the hash known, to
    # get the oracle fields; a long compound call exercises truncation
    call = "PJ4/K1ABCDE"   # <PJ4/K1ABCDE> is 13 chars -> [:12] truncates
    ih = nhash(call)
    taught.put(ih, call)
    t1 = spot(ihash=ih)
    plain = spot(call="K1JT", message="K1JT FN20 37", loc="FN20")
    unknown = spot(ihash=(ih + 1) % 32768)
    got = resolve_type3_spots([[t1, plain, unknown]], taught)[0]
    assert got[0].call == "<PJ4/K1ABCDE"[:12]
    assert got[0].call == f"<{call}>"[:12]
    assert got[0].message == f"<{call}>"[:12] + " FK52UD 37"
    assert got[1] is plain        # untouched
    assert got[2] is unknown      # hash still unknown: stays <...>


def test_staged_bucket_pipeline_matches_single_bucket(batch_decode_env,
                                                      monkeypatch):
    """Stage-B buckets software-pipeline (bucket k+1 dispatched, with
    its host copies started, BEFORE bucket k's host FEC). Forcing many
    tiny buckets via LANE_BUCKETS must produce byte-identical spots to
    the one-bucket decode — the pipeline is a scheduling change only."""
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel import multichannel as mc

    wi, wq, expect = batch_decode_env
    opts = DecoderOptions(quickmode=True)
    want = mc.decode_channels(wi, wq, opts, device_batch=3)
    monkeypatch.setattr(mc, "LANE_BUCKETS", (1, 2))
    got = mc.decode_channels(wi, wq, opts, device_batch=3)
    as_tuples = [[(s.call, s.loc, s.pwr, s.message, s.freq, s.cycles)
                  for s in ch] for ch in want]
    assert [[(s.call, s.loc, s.pwr, s.message, s.freq, s.cycles)
             for s in ch] for ch in got] == as_tuples
    assert [sorted((s.call, s.loc, s.pwr) for s in ch)
            for ch in got] == expect


def test_prepare_windows_device_matches_host_feed(batch_decode_env):
    """Device-resident window planes wrapped by prepare_windows_device
    (the on-device front end's zero-round-trip feed) must decode
    identically to the float32 host feed — including the non-multiple
    device_batch padding path."""
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel.multichannel import (
        decode_channels,
        decode_channels_pipelined,
        prepare_windows_device,
    )

    wi, wq, expect = batch_decode_env
    h = prepare_windows_device(jnp.asarray(wi), jnp.asarray(wq),
                               device_batch=2)  # pads 3 -> 4 on device
    assert h.n_pad == 4
    out = list(decode_channels_pipelined(
        iter([h]), DecoderOptions(quickmode=True), device_batch=2))
    got = [sorted((s.call, s.loc, s.pwr) for s in ch) for ch in out[0]]
    ref = decode_channels(wi, wq, DecoderOptions(quickmode=True),
                          device_batch=2, transfer_dtype="float32")
    ref_got = [sorted((s.call, s.loc, s.pwr) for s in ch) for ch in ref]
    assert got == ref_got
    assert [g for g in got if g] == [e for e in expect if e]


def test_device_windows_replay_reproduces_state(rng):
    """After invalidate() (simulated worker crash) the replay log must
    rebuild the exact post-subtraction device state."""
    B = 3
    cur_i = rng.normal(0, .1, (B, 45000)).astype(np.float32)
    cur_q = rng.normal(0, .1, (B, 45000)).astype(np.float32)
    # float32 transfer: exact-equality assertions below; the default
    # int16 transfer path is covered by the decode-level parity tests
    # (it quantizes at -96 dB, so exact row equality doesn't hold)
    dw = _DeviceWindows(cur_i, cur_q, device_batch=3,
                        transfer_dtype="float32")
    syms = get_wspr_channel_symbols("K1JT FN20 37", WsprHashTable())
    dw.subtract(np.array([1, 0, 0], np.int32),
                np.array([12.0, 0, 0], np.float32),
                np.array([400, 0, 0], np.int32),
                np.array([0.5, 0, 0], np.float32),
                np.stack([syms, np.zeros(162, np.uint8),
                          np.zeros(162, np.uint8)]),
                np.array([True, False, False]))
    before_i = np.asarray(dw.arrays[0])
    dw.invalidate()
    after_i = np.asarray(dw.arrays[0])  # re-upload + replay
    assert np.array_equal(before_i, after_i)
    # row 1 actually changed vs the original; rows 0/2 untouched
    assert not np.allclose(before_i[1], cur_i[1])
    assert np.array_equal(before_i[0], cur_i[0])
    assert np.array_equal(before_i[2], cur_i[2])
    # and the subtraction row matches the reference-form single call
    ni, _ = subtract_signal2(
        jnp.asarray(cur_i[1]), jnp.asarray(cur_q[1]), jnp.float32(12.0),
        jnp.int32(400), jnp.float32(0.5), jnp.asarray(syms))
    assert np.allclose(before_i[1], np.asarray(ni), atol=1e-6)


def test_staged_pass_retries_after_device_crash(batch_decode_env, rng,
                                                monkeypatch):
    """A JaxRuntimeError from a stage-A dispatch must trigger
    re-upload + retry, not a failed decode (per-window failure
    isolation, SURVEY.md section 5)."""
    import jax
    import rtlsdr_wsprd_tpu.parallel.multichannel as mc

    wi, wq, expect = batch_decode_env
    real = mc._stage_a_packed
    state = {"fails": 1}

    def flaky(*a, **k):
        if state["fails"]:
            state["fails"] -= 1
            raise jax.errors.JaxRuntimeError("synthetic worker crash")
        return real(*a, **k)

    monkeypatch.setattr(mc, "_stage_a_packed", flaky)
    monkeypatch.setattr(mc.time, "sleep", lambda s: None)
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    spots = mc.decode_channels(wi, wq, DecoderOptions(quickmode=True),
                               device_batch=wi.shape[0])
    got = [sorted((s.call, s.loc, s.pwr) for s in ch) for ch in spots]
    assert got == expect
    assert state["fails"] == 0


def test_subtract_rows_padding_shares_row_safely(rng):
    """A disabled padding lane pointing at a row that an ENABLED lane
    updates must not clobber the update (delta-add scatter)."""
    B = 2
    cur_i = rng.normal(0, .1, (B, 45000)).astype(np.float32)
    cur_q = rng.normal(0, .1, (B, 45000)).astype(np.float32)
    syms = get_wspr_channel_symbols("K1JT FN20 37", WsprHashTable())
    out_i, _ = subtract_rows(
        jnp.asarray(cur_i), jnp.asarray(cur_q),
        jnp.asarray(np.array([0, 0], np.int32)),  # pad shares row 0
        jnp.asarray(np.array([12.0, 0.0], np.float32)),
        jnp.asarray(np.array([400, 0], np.int32)),
        jnp.asarray(np.array([0.5, 0.0], np.float32)),
        jnp.asarray(np.stack([syms, np.zeros(162, np.uint8)])),
        jnp.asarray(np.array([True, False])),
    )
    ni, _ = subtract_signal2(
        jnp.asarray(cur_i[0]), jnp.asarray(cur_q[0]), jnp.float32(12.0),
        jnp.int32(400), jnp.float32(0.5), jnp.asarray(syms))
    assert np.allclose(np.asarray(out_i)[0], np.asarray(ni), atol=1e-6)
    assert np.array_equal(np.asarray(out_i)[1], cur_i[1])


@pytest.mark.slow
def test_staged_full_schedule_oracle_parity(tmp_path):
    """The PRODUCTION staged path (decode_channels, quickmode=False:
    full lag grid + 43-jitter schedule + prefetch + host FEC) against
    the compiled reference oracle, field by field — the golden capture
    and a 3-signal window in one batch (VERDICT round-1 weak item 1:
    previously only the dense decode_window path had full-schedule
    oracle coverage)."""
    import oracle

    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel.multichannel import decode_channels
    from rtlsdr_wsprd_tpu.runtime import read_iq_file, synth_window_at_snr
    from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db

    if not oracle.available():
        pytest.skip("reference oracle unavailable")

    i0, q0 = read_iq_file("/root/reference/signals/refSignalSnr0dB.iq")
    msgs = ["K1JT FN20QI 20", "W1AW FN31PR 10", "VA2GKA FN35 37"]
    i1, q1 = synth_window_at_snr(msgs, snr_db=[5, -5, -15],
                                 f0=[-80, 0, 60], t0=[2.0, 1.0, 3.0],
                                 seed=7)
    i1, q1 = normalize_minus3db(i1, q1)
    wi = np.stack([i0, i1])
    wq = np.stack([q0, q1])

    opts = DecoderOptions(freq=14095600)
    assert not opts.quickmode
    spots = decode_channels(wi, wq, opts, device_batch=2,
                            transfer_dtype="float32")

    for ch, (ci, cq) in enumerate(((i0, q0), (i1, q1))):
        wd = tmp_path / f"ch{ch}"
        wd.mkdir(exist_ok=True)
        ref = oracle.wspr_decode_reference(
            ci, cq, dialfreq=14095600, workdir=str(wd))
        mine = spots[ch]
        assert [s.message for s in mine] == [s.message for s in ref]
        for m, r in zip(mine, ref):
            assert (m.call, m.loc, m.pwr) == (r.call, r.loc, r.pwr)
            assert m.freq == pytest.approx(r.freq, abs=0.5e-6)
            assert m.snr == pytest.approx(r.snr, abs=0.5)
            assert m.dt == pytest.approx(r.dt, abs=0.05)
            assert m.drift == pytest.approx(r.drift, abs=0.01)


def test_prepare_windows_path_matches_direct(batch_decode_env):
    """decode_channels(windows=prepare_windows(...)) — the pipelined
    double-buffer entry — must decode identically to the direct call."""
    from rtlsdr_wsprd_tpu.config import DecoderOptions
    from rtlsdr_wsprd_tpu.parallel.multichannel import (
        decode_channels,
        prepare_windows,
    )

    wi, wq, expect = batch_decode_env
    pw = prepare_windows(wi, wq, device_batch=wi.shape[0])
    spots = decode_channels(None, None, DecoderOptions(quickmode=True),
                            windows=pw)
    got = [sorted((s.call, s.loc, s.pwr) for s in ch) for ch in spots]
    assert got == expect
