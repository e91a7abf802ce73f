"""Batched multi-channel WSPR decoding.

The reference decodes exactly one channel, sequentially, per 2-minute
window (wsprd/wsprd.c:416-855). Here ``B`` channels decode together,
via one of two device strategies:

**Staged single-device path** (default; decode_channels without a
sharding): windows carry up to MAX_CANDIDATES=200 candidate slots but
real windows populate a handful, so the expensive correlator stages
must not run over the dense (window x candidate) grid. Stage A runs
the cheap per-window dense ops (STFT, candidate pick, coarse grid) in
fixed-size chunks; the host compacts every valid candidate across the
whole batch into a short lane axis (window-major, SNR-descending —
the reference's processing order); stage B runs fine sync + jitter
demod + FEC gates on just those lanes; FEC attempts then run in
host-driven rounds so each lane tries its gate-passing jitters in
schedule order until first success (wsprd/wsprd.c:739-766), with the
hybrid device-budget/native-straggler Fano (ops/fano_hybrid.py).
Window sample planes stay DEVICE-RESIDENT across passes
(_DeviceWindows): inter-pass subtraction applies on device and the
host keeps originals + a replay log for crash recovery.

**Mesh path** (decode_channels with a NamedSharding): one fully dense
device program — every stage vmapped over the channel axis, attempt
compaction on device via ``lax.top_k`` on a priority key reproducing
the reference's candidate-major, jitter-schedule order — sharded over
the mesh's ``ch`` axis (pure data parallelism; each window's decode
stays resident on one chip, SURVEY.md section 5, zero collectives).
The compaction's static attempt budget is checked against the
pre-cap gate count (``n_gate``): a pathological window passing more
gates than ``max_attempts`` is redecoded through the uncapped staged
path, so both paths decode every window with the reference's
unbounded first-success semantics (wsprd/wsprd.c:739-766).

Host code only unpacks messages, dedupes and drives the pass loop.
"""

from __future__ import annotations

import logging
import time
from dataclasses import replace as _dc_replace
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..config import (
    DT,
    MAX_CANDIDATES,
    MAX_UNIQUES,
    SIGNAL_SAMPLES,
    DecoderOptions,
)
from ..models.decoder import Spot
from ..ops.candidates import find_candidates
from ..ops.coarse import coarse_search
from ..ops.fano import batched_fano, build_mettab
from ..ops.fano_hybrid import host_finish, pending_mask
from ..ops.stft import power_spectrogram
from ..ops.subtract import (
    subtract_rows,
    subtract_signal2,
    subtract_signal2_many,
)
from ..ops.sync import (
    fine_sync,
    fine_sync_lanes,
    jitter_offsets,
    soft_symbols_jittered,
    soft_symbols_lanes,
)
from ..utils.channel import INTERLEAVE_PERM, get_wspr_channel_symbols
from ..utils.codec import unpack_message
from ..utils.hashtable import WsprHashTable
from .mesh import channel_sharding, replicated

_METTAB = build_mettab()
_LOG = logging.getLogger("rtlsdr_wsprd_tpu.multichannel")

# attempts decoded per channel per pass on the MESH path (priority =
# candidate-major, jitter order). The reference has no such cap but
# stops each candidate at first success; 128 attempts comfortably
# covers a busy band (observed gate counts on the golden capture are
# < 40), and a window whose pre-cap gate count exceeds the budget is
# redecoded through the uncapped staged path (decode_channels), so the
# cap never changes what decodes — only which path decodes it.
DEFAULT_MAX_ATTEMPTS = 128

# numpy, not jnp: a module-level jnp constant would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize for
# any program importing the framework first (parallel/distributed.py)
_BIG = np.int32(2**30)


class ChannelDecode(NamedTuple):
    """Fixed-shape per-channel decode products (leading axis = channel)."""

    snr: jnp.ndarray          # float32[B, C] candidate SNR, dB
    valid: jnp.ndarray        # bool[B, C] candidate validity
    freq: jnp.ndarray         # float32[B, C] fine freq, Hz (baseband)
    shift: jnp.ndarray        # int32[B, C] fine time shift, samples
    sync: jnp.ndarray         # float32[B, C] fine sync metric
    drift: jnp.ndarray        # float32[B, C] coarse drift, Hz/2min
    sel_cand: jnp.ndarray     # int32[B, K] candidate index per attempt
    sel_jit: jnp.ndarray      # int32[B, K] jitter index per attempt
    sel_valid: jnp.ndarray    # bool[B, K] attempt is live
    success: jnp.ndarray      # bool[B, K] Fano success
    data: jnp.ndarray         # uint8[B, K, 11] decoded bytes
    cycles: jnp.ndarray       # uint32[B, K] Fano cycle counts
    deint: jnp.ndarray        # uint8[B, K, 162] deinterleaved symbols
                              # (kept for the host straggler decoder)
    n_gate: jnp.ndarray       # int32[B] gate-passing attempts BEFORE
                              # the top-k cap; > max_attempts means the
                              # device compaction truncated (the host
                              # then redecodes that channel through the
                              # uncapped staged path)


def _decode_one_channel(
    sig_i: jnp.ndarray,
    sig_q: jnp.ndarray,
    maxdrift: jnp.ndarray,
    mettab: jnp.ndarray,
    *,
    fmin: float,
    fmax: float,
    lagstep: int,
    iifac: int,
    quickmode: bool,
    symfac: int,
    minsync1: float,
    minsync2: float,
    minrms: float,
    max_attempts: int,
    delta: int,
    maxcycles: int,
) -> ChannelDecode:
    """One channel's full device pass; vmapped over the batch axis.
    I/Q are planar float32 (no complex dtype on TPU)."""
    ps = power_spectrogram(sig_i, sig_q)
    cand = find_candidates(ps, fmin, fmax)
    coarse = coarse_search(ps, cand.bin_idx, maxdrift)
    fine = fine_sync(sig_i, sig_q, coarse.freq, coarse.shift, coarse.drift,
                     lagstep=lagstep)
    jit = soft_symbols_jittered(sig_i, sig_q, fine.freq, fine.shift,
                                coarse.drift, iifac=iifac,
                                quickmode=quickmode, symfac=symfac)

    # gates (wsprd/wsprd.c:733 and :758)
    worth = cand.valid & (fine.sync > minsync1)            # (C,)
    gate = (jit.sync > minsync2) & (jit.rms > minrms) & worth[None, :]

    # device-side compaction in the reference's attempt order:
    # candidates outer (SNR-descending), jitter schedule inner
    J, C = gate.shape
    prio = (jnp.arange(C, dtype=jnp.int32)[None, :] * J
            + jnp.arange(J, dtype=jnp.int32)[:, None])     # (J, C)
    key = jnp.where(gate, prio, _BIG)
    flat = key.T.reshape(-1)                               # index = c*J + j
    neg_vals, idxs = jax.lax.top_k(-flat, max_attempts)    # ascending key
    sel_valid = neg_vals > -_BIG
    sel_c = idxs // J
    sel_j = idxs - sel_c * J

    syms = jit.symbols[sel_j, sel_c]                       # (K, 162)
    deint = syms[:, INTERLEAVE_PERM]
    res = batched_fano(deint, mettab, delta=delta, maxcycles=maxcycles,
                       valid=sel_valid)

    return ChannelDecode(
        snr=cand.snr, valid=cand.valid,
        freq=fine.freq, shift=fine.shift, sync=fine.sync,
        drift=coarse.drift,
        sel_cand=sel_c, sel_jit=sel_j, sel_valid=sel_valid,
        success=res.success & sel_valid, data=res.data, cycles=res.cycles,
        deint=deint,
        n_gate=jnp.sum(gate, dtype=jnp.int32),
    )


@partial(
    jax.jit,
    static_argnames=("fmin", "fmax", "lagstep", "iifac", "quickmode",
                     "symfac", "minsync1", "minsync2", "minrms",
                     "max_attempts", "delta", "maxcycles"),
)
def multichannel_decode_device(
    sig_i: jnp.ndarray,
    sig_q: jnp.ndarray,
    maxdrift: jnp.ndarray,
    *,
    fmin: float = -110.0,
    fmax: float = 110.0,
    lagstep: int = 8,
    iifac: int = 3,
    quickmode: bool = False,
    symfac: int = 50,
    minsync1: float = 0.10,
    minsync2: float = 0.12,
    minrms: float = 52.0 * (50 / 64.0),
    max_attempts: int = DEFAULT_MAX_ATTEMPTS,
    delta: int = 60,
    maxcycles: int = 10000,
) -> ChannelDecode:
    """sig_i/sig_q: float32[B, SIGNAL_SAMPLES] planar windows;
    maxdrift: int32[B] -> ChannelDecode.

    Shard the window planes over the mesh ``ch`` axis (channel_sharding)
    and every array in the result inherits the same sharding — XLA runs
    the step fully parallel with zero collectives.
    """
    fn = partial(
        _decode_one_channel,
        mettab=jnp.asarray(_METTAB),
        fmin=fmin, fmax=fmax, lagstep=lagstep, iifac=iifac,
        quickmode=quickmode, symfac=symfac, minsync1=minsync1,
        minsync2=minsync2, minrms=minrms, max_attempts=max_attempts,
        delta=delta, maxcycles=maxcycles,
    )
    return jax.vmap(fn)(sig_i, sig_q, maxdrift)


@partial(
    jax.jit,
    static_argnames=("fmin", "fmax", "lagstep", "iifac", "quickmode",
                     "symfac", "minsync1", "minsync2", "minrms",
                     "max_attempts", "delta", "maxcycles"),
)
def _decode_device_packed(sig_i, sig_q, maxdrift, **kw):
    """Device step + packing into 3 arrays (host fetches through the
    tunnel pay per-array latency; 12 fetches -> 3)."""
    o = multichannel_decode_device(sig_i, sig_q, maxdrift, **kw)
    f32 = jnp.stack([
        o.snr, o.freq, o.sync, o.drift,
        o.valid.astype(jnp.float32), o.shift.astype(jnp.float32),
    ], axis=1)                                       # (B, 6, C)
    K = o.sel_cand.shape[1]
    i32 = jnp.stack([
        o.sel_cand, o.sel_jit, o.sel_valid.astype(jnp.int32),
        o.success.astype(jnp.int32), o.cycles.astype(jnp.int32),
        jnp.broadcast_to(o.n_gate[:, None], (o.n_gate.shape[0], K)),
    ], axis=1)                                       # (B, 6, K)
    return f32, i32, o.data, o.deint                 # + (B,K,11) (B,K,162)


# ---- staged single-device path: per-window search, then lane-compacted
# refinement ------------------------------------------------------------
#
# Windows carry up to MAX_CANDIDATES=200 candidate slots but real
# windows populate a handful (noise floor + peak gates,
# wsprd/wsprd.c:599-619), so running fine sync / jitter demod over the
# full (window x candidate) grid wastes ~98% of the device FLOPs.
# Stage A runs the cheap per-window dense ops (STFT, candidate pick,
# coarse grid — all O(window)); the host then compacts every valid
# candidate across the whole batch into a short lane axis and stage B
# runs the expensive correlator/FEC machinery on just those lanes.

LANE_BUCKETS = (16, 64, 256, 512, 1024)  # static stage-B lane shapes


@partial(jax.jit, static_argnames=("fmin", "fmax"))
def _stage_a_packed(sig_i, sig_q, maxdrift, *, fmin, fmax):
    """Per-window search: (B, 45000) x2 -> (B, 5, C) packed
    [snr, valid, coarse freq, coarse shift, coarse drift]."""

    def one(i, q, md):
        ps = power_spectrogram(i, q)
        cand = find_candidates(ps, fmin, fmax)
        co = coarse_search(ps, cand.bin_idx, md)
        return jnp.stack([
            cand.snr, cand.valid.astype(jnp.float32),
            co.freq, co.shift.astype(jnp.float32), co.drift,
        ])

    return jax.vmap(one)(sig_i, sig_q, maxdrift)


@partial(jax.jit, static_argnames=("fmin", "fmax"))
def _stage_a_rows(sig_i, sig_q, rows, maxdrift, *, fmin, fmax):
    """_stage_a_packed over a SUBSET of window rows: rows int32[DB]
    indexes into the full (n_pad, N) planes. Row picks are vmapped 2-D
    dynamic_slices (gather-free, same trick as sync._lane_windows).
    Later passes re-decode only the windows whose pass 0 found
    something (wsprd/wsprd.c:522) — this skips the rest entirely."""
    N = sig_i.shape[1]

    def pick(w):
        return (jax.lax.dynamic_slice(sig_i, (w, 0), (1, N))[0],
                jax.lax.dynamic_slice(sig_q, (w, 0), (1, N))[0])

    si, sq = jax.vmap(pick)(rows)
    return _stage_a_packed(si, sq, maxdrift, fmin=fmin, fmax=fmax)


@partial(
    jax.jit,
    static_argnames=("lagstep", "iifac", "quickmode", "symfac", "minsync1",
                     "minsync2", "minrms"),
)
def _stage_b_packed(sig_i, sig_q, lane_w, freq, shift, drift, lane_valid, *,
                    lagstep, iifac, quickmode, symfac, minsync1, minsync2,
                    minrms):
    """Lane-compacted refinement: fine sync + jitter demod + FEC gates
    over G lanes spanning the batch. FEC itself is driven by the host
    (_fano_rounds) so each lane tries its gate-passing jitters in
    schedule order until first success — the reference's jitter-loop
    semantics (wsprd/wsprd.c:739-766) — without a global attempt cap
    starving late lanes."""
    fine = fine_sync_lanes(sig_i, sig_q, lane_w, freq, shift, drift,
                           lagstep=lagstep)
    jit = soft_symbols_lanes(sig_i, sig_q, lane_w, fine.freq, fine.shift,
                             drift, iifac=iifac, quickmode=quickmode,
                             symfac=symfac)

    worth = lane_valid & (fine.sync > minsync1)            # (G,)
    gate = (jit.sync > minsync2) & (jit.rms > minrms) & worth[None, :]

    lane_f32 = jnp.stack([
        fine.freq, fine.shift.astype(jnp.float32), fine.sync,
    ])                                                     # (3, G)
    # deinterleave on device (pure permutation); (J, G, 162) uint8
    deint = jit.symbols[:, :, INTERLEAVE_PERM]

    # compact each lane's first PREFETCH_ATTEMPTS gate-passing jitters
    # (schedule order) for the host FEC — the near-universal case is
    # success within the first try or two, so the host fetches ~100 KB
    # instead of the dense (J, G, 162) symbol block; lanes needing more
    # pull their full column later via _compact_lane_columns
    J, G = gate.shape
    M = min(PREFETCH_ATTEMPTS, J)
    key = jnp.where(gate, jnp.arange(J, dtype=jnp.int32)[:, None],
                    jnp.int32(J))                          # (J, G)
    negv, _ = jax.lax.top_k(-key.T, M)
    pre_j = -negv          # (G, M) first M gate-passing j, ascending
    have = pre_j < J       # False slots: lane has fewer than M passers
    onehot = ((pre_j[:, :, None]
               == jnp.arange(J, dtype=jnp.int32)[None, None, :])
              & have[:, :, None])                          # (G, M, J)
    pre_syms = jnp.einsum(
        "gmj,jgs->gms", onehot.astype(jnp.float32),
        deint.astype(jnp.float32),
        preferred_element_type=jnp.float32).astype(jnp.uint8)
    return lane_f32, gate, pre_j, pre_syms, deint


FANO_BATCH = 512  # static shape of one device Fano call
SUBTRACT_LANES = 256  # cross-channel subtraction lanes per device call
PREFETCH_ATTEMPTS = 4  # per-lane FEC attempts fetched with stage B


@jax.jit
def _compact_lane_columns(deint: jnp.ndarray, lanes: jnp.ndarray):
    """Full jitter columns for the (rare) lanes that exhaust their
    prefetched attempts: deint uint8[J, G, 162], lanes int32[L] ->
    uint8[L, J, 162]. One-hot matmul, not a gather."""
    G = deint.shape[1]
    onehot = (lanes[:, None]
              == jnp.arange(G, dtype=lanes.dtype)).astype(jnp.float32)
    return jnp.einsum("lg,jgs->ljs", onehot, deint.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("delta", "maxcycles"))
def _fano_batch_packed(deint, valid, *, delta, maxcycles):
    res = batched_fano(deint, jnp.asarray(_METTAB), delta=delta,
                       maxcycles=maxcycles, valid=valid)
    return (res.success & valid), res.data, res.cycles


def _default_fec_mode() -> str:
    """Backend-calibrated host/hybrid choice (ops/calibrate.py).

    A tunneled while_loop costs ~1.5 ms PER ITERATION, so one device
    Fano round pays >100 ms in loop latency alone — while the native
    sequential decoder (native/hostdsp.cpp) finishes a clean attempt in
    ~25 us and even a full-budget timeout in ~12 ms. On such backends
    host-first FEC wins outright; locally attached chips keep the
    batched device search with host straggler finish. The decision is
    MEASURED per backend at first use (real device-decoder cycle cost vs
    native decode cost), with a platform sniff shortcutting known RPC
    tunnels and RTLSDR_WSPRD_TPU_FEC pinning it outright."""
    from ..ops.calibrate import get_fec_calibration

    return get_fec_calibration().mode


def _device_fano_budget(full_maxcycles: int) -> int:
    """Calibrated device-side Fano budget (ops/calibrate.py)."""
    from ..ops.calibrate import device_fano_budget

    return device_fano_budget(full_maxcycles)


def _map_lanes(fn, items):
    """Map ``fn`` over independent FEC lanes, threaded when the host
    has cores to spare (the per-lane native decode releases the GIL);
    plain loop on a 1-core host to avoid pool overhead. Results keep
    input order."""
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    workers = min(16, _os.cpu_count() or 1)
    items = list(items)
    if workers <= 1 or len(items) <= 1:
        return [fn(it) for it in items]
    with ThreadPoolExecutor(workers) as ex:
        return list(ex.map(fn, items))


def _fano_rounds_host_prefetch(gate: np.ndarray, pre_j: np.ndarray,
                               pre_syms: np.ndarray, fetch_rest,
                               delta: int, maxcycles: int):
    """Reference-order host FEC fed by the stage-B attempt prefetch:
    per lane, try gate-passing jitters in schedule order until first
    success (wsprd/wsprd.c:739-766). The first PREFETCH_ATTEMPTS
    attempts per lane arrive compacted with the stage-B fetch
    (pre_j int32[G, M], pre_syms uint8[G, M, 162]); only lanes that
    fail ALL of those — in practice the never-decoding gate survivors —
    pull their full jitter column via ``fetch_rest(lanes) ->
    uint8[L, J, 162]`` in one extra device call."""
    J, G = gate.shape
    M = pre_j.shape[1]
    t0 = time.perf_counter()
    n_att = [0] * G
    decoded: dict[int, tuple[int, bytes, int]] = {}
    deferred: list[tuple[int, int]] = []  # (lane, schedule pos to resume)

    # lanes are independent (first success is PER LANE) and the ctypes
    # decode releases the GIL, so lanes run threaded — undecodable
    # gate-passers each burn a full ~11-16 ms search budget (the
    # reference's 810k-cycle cap), which is the whole cost of this
    # phase. Measured (tools/fec_scaling.py, 2026-08-20): the GIL is
    # genuinely dropped for the whole search (a Python counter thread
    # keeps 54% of its solo rate while decodes saturate the core; a
    # held GIL would freeze it), thread dispatch costs ~45 us/lane
    # (0.3% of one timeout lane), and the worker sweep on this 1-core
    # box is flat (pool overhead <= 9% at 8 workers over 16 lanes) —
    # so on multicore hosts the sweep IS the scaling curve and lanes
    # divide by cores. Same pattern as native.fano_decode_many.
    def one_lane(g):
        js = np.nonzero(gate[:, g])[0]
        for idx, j in enumerate(js):
            if idx >= M:
                return ("defer", idx)
            if pre_j[g, idx] != j:
                # prefetch/schedule mismatch (should be impossible —
                # both orderings derive from the same gate tensor):
                # degrade to the full-column fetch for this lane
                # instead of poisoning the whole batch (VERDICT r3
                # weak item 8)
                _LOG.warning("lane %d: prefetch row %d holds jitter %d, "
                             "schedule expects %d; deferring lane",
                             g, idx, int(pre_j[g, idx]), int(j))
                return ("defer", idx)
            n_att[g] += 1
            ok, data, cycles, _m, _np = native.fano_decode(
                pre_syms[g, idx], _METTAB, delta=delta, maxcycles=maxcycles)
            if ok:
                return ("ok", (int(j), bytes(data), int(cycles)))
        return None

    results = _map_lanes(one_lane, range(G))
    for g, r in enumerate(results):
        if r is None:
            continue
        if r[0] == "ok":
            decoded[g] = r[1]
        else:
            deferred.append((g, r[1]))
    if deferred:
        cols = fetch_rest([g for g, _ in deferred])  # (L, J, 162)

        def one_deferred(item):
            li, (g, start) = item
            js = np.nonzero(gate[:, g])[0]
            for j in js[start:]:
                n_att[g] += 1
                ok, data, cycles, _m, _np = native.fano_decode(
                    cols[li, j], _METTAB, delta=delta, maxcycles=maxcycles)
                if ok:
                    return g, (int(j), bytes(data), int(cycles))
            return None

        for r in _map_lanes(one_deferred, list(enumerate(deferred))):
            if r is not None:
                decoded[r[0]] = r[1]
    _LOG.debug("fano host: %d attempts (%d deferred lanes), %d decodes, "
               "%.0f ms", sum(n_att), len(deferred), len(decoded),
               1e3 * (time.perf_counter() - t0))
    return decoded


def _fano_rounds_host(gate: np.ndarray, deint: np.ndarray, delta: int,
                      maxcycles: int):
    """Reference-order FEC entirely on the native host decoder: per
    lane, try gate-passing jitters in schedule order until the first
    success (wsprd/wsprd.c:739-766) — exactly the C's jitter loop, so
    results (including which jitter decodes and its cycle count) match
    the hybrid path bit for bit."""
    J, G = gate.shape
    t0 = time.perf_counter()
    n_att = [0] * G
    decoded: dict[int, tuple[int, bytes, int]] = {}

    def one_lane(g):
        for j in np.nonzero(gate[:, g])[0]:
            n_att[g] += 1
            ok, data, cycles, _m, _np = native.fano_decode(
                deint[j, g], _METTAB, delta=delta, maxcycles=maxcycles)
            if ok:
                return int(j), bytes(data), int(cycles)
        return None

    for g, r in enumerate(_map_lanes(one_lane, range(G))):
        if r is not None:
            decoded[g] = r
    _LOG.debug("fano host: %d attempts, %d decodes, %.0f ms",
               sum(n_att), len(decoded), 1e3 * (time.perf_counter() - t0))
    return decoded


def _fano_rounds(gate: np.ndarray, deint: np.ndarray, delta: int,
                 dev_maxcycles: int, full_maxcycles: int, device=None,
                 fec: str = "auto"):
    """Host-driven FEC: per lane, decode its gate-passing jitters in
    schedule order until the first success (wsprd/wsprd.c:739-766 "if
    worth_a_try... break on not_decoded==0"), batching FANO_BATCH
    attempts per device call across lanes, with hybrid straggler finish.
    ``fec='host'`` (the default on tunneled backends, see
    _default_fec_mode) skips the device rounds entirely.

    gate: bool[J, G]; deint: uint8[J, G, 162].
    Returns {lane: (jitter idx, data bytes, cycles)} first successes.
    """
    if fec == "auto":
        fec = _default_fec_mode()
    if fec == "host" and native.AVAILABLE:
        return _fano_rounds_host(gate, deint, delta, full_maxcycles)
    J, G = gate.shape
    pending = {g: [int(j) for j in np.nonzero(gate[:, g])[0]]
               for g in range(G) if gate[:, g].any()}
    decoded: dict[int, tuple[int, bytes, int]] = {}
    while pending:
        batch: list[tuple[int, int]] = []  # (lane, jitter)
        for g in sorted(pending):
            take = pending[g][:max(1, FANO_BATCH // max(len(pending), 1))]
            for j in take:
                batch.append((g, j))
            if len(batch) >= FANO_BATCH:
                batch = batch[:FANO_BATCH]
                break
        n = len(batch)
        syms = np.zeros((FANO_BATCH, 162), np.uint8)
        for a, (g, j) in enumerate(batch):
            syms[a] = deint[j, g]
        valid = np.zeros(FANO_BATCH, bool)
        valid[:n] = True
        t_dev = time.perf_counter()
        dsyms = (jax.device_put(syms, device) if device is not None
                 else jnp.asarray(syms))
        dvalid = (jax.device_put(valid, device) if device is not None
                  else jnp.asarray(valid))
        succ, data, cycles = (np.asarray(x) for x in _fano_batch_packed(
            dsyms, dvalid, delta=delta, maxcycles=dev_maxcycles))
        t_host = time.perf_counter()
        pend = pending_mask(succ, cycles, dev_maxcycles, full_maxcycles)
        pend &= valid
        if pend.any():
            # a pending attempt only matters if NO earlier jitter of the
            # same lane already decoded this round (first success wins,
            # wsprd/wsprd.c:762-766) — skip the rest of the stragglers
            first_succ: dict[int, int] = {}
            for a, (g, j) in enumerate(batch):
                if succ[a] and g not in first_succ:
                    first_succ[g] = a
            for a, (g, j) in enumerate(batch):
                if pend[a] and first_succ.get(g, FANO_BATCH) < a:
                    pend[a] = False
        if pend.any():
            succ, data, cycles = host_finish(
                syms, succ, data, cycles, pend, delta, full_maxcycles)
        _LOG.debug(
            "fano round: %d attempts over %d lanes, device %.0f ms, "
            "host-finish %d stragglers %.0f ms", n, len(pending),
            1e3 * (t_host - t_dev), int(pend.sum()),
            1e3 * (time.perf_counter() - t_host))
        for a, (g, j) in enumerate(batch):
            if g not in pending:
                continue  # earlier attempt this round already decoded g
            pending[g].remove(j)
            if succ[a] and g not in decoded:
                decoded[g] = (j, bytes(data[a]), int(cycles[a]))
                del pending[g]
            elif not pending[g]:
                del pending[g]
    return decoded


def _lane_bucket(n: int) -> int:
    for b in LANE_BUCKETS:
        if n <= b:
            return b
    return LANE_BUCKETS[-1]


def _unpack(f32: np.ndarray, i32: np.ndarray, data: np.ndarray,
            deint: np.ndarray) -> ChannelDecode:
    return ChannelDecode(
        snr=f32[:, 0], freq=f32[:, 1], sync=f32[:, 2], drift=f32[:, 3],
        valid=f32[:, 4] != 0.0, shift=f32[:, 5].astype(np.int32),
        sel_cand=i32[:, 0], sel_jit=i32[:, 1],
        sel_valid=i32[:, 2] != 0, success=i32[:, 3] != 0,
        cycles=i32[:, 4].astype(np.uint32), data=data, deint=deint,
        n_gate=i32[:, 5, 0],
    )


def _finish_stragglers(out: ChannelDecode,
                       options: DecoderOptions) -> ChannelDecode:
    """Host side of the hybrid FEC decode: lanes that hit the device
    Fano budget re-run on the native sequential decoder with the full
    reference budget (ops/fano_hybrid.py)."""
    dev_mc = _device_fano_budget(options.maxcycles)
    B, K = out.success.shape
    succ = out.success.reshape(-1)
    cyc = out.cycles.reshape(-1)
    pend = pending_mask(succ, cyc, dev_mc, options.maxcycles)
    pend &= out.sel_valid.reshape(-1)
    if not pend.any():
        return out
    _LOG.debug("host-finishing %d straggler lanes", int(pend.sum()))
    data = out.data.reshape(-1, 11)
    deint = out.deint.reshape(-1, 162)
    succ, data, cyc = host_finish(deint, succ, data, cyc, pend,
                                  options.delta, options.maxcycles)
    return out._replace(success=succ.reshape(B, K),
                        data=data.reshape(B, K, 11),
                        cycles=cyc.reshape(B, K))


def _collect_channel_spots(
    b: int,
    out,
    jit_offs: np.ndarray,
    options: DecoderOptions,
    ht: WsprHashTable,
    seen: list[tuple[str, float]],
    uniques: list[Spot],
    ipass: int,
) -> list[tuple[int, str]]:
    """Host side of one channel's pass: first-success-per-candidate,
    then shared emit. Used by the mesh (ChannelDecode) path."""
    decoded: dict[int, tuple[int, bytes, int]] = {}
    K = out.sel_valid.shape[1]
    for a in range(K):
        if not out.sel_valid[b, a] or not out.success[b, a]:
            continue
        c = int(out.sel_cand[b, a])
        if c not in decoded:
            decoded[c] = (int(out.sel_jit[b, a]), bytes(out.data[b, a]),
                          int(out.cycles[b, a]))
    tbl = dict(freq=out.freq, sync=out.sync, snr=out.snr,
               shift=out.shift, drift=out.drift)
    return _emit_channel_spots(b, decoded, tbl, jit_offs, options, ht,
                               seen, uniques, ipass)


def _emit_channel_spots(
    b: int,
    decoded: dict[int, tuple[int, bytes, int]],
    tbl: dict[str, np.ndarray],
    jit_offs: np.ndarray,
    options: DecoderOptions,
    ht: WsprHashTable,
    seen: list[tuple[str, float]],
    uniques: list[Spot],
    ipass: int,
) -> list[tuple[int, str]]:
    """Unpack + dedupe one channel's first-success decodes; returns
    (candidate, message) pairs to subtract. ``tbl`` holds (B, C)
    per-candidate arrays. Mirrors models/decoder.py and
    wsprd/wsprd.c:768-822."""
    new_decodes: list[tuple[int, str]] = []
    for c in sorted(decoded):
        j, data, cycles = decoded[c]
        msg = unpack_message([x if x < 128 else x - 256 for x in data[:11]],
                             ht)
        if msg is None or msg.loc == "A000AA":
            continue
        freq_c = float(tbl["freq"][b, c])
        if any(msg.callsign == s_call and abs(freq_c - s_freq) < 3.0
               for s_call, s_freq in seen):
            continue
        if len(uniques) >= MAX_UNIQUES:
            break  # result buffer bound (wsprd/wsprd.h:41)
        seen.append((msg.callsign, freq_c))
        uniques.append(Spot(
            freq=options.freq / 1e6 + (1500.0 + freq_c) / 1e6,
            sync=float(tbl["sync"][b, c]),
            snr=float(tbl["snr"][b, c]),
            dt=float(tbl["shift"][b, c]) * DT - 2.0,
            drift=float(tbl["drift"][b, c]),
            jitter=int(jit_offs[j]),
            message=msg.call_loc_pow,
            call=msg.call, loc=msg.loc, pwr=msg.pwr,
            cycles=cycles, noprint=msg.noprint, ihash=msg.ihash,
        ))
        if options.subtraction and ipass == 0 and not msg.noprint:
            new_decodes.append((c, msg.call_loc_pow))
    return new_decodes


_I16_SCALE = np.float32(65534.0)  # windows are -3 dB normalized (±0.5)
_I8_SCALE = np.float32(254.0)


@jax.jit
def _dequant_i16(xi16: jnp.ndarray) -> jnp.ndarray:
    return xi16.astype(jnp.float32) * (1.0 / _I16_SCALE)


@jax.jit
def _dequant_i8(xi8: jnp.ndarray) -> jnp.ndarray:
    return xi8.astype(jnp.float32) * (1.0 / _I8_SCALE)


def _fetch_np(*refs):
    """Fetch device arrays to host with the copies overlapped.

    Serial ``np.asarray`` pays one device->host round trip per array;
    on RPC-tunneled backends (~26 ms RTT measured) that latency rivals
    the staged path's compute when a pass fetches several small
    results. Putting every transfer in flight first collapses N round
    trips into roughly one."""
    for r in refs:
        try:
            r.copy_to_host_async()
        except Exception:  # backend without async copy: plain fetch
            break
    return tuple(np.asarray(r) for r in refs)


class _DeviceWindows:
    """Device-resident padded window planes with crash recovery.

    Holds (n_pad, SIGNAL_SAMPLES) planar I/Q on device across passes so
    subtraction never round-trips the sample data through the host.
    The ORIGINAL windows stay canonical on host and every subtraction
    round is logged; if the accelerator worker crashes (observed on
    tunneled single-chip setups), ``invalidate()`` + next ``arrays``
    rebuilds the state by re-uploading and replaying the log
    (SURVEY.md section 5, failure detection / per-window isolation).

    Transfer format: windows are -3 dB peak-normalized (±0.5,
    rtlsdr_wsprd.c:291-305), so by default they cross the host->device
    link as int8 at a quarter of the bytes and dequantize on device
    (one fused cast). The ±2e-3 rounding error is ~-48 dB below peak,
    i.e. ~-35 dB below the channel noise that dominates any window
    with decodable (<= 0 dB SNR) content — measured decode rates at
    the sensitivity floor (-28..-30 dB in 2500 Hz) are identical to
    int16/float32 transfer, and an 8-bit SDR front end quantizes
    coarser than this to begin with. ``transfer_dtype='int16'`` (-96
    dB) and ``'float32'`` (exact) are available for paranoia."""

    def __init__(self, cur_i: np.ndarray, cur_q: np.ndarray,
                 device_batch: int, transfer_dtype: str = "int8",
                 device=None):
        self.device = device
        self.device_batch = device_batch
        B = cur_i.shape[0]
        self.B = B
        self.n_pad = -(-B // device_batch) * device_batch
        self._tdt = transfer_dtype
        dt = {"int16": np.int16, "int8": np.int8,
              "float32": np.float32}[transfer_dtype]
        self._host_i = np.zeros((self.n_pad, cur_i.shape[1]), dt)
        self._host_q = np.zeros((self.n_pad, cur_q.shape[1]), dt)
        if transfer_dtype == "float32":
            self._host_i[:B] = cur_i
            self._host_q[:B] = cur_q
        else:
            scale = _I16_SCALE if transfer_dtype == "int16" else _I8_SCALE
            # NaN windows quantize silently to 0 (the decode itself is
            # per-window failure-isolated); native single-pass quantizer
            native.quantize_into(np.ascontiguousarray(cur_i, np.float32),
                                 self._host_i[:B], scale)
            native.quantize_into(np.ascontiguousarray(cur_q, np.float32),
                                 self._host_q[:B], scale)
        self._log: list[tuple] = []
        self._di = self._dq = None

    @classmethod
    def from_device(cls, di: jnp.ndarray, dq: jnp.ndarray,
                    device_batch: int, device=None) -> "_DeviceWindows":
        """Wrap ALREADY-DEVICE-RESIDENT float32 (B, SIGNAL_SAMPLES)
        planes — windows assembled by the on-device front end — as a
        decode handle: zero host round-trip of sample data. No host
        canonical copy exists, so the crash-replay path is unavailable;
        a worker crash propagates instead of replaying (the producer
        owns recovery, e.g. by re-running its front-end chain)."""
        self = cls.__new__(cls)
        self.device = device
        self.device_batch = device_batch
        B = di.shape[0]
        self.B = B
        self.n_pad = -(-B // device_batch) * device_batch
        if self.n_pad != B:
            di = jnp.pad(di, ((0, self.n_pad - B), (0, 0)))
            dq = jnp.pad(dq, ((0, self.n_pad - B), (0, 0)))
        self._tdt = "device"
        self._host_i = self._host_q = None
        self._log = []
        self._di, self._dq = di, dq
        return self

    @property
    def arrays(self):
        if self._di is None and self._host_i is None:
            raise RuntimeError(
                "device-fed window handle lost its arrays (worker "
                "crash?); no host copy exists to replay from")
        if self._di is None:
            def put(x):
                return (jax.device_put(x, self.device)
                        if self.device is not None else jnp.asarray(x))
            if self._tdt == "float32":
                self._di = put(self._host_i)
                self._dq = put(self._host_q)
            else:
                deq = _dequant_i16 if self._tdt == "int16" else _dequant_i8
                self._di = deq(put(self._host_i))
                self._dq = deq(put(self._host_q))
            for args in self._log:  # replay after a worker crash
                self._apply(args)
        return self._di, self._dq

    def invalidate(self):
        self._di = self._dq = None

    def subtract(self, bidx, f0, shift, drift, symbols, enable):
        args = (bidx, f0, shift, drift, symbols, enable)
        _ = self.arrays  # materialize (replays older rounds) FIRST
        self._log.append(args)  # then log this round for future replays
        self._apply(args)

    def _apply(self, args):
        bidx, f0, shift, drift, symbols, enable = args
        self._di, self._dq = subtract_rows(
            self._di, self._dq, jnp.asarray(bidx), jnp.asarray(f0),
            jnp.asarray(shift), jnp.asarray(drift), jnp.asarray(symbols),
            jnp.asarray(enable))


def _staged_pass(
    dw: _DeviceWindows,
    active: list[int],
    maxdrift_val: int,
    kw: dict,
    device_batch: int,
    options: DecoderOptions,
    fec: str = "auto",
):
    """One pass of the staged single-device path: chunked stage A
    (per-window search, dispatched async), host lane compaction
    restricted to the ``active`` windows, stage B per lane bucket,
    host-driven FEC rounds. Returns (decoded_by_b, tbl):
    decoded_by_b[b][c] = (jitter idx, data bytes, cycles) first-success
    decodes; tbl = (B, C) per-candidate arrays for spot fields (fine
    values at decoded lanes, coarse elsewhere)."""
    B = dw.B
    C = MAX_CANDIDATES
    n_pad = dw.n_pad
    md = jnp.full((device_batch,), maxdrift_val, jnp.int32)

    # ---- stage A: dispatch every chunk, then fetch (async overlap) ----
    # later passes re-decode only active windows (wsprd/wsprd.c:522):
    # when that set is smaller than the padded batch, compact their
    # rows into fewer chunks via the row-sliced variant
    act = sorted(active)
    n_act_pad = -(-max(len(act), 1) // device_batch) * device_batch
    rows = None
    if act and n_act_pad < n_pad:
        rows = np.full(n_act_pad, act[-1], np.int32)
        rows[:len(act)] = act
    sA = np.zeros((n_pad, 5, C), np.float32)
    for attempt in range(3):
        try:
            sig_i, sig_q = dw.arrays
            if rows is not None:
                refs = [(c0, _stage_a_rows(
                    sig_i, sig_q, jnp.asarray(rows[c0:c0 + device_batch]),
                    md, fmin=kw["fmin"], fmax=kw["fmax"]))
                    for c0 in range(0, n_act_pad, device_batch)]
                vals = _fetch_np(*(r for _, r in refs))
                for (c0, _), v in zip(refs, vals):
                    sA[rows[c0:c0 + device_batch]] = v
            else:
                refs = [(c0, _stage_a_packed(
                    sig_i[c0:c0 + device_batch],
                    sig_q[c0:c0 + device_batch],
                    md, fmin=kw["fmin"], fmax=kw["fmax"]))
                    for c0 in range(0, n_pad, device_batch)]
                vals = _fetch_np(*(r for _, r in refs))
                for (c0, _), v in zip(refs, vals):
                    sA[c0:c0 + device_batch] = v
            break
        except jax.errors.JaxRuntimeError as e:
            _LOG.warning("stage A crashed (attempt %d): %s",
                         attempt, str(e)[:80])
            if attempt == 2:
                raise
            time.sleep(5.0 * (attempt + 1))
            dw.invalidate()  # worker restarted: re-upload + replay
            md = jnp.full((device_batch,), maxdrift_val, jnp.int32)
    sA = sA[:B]
    _LOG.debug("stage A done (%d windows)", B)

    valid_a = sA[:, 1] != 0.0
    tbl = {
        "snr": sA[:, 0].copy(), "freq": sA[:, 2].copy(),
        "sync": np.zeros((B, C), np.float32),
        "shift": sA[:, 3].copy(), "drift": sA[:, 4].copy(),
    }  # fine values overwrite freq/shift/sync at processed lanes

    decoded_by_b: dict[int, dict[int, tuple[int, bytes, int]]] = {
        b: {} for b in range(B)}
    active_mask = np.zeros(B, bool)
    active_mask[active] = True
    # lanes: window-major, SNR-desc within window, active windows only
    wa, cc = np.nonzero(valid_a & active_mask[:, None])
    G = wa.size
    if G == 0:
        return decoded_by_b, tbl
    _LOG.debug("stage B: %d lanes over %d active windows", G, len(active))

    b_kw = {k: kw[k] for k in (
        "lagstep", "iifac", "quickmode", "symfac", "minsync1", "minsync2",
        "minrms")}
    fec_mode = fec if fec != "auto" else _default_fec_mode()
    host_fec = fec_mode == "host" and native.AVAILABLE

    # bucket work-list up front so buckets can software-pipeline:
    # bucket k+1's stage B is DISPATCHED (and its host copies started)
    # before bucket k's host FEC runs — stage B never depends on FEC
    # within a pass, so the device computes and streams the next
    # bucket's results while the CPU decodes the current one's
    buckets = []
    for l0 in range(0, G, LANE_BUCKETS[-1]):
        l1 = min(l0 + LANE_BUCKETS[-1], G)
        n = l1 - l0
        bucket = _lane_bucket(n)
        sel_w = wa[l0:l1]
        sel_c = cc[l0:l1]
        lw = np.zeros(bucket, np.int32)
        lf = np.zeros(bucket, np.float32)
        ls = np.zeros(bucket, np.int32)
        ld = np.zeros(bucket, np.float32)
        lv = np.zeros(bucket, bool)
        lw[:n] = sel_w
        lf[:n] = sA[sel_w, 2, sel_c]
        ls[:n] = sA[sel_w, 3, sel_c].astype(np.int32)
        ld[:n] = sA[sel_w, 4, sel_c]
        lv[:n] = True
        buckets.append((l0, l1, n, sel_w, sel_c, (lw, lf, ls, ld, lv)))

    def _dispatch_bucket(lanes):
        """Dispatch one bucket's stage B and start its host copies
        (asynchronous on both counts)."""
        sig_i, sig_q = dw.arrays
        pk = _stage_b_packed(sig_i, sig_q,
                             *(jnp.asarray(a) for a in lanes), **b_kw)
        for r in (pk[:4] if host_fec else pk[:2]):
            try:
                r.copy_to_host_async()
            except Exception:  # backend without async copy
                break
        return pk

    pending = _dispatch_bucket(buckets[0][5])
    for idx, (l0, l1, n, sel_w, sel_c, lanes) in enumerate(buckets):
        # stage B + FEC, all inside the crash-retry envelope: the
        # deferred column fetch and the hybrid device Fano rounds talk
        # to the device too, and a worker restart anywhere in the
        # bucket is recovered the same way (invalidate + re-upload +
        # replay; every step is deterministic, so re-running is safe)
        for attempt in range(3):
            try:
                pk = pending if pending is not None else (
                    _dispatch_bucket(lanes))
                pending = None
                nxt = (_dispatch_bucket(buckets[idx + 1][5])
                       if idx + 1 < len(buckets) else None)
                deint_ref = pk[4]
                if host_fec:
                    lane_f32, gate, pre_j, pre_syms = _fetch_np(*pk[:4])
                else:
                    lane_f32, gate = _fetch_np(*pk[:2])
                _LOG.debug("stage B fetch done (%d gate-passing attempts)",
                           int(gate.sum()))
                if host_fec:
                    # host FEC reads the per-lane attempt prefetch and
                    # pulls rare extra columns on demand; the dense
                    # (J, G, 162) block never crosses the link

                    def fetch_rest(lanes, _ref=deint_ref):
                        L = len(lanes)
                        bkt = next(k for k in LANE_BUCKETS if L <= k)
                        lv_ = np.full(bkt, lanes[0], np.int32)
                        lv_[:L] = lanes
                        return np.asarray(_compact_lane_columns(
                            _ref, jnp.asarray(lv_)))[:L]

                    decoded = _fano_rounds_host_prefetch(
                        gate[:, :n], pre_j[:n], pre_syms[:n], fetch_rest,
                        options.delta, options.maxcycles)
                else:
                    deint = np.asarray(deint_ref)
                    decoded = _fano_rounds(gate[:, :n], deint[:, :n],
                                           options.delta, kw["maxcycles"],
                                           options.maxcycles,
                                           device=dw.device, fec=fec_mode)
                pending = nxt
                break
            except jax.errors.JaxRuntimeError as e:
                # any pre-dispatched next-bucket refs died with the
                # worker; drop them and let the next iteration
                # re-dispatch against the replayed state
                pending = None
                _LOG.warning("stage B/FEC crashed (lanes %d:%d, "
                             "attempt %d): %s", l0, l1, attempt,
                             str(e)[:80])
                if attempt == 2:
                    raise
                time.sleep(5.0 * (attempt + 1))
                dw.invalidate()  # worker restarted: re-upload + replay

        # fine sync values into the spot table at lane positions
        tbl["freq"][sel_w, sel_c] = lane_f32[0, :n]
        tbl["shift"][sel_w, sel_c] = lane_f32[1, :n]
        tbl["sync"][sel_w, sel_c] = lane_f32[2, :n]
        _LOG.debug("fano rounds done (%d decodes)", len(decoded))
        for g, (j, data, cycles) in decoded.items():
            decoded_by_b[int(sel_w[g])][int(sel_c[g])] = (j, data, cycles)
    return decoded_by_b, tbl


def prepare_windows(
    i_windows: np.ndarray,
    q_windows: np.ndarray,
    device_batch: int = 8,
    transfer_dtype: str = "int8",
    device=None,
) -> _DeviceWindows:
    """Quantize a window batch and START its host->device upload.

    ``jax.device_put`` is asynchronous, so preparing batch k+1 while
    batch k decodes overlaps the (bandwidth-bound) sample transfer with
    device compute — the TPU analog of the reference's RX/decode double
    buffer (rtlsdr_wsprd.c:75-91): samples for the next 2-minute window
    always arrive while the current one decodes. Pass the handle to
    ``decode_channels(windows=...)``; i_windows/q_windows as there.
    """
    cur_i = np.asarray(i_windows, np.float32)
    cur_q = np.asarray(q_windows, np.float32)
    assert cur_i.ndim == 2 and cur_i.shape[1] == SIGNAL_SAMPLES
    assert cur_i.shape == cur_q.shape
    dw = _DeviceWindows(cur_i, cur_q, device_batch,
                        transfer_dtype=transfer_dtype, device=device)
    dw.arrays  # dispatch the upload now; consumers rendezvous later
    return dw


def prepare_windows_device(
    di: jnp.ndarray,
    dq: jnp.ndarray,
    device_batch: int = 8,
    device=None,
) -> _DeviceWindows:
    """Wrap device-resident float32 (B, SIGNAL_SAMPLES) planar windows
    (e.g. assembled from the on-device front end's baseband) as a
    decode handle — the zero-host-round-trip feed for
    ``decode_channels(windows=...)`` / ``decode_channels_pipelined``.
    See _DeviceWindows.from_device for crash-recovery semantics."""
    assert di.ndim == 2 and di.shape[1] == SIGNAL_SAMPLES
    assert di.shape == dq.shape
    return _DeviceWindows.from_device(di, dq, device_batch, device=device)


def decode_channels(
    i_windows: np.ndarray | None,
    q_windows: np.ndarray | None,
    options: DecoderOptions = DecoderOptions(),
    hashtable: WsprHashTable | None = None,
    sharding=None,
    max_attempts: int = DEFAULT_MAX_ATTEMPTS,
    device_batch: int = 8,
    transfer_dtype: str = "int8",
    device=None,
    windows: _DeviceWindows | None = None,
    fec: str = "auto",
) -> list[list[Spot]]:
    """Decode B channels' 120 s windows in one batched device program.

    i_windows/q_windows: float32[B, SIGNAL_SAMPLES] planar I/Q (already
    -3 dB normalized). ``sharding``: optional NamedSharding for the
    channel axis (see parallel.mesh.channel_sharding); None runs on the
    default device. ``transfer_dtype``: host->device sample format of
    the staged path (see _DeviceWindows; 'float32' for exact transfer).
    ``windows``: a prepare_windows() handle (staged path only) whose
    upload was dispatched earlier; i_windows/q_windows may be None then.
    ``fec``: 'hybrid' = batched device Fano + native straggler finish,
    'host' = native sequential decoder only (identical results; faster
    on RPC-tunneled backends), 'auto' = pick per backend
    (_default_fec_mode). Returns per-channel Spot lists, each sorted by
    SNR descending.
    """
    ht = hashtable if hashtable is not None else WsprHashTable()
    if windows is not None:
        if sharding is not None:
            raise ValueError("windows= is the staged path; no sharding")
        cur_i = cur_q = None
        B = windows.B
        device_batch = windows.device_batch
    else:
        cur_i = np.asarray(i_windows, np.float32)
        cur_q = np.asarray(q_windows, np.float32)
        assert cur_i.ndim == 2 and cur_i.shape[1] == SIGNAL_SAMPLES
        assert cur_i.shape == cur_q.shape
        B = cur_i.shape[0]
    if sharding is not None:
        # mutable COPIES: the mesh path's subtraction writes into these
        # and the caller's buffers must never be mutated. The staged
        # path never mutates (device-resident subtraction) so it reads
        # the caller's arrays directly.
        cur_i = np.array(cur_i)
        cur_q = np.array(cur_q)

    def upload():
        si = jax.device_put(jnp.asarray(cur_i), sharding)
        sq = jax.device_put(jnp.asarray(cur_q), sharding)
        return si, sq

    sig_i = sig_q = None
    dw = windows
    if sharding is not None:
        sig_i, sig_q = upload()

    lagstep = 16 if options.quickmode else 8
    jit_offs = jitter_offsets(options.iifac, options.quickmode)
    kw = dict(
        fmin=options.fmin, fmax=options.fmax, lagstep=lagstep,
        iifac=options.iifac, quickmode=options.quickmode,
        symfac=options.symfac, minsync1=options.minsync1,
        minsync2=options.minsync2, minrms=options.minrms,
        max_attempts=max_attempts, delta=options.delta,
        # hybrid FEC: the device runs a small calibrated budget;
        # stragglers are finished on the host (_finish_stragglers)
        maxcycles=_device_fano_budget(options.maxcycles),
    )

    uniques: list[list[Spot]] = [[] for _ in range(B)]
    seen: list[list[tuple[str, float]]] = [[] for _ in range(B)]
    # subtraction re-encodes each decoded message; memoize per call —
    # the same transmission routinely decodes on many channels, and
    # re-encoding an identical message is idempotent (same packed bits,
    # same hashtable insert)
    sym_cache: dict[str, np.ndarray | None] = {}

    for ipass in range(options.npasses):
        if ipass == 1 and not any(uniques):
            break  # wsprd/wsprd.c:522 (per-batch: nothing to subtract)
        maxdrift_val = options.maxdrift if ipass < 2 else 0
        # third-and-later passes relax minsync2 to 0.10 and freeze
        # drift (wsprd/wsprd.c:528-531; dead under default npasses=2)
        kw = dict(kw, minsync2=options.minsync2 if ipass < 2 else 0.10)
        if sharding is not None:
            # mesh path: one call, channels sharded over devices (the
            # per-device slice is the memory unit)
            md = jax.device_put(jnp.full((B,), maxdrift_val, jnp.int32),
                                sharding)
            pk = _decode_device_packed(sig_i, sig_q, md, **kw)
            out = _unpack(*(np.asarray(a) for a in pk))
            out = _finish_stragglers(out, options)
            tbl = None
            # a pathological window can pass more gates than the
            # device compaction's static attempt budget; the dropped
            # attempts are exactly the ones the reference would still
            # try (it has no cap, wsprd/wsprd.c:739-766). Redecode
            # those channels through the UNCAPPED staged path — same
            # attempt order, host-driven rounds — so both paths share
            # one semantics (VERDICT r4 weak item 3).
            ovf = [b for b in range(B)
                   if int(out.n_gate[b]) > max_attempts
                   and (ipass == 0 or uniques[b])]  # wsprd.c:522
            ovf_map: dict[int, int] = {}
            o_decoded = o_tbl = None
            if ovf:
                _LOG.info(
                    "mesh attempt cap overflow on %d channel(s) "
                    "(max n_gate=%d > %d); staged redecode",
                    len(ovf), max(int(out.n_gate[b]) for b in ovf),
                    max_attempts)
                ovf_map = {b: k for k, b in enumerate(ovf)}
                odw = _DeviceWindows(
                    np.asarray(cur_i[ovf]), np.asarray(cur_q[ovf]),
                    min(8, len(ovf)), transfer_dtype="float32")
                o_decoded, o_tbl = _staged_pass(
                    odw, list(range(len(ovf))), maxdrift_val, kw,
                    odw.device_batch, options, fec=fec)
        else:
            # staged single-device path: per-window search, then
            # lane-compacted refinement (pass 1 re-decodes only the
            # channels whose pass 0 found something, wsprd/wsprd.c:522)
            if dw is None:
                dw = _DeviceWindows(cur_i, cur_q, device_batch,
                                    transfer_dtype=transfer_dtype,
                                    device=device)
            active = [b for b in range(B) if ipass == 0 or uniques[b]]
            decoded_by_b, tbl = _staged_pass(
                dw, active, maxdrift_val, kw, device_batch, options,
                fec=fec)

        # collect this pass's new decodes per channel, then subtract in
        # vmapped ROUNDS: round r applies each channel's r-th decode
        # (same-channel decodes stay sequential, matching the C's order
        # wsprd/wsprd.c:781-789; cross-channel lanes run in parallel)
        subs: dict[int, list[tuple]] = {}
        for b in range(B):
            if ipass == 1 and not uniques[b]:
                continue  # this channel's pass 0 was empty (wsprd.c:522)
            row = b
            if tbl is None:
                if b in ovf_map:
                    # this channel's decode came from the uncapped
                    # staged redecode; its tables are row-indexed
                    row = ovf_map[b]
                    new_decodes = _emit_channel_spots(
                        row, o_decoded[row], o_tbl, jit_offs, options,
                        ht, seen[b], uniques[b], ipass)
                    freq_s, shift_s, drift_s = (
                        o_tbl["freq"], o_tbl["shift"], o_tbl["drift"])
                else:
                    new_decodes = _collect_channel_spots(
                        b, out, jit_offs, options, ht, seen[b],
                        uniques[b], ipass)
                    freq_s, shift_s, drift_s = (
                        out.freq, out.shift, out.drift)
            else:
                new_decodes = _emit_channel_spots(
                    b, decoded_by_b[b], tbl, jit_offs, options, ht,
                    seen[b], uniques[b], ipass)
                freq_s, shift_s, drift_s = (
                    tbl["freq"], tbl["shift"], tbl["drift"])
            for c, call_loc_pow in new_decodes:
                if call_loc_pow in sym_cache:
                    chan_syms = sym_cache[call_loc_pow]
                else:
                    cs = get_wspr_channel_symbols(call_loc_pow, ht)
                    chan_syms = (None if cs is None
                                 else np.asarray(cs, np.uint8))
                    sym_cache[call_loc_pow] = chan_syms
                if chan_syms is None:
                    continue
                subs.setdefault(b, []).append((
                    float(freq_s[row, c]), int(shift_s[row, c]),
                    float(drift_s[row, c]), chan_syms))
        if subs:
            n_rounds = max(len(v) for v in subs.values())
            _LOG.debug("subtracting %d decodes in %d rounds",
                       sum(len(v) for v in subs.values()), n_rounds)
            # subtraction lanes amortize well past device_batch (the
            # per-lane synthesis/FIR work is tiny once batched); pad
            # each group to a static bucket to bound recompiles
            lane_n = max(device_batch, SUBTRACT_LANES)
            for r in range(n_rounds):
                lanes = [(b, *subs[b][r]) for b in sorted(subs)
                         if len(subs[b]) > r]
                for l0 in range(0, len(lanes), lane_n):
                    grp = lanes[l0:l0 + lane_n]
                    n = len(grp)
                    padded = next(k for k in (16, 64, lane_n) if n <= k)
                    pad = padded - n
                    bidx = np.array([g[0] for g in grp] + [0] * pad)
                    f0s = np.array([g[1] for g in grp] + [0.0] * pad,
                                   np.float32)
                    shs = np.array([g[2] for g in grp] + [0] * pad, np.int32)
                    drs = np.array([g[3] for g in grp] + [0.0] * pad,
                                   np.float32)
                    syms = np.stack([g[4] for g in grp]
                                    + [np.zeros(162, np.uint8)] * pad)
                    en = np.array([True] * n + [False] * pad)
                    if sharding is None:
                        # device-resident rows: no sample round-trip
                        dw.subtract(bidx.astype(np.int32), f0s, shs, drs,
                                    syms, en)
                        continue
                    ni, nq = subtract_signal2_many(
                        jnp.asarray(cur_i[bidx]), jnp.asarray(cur_q[bidx]),
                        jnp.asarray(f0s), jnp.asarray(shs), jnp.asarray(drs),
                        jnp.asarray(syms), jnp.asarray(en),
                    )
                    ni = np.asarray(ni)
                    nq = np.asarray(nq)
                    for k in range(n):
                        cur_i[bidx[k]] = ni[k]
                        cur_q[bidx[k]] = nq[k]
            _LOG.debug("subtraction done")
            if sharding is not None:
                sig_i, sig_q = upload()

    for b in range(B):
        uniques[b].sort(key=lambda s: -s.snr)
    return uniques


def resolve_type3_spots(per_channel: list[list[Spot]],
                        ht: WsprHashTable) -> list[list[Spot]]:
    """Re-resolve still-unresolved type-3 ``<...>`` spots against the
    (current) hashtable, rebuilding call + message exactly as
    unpack_message would have (wsprd/wsprd_utils.c:280-308: the
    reported fields are ``<call> grid6 pwr`` with the same
    truncations).

    This is the pipelined path's hash-teaching guarantee: yields are
    strictly batch-ordered and a batch is only yielded after its decode
    (including every ``hashtable.put``) completed, so running this at
    YIELD time makes every teacher in every earlier batch — and in
    same-batch sibling shards of the multidevice path — visible by
    construction, while keeping the full pipeline overlap. The
    reference gets the same visibility from strictly sequential window
    processing (wsprd/wsprd_utils.c:275-300)."""
    out = []
    for spots in per_channel:
        resolved = spots
        for k, s in enumerate(spots):
            if s.ihash < 0 or s.call != "<...>":
                continue
            stored = ht.get_call(s.ihash)
            if not stored:
                continue
            if resolved is spots:
                resolved = list(spots)
            hc = f"<{stored}>"[:12]
            resolved[k] = _dc_replace(
                s, call=hc, message=f"{hc} {s.loc} {s.pwr}"[:22])
        out.append(resolved)
    return out


def decode_channels_pipelined(
    batches,
    options: DecoderOptions = DecoderOptions(),
    hashtable: WsprHashTable | None = None,
    depth: int = 2,
    device_batch: int = 64,
    transfer_dtype: str = "int8",
    device=None,
    fec: str = "auto",
    on_error=None,
    strict_hash_order: bool = False,
):
    """Stream-decode an iterable of window batches with a ``depth``-deep
    pipeline; yields each batch's spot lists in order. Each item is
    either an ``(i_windows, q_windows)`` float32 pair (quantized and
    uploaded here) or a ``prepare_windows()`` handle whose upload is
    already in flight (device-resident feed, e.g. windows produced by
    the on-device front end).

    Batch k+1's host work (sample quantization, host FEC, spot
    assembly — GIL-releasing native code or cheap Python) overlaps
    batch k's device stages, so steady-state throughput approaches the
    device-bound limit — the TPU analog of the reference's RX/decode
    double buffer (rtlsdr_wsprd.c:75-91). bench.py measures this path.

    ``on_error``: optional callable. When given, a batch whose decode
    fails even after the internal crash-retry envelope is reported to
    it (as ``on_error(exc)``) and yielded as empty per-channel spot
    lists instead of raising — so one poisoned batch never ends a
    long-running stream (the reference's per-window isolation,
    SURVEY.md section 5). Without it, the exception propagates.

    Hashtable visibility: the shared table is safe under concurrency
    (dict ops are GIL-atomic), and although a batch's DECODE may run
    before the ``depth - 1`` in-flight earlier batches have inserted
    their callsign hashes, every yielded batch passes through
    ``resolve_type3_spots`` — yields are strictly ordered and a batch
    is yielded only after its decode (including its hash inserts)
    completed, so a type-3 ``<hash>`` spot whose teaching decode sits
    in ANY earlier batch resolves by construction, race-free, at full
    pipeline overlap (the reference's sequential-window guarantee,
    wsprd/wsprd_utils.c:275-300). ``strict_hash_order=True`` (with
    ``options.usehashtable``) remains as a compatibility mode that
    additionally serializes batches (effective depth 1) — only needed
    when decode-time side effects of resolution must also match the
    sequential order exactly: the dedupe key of a then-unresolved
    type-3 is ``<...>`` rather than ``<call>``, and its pass-0
    subtraction is skipped (an unresolvable message cannot be
    re-encoded).
    """
    from concurrent.futures import ThreadPoolExecutor

    if strict_hash_order and options.usehashtable:
        depth = 1
    ht = hashtable if hashtable is not None else WsprHashTable()

    def _result(fut, n_channels):
        if on_error is None:
            return resolve_type3_spots(fut.result(), ht)
        try:
            per_channel = fut.result()
        except Exception as exc:  # after decode_channels' crash retries
            on_error(exc)
            return [[] for _ in range(n_channels)]
        return resolve_type3_spots(per_channel, ht)

    with ThreadPoolExecutor(depth) as ex:
        futs = []
        for item in batches:
            if isinstance(item, _DeviceWindows):
                w, n_ch = item, item.B
            else:
                wi, wq = item
                n_ch = wi.shape[0]
                w = prepare_windows(wi, wq, device_batch=device_batch,
                                    transfer_dtype=transfer_dtype,
                                    device=device)
            futs.append((ex.submit(decode_channels, None, None, options,
                                   ht, windows=w, fec=fec), n_ch))
            while len(futs) >= depth:
                yield _result(*futs.pop(0))
        for f, n_ch in futs:
            yield _result(f, n_ch)


def decode_channels_pipelined_multidevice(
    batches,
    options: DecoderOptions = DecoderOptions(),
    hashtable: WsprHashTable | None = None,
    depth: int = 2,
    device_batch: int = 64,
    transfer_dtype: str = "int8",
    fec: str = "auto",
    on_error=None,
    devices=None,
    strict_hash_order: bool = False,
):
    """decode_channels_pipelined across all LOCAL devices: each window
    batch's channel rows split into one contiguous shard per chip, every
    shard runs the staged pipeline on its own device concurrently (from
    host threads; device waits release the GIL), and batches stay
    ``depth``-deep in flight per chip. Yields merged per-channel spot
    lists in batch order — the integrated ingest->spots analog of
    decode_channels_multidevice, used by MultiChannelDaemon(devices=...)
    to span a host's chips (BASELINE.md: 1000+ channels on a v5e-16;
    reference live path rtlsdr_wsprd.c:126-328 drives exactly one CPU).

    Each item of ``batches`` is either an ``(i_windows, q_windows)``
    float32 pair (split and uploaded here, one contiguous shard per
    chip) or a LIST of per-shard ``prepare_windows`` /
    ``prepare_windows_device`` handles, one per chip in device order —
    the zero-host-round-trip feed for a front end that already placed
    each shard's windows on its chip (a single handle is accepted as a
    one-shard batch). The merged yield order is handle order.

    ``on_error``: per-SHARD isolation — a failed shard yields empty
    lists for its channels (reported via on_error(exc)) while the other
    chips' results for the same batch survive.

    Hash teaching: every merged batch passes through
    ``resolve_type3_spots`` (see decode_channels_pipelined), which also
    covers same-batch OTHER-SHARD teachers — all shard futures of a
    batch complete before the merge, so a type-1 decode on chip 0
    resolves a type-3 on chip 1 of the very same batch.
    ``strict_hash_order`` remains as the compatibility mode that
    serializes BATCHES; only the decode-time side effects (dedupe key,
    pass-0 subtraction of a then-unresolved type-3) can still differ
    from the reference's strictly sequential channel order.
    """
    from concurrent.futures import ThreadPoolExecutor

    if strict_hash_order and options.usehashtable:
        depth = 1
    if devices is None:
        devices = jax.local_devices()
    D = len(devices)
    ht = hashtable if hashtable is not None else WsprHashTable()

    def _shard_result(fut, n_ch):
        if on_error is None:
            return fut.result()
        try:
            return fut.result()
        except Exception as exc:
            on_error(exc)
            return [[] for _ in range(n_ch)]

    def _merge(shard_futs):
        out = []
        for fut, n_ch in shard_futs:
            out.extend(_shard_result(fut, n_ch))
        return resolve_type3_spots(out, ht)

    with ThreadPoolExecutor(D * depth) as ex:
        futs: list[list[tuple]] = []
        for item in batches:
            if isinstance(item, _DeviceWindows):
                item = [item]
            if (isinstance(item, (list, tuple)) and item
                    and isinstance(item[0], _DeviceWindows)):
                # pre-placed per-shard handles (device-fed front end):
                # each decodes on the device its windows live on
                shard_futs = [
                    (ex.submit(decode_channels, None, None, options, ht,
                               windows=w, fec=fec), w.B)
                    for w in item]
                futs.append(shard_futs)
                while len(futs) >= depth:
                    yield _merge(futs.pop(0))
                continue
            wi, wq = item
            B = wi.shape[0]
            d_use = min(D, B)
            bounds = [B * k // d_use for k in range(d_use + 1)]
            shard_futs = []
            for k in range(d_use):
                s0, s1 = bounds[k], bounds[k + 1]
                w = prepare_windows(
                    wi[s0:s1], wq[s0:s1],
                    device_batch=min(device_batch, s1 - s0),
                    transfer_dtype=transfer_dtype, device=devices[k])
                shard_futs.append(
                    (ex.submit(decode_channels, None, None, options, ht,
                               windows=w, fec=fec), s1 - s0))
            futs.append(shard_futs)
            while len(futs) >= depth:
                yield _merge(futs.pop(0))
        for sf in futs:
            yield _merge(sf)


def decode_channels_multidevice(
    i_windows: np.ndarray,
    q_windows: np.ndarray,
    options: DecoderOptions = DecoderOptions(),
    hashtable: WsprHashTable | None = None,
    devices=None,
    device_batch: int = 64,
    transfer_dtype: str = "int8",
    fec: str = "auto",
) -> list[list[Spot]]:
    """Staged decode across all LOCAL devices of this process.

    The window batch splits into one contiguous shard per device and
    each shard runs the full staged pipeline on its own chip from a
    host thread (device waits release the GIL, so chips execute
    concurrently; decode is embarrassingly parallel per window —
    SURVEY.md section 5). This is the production one-host-many-chips
    path; use parallel.distributed.decode_local_shard per host for
    multi-host, and the NamedSharding mesh path of decode_channels for
    a single SPMD program.
    """
    from concurrent.futures import ThreadPoolExecutor

    if devices is None:
        devices = jax.local_devices()
    i_windows = np.asarray(i_windows, np.float32)
    q_windows = np.asarray(q_windows, np.float32)
    B = i_windows.shape[0]
    D = min(len(devices), B)
    bounds = [B * k // D for k in range(D + 1)]
    ht = hashtable if hashtable is not None else WsprHashTable()

    def run(k):
        s0, s1 = bounds[k], bounds[k + 1]
        return decode_channels(
            i_windows[s0:s1], q_windows[s0:s1], options, ht,
            device_batch=min(device_batch, s1 - s0),
            transfer_dtype=transfer_dtype, device=devices[k], fec=fec)

    with ThreadPoolExecutor(max_workers=D) as ex:
        parts = list(ex.map(run, range(D)))
    return [ch for part in parts for ch in part]


def shard_windows(i_windows: np.ndarray, q_windows: np.ndarray, mesh):
    """Place planar (B, SIGNAL_SAMPLES) window batches sharded over the
    mesh."""
    sh = channel_sharding(mesh)
    return (jax.device_put(jnp.asarray(i_windows, jnp.float32), sh),
            jax.device_put(jnp.asarray(q_windows, jnp.float32), sh))


__all__ = [
    "ChannelDecode",
    "multichannel_decode_device",
    "prepare_windows",
    "prepare_windows_device",
    "decode_channels",
    "decode_channels_pipelined",
    "resolve_type3_spots",
    "decode_channels_pipelined_multidevice",
    "decode_channels_multidevice",
    "shard_windows",
    "DEFAULT_MAX_ATTEMPTS",
    "replicated",
]
