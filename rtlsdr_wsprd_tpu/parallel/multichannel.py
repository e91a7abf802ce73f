"""Batched multi-channel WSPR decoding over a device mesh.

The reference decodes exactly one channel, sequentially, per 2-minute
window (wsprd/wsprd.c:416-855). Here ``B`` channels decode as one
device program: every per-channel stage (spectrogram, candidate pick,
coarse/fine sync, jittered soft symbols) is ``vmap``-ed over the
channel axis, the (candidate x jitter) FEC attempts of ALL channels are
compacted on device into one fixed-size Fano batch, and the whole step
is sharded over the mesh's ``ch`` axis with ``jax.jit`` + NamedSharding
(pure data parallelism — each window's decode stays resident on one
chip, SURVEY.md section 5).

Unlike the single-window path (models/decoder.py), attempt gating and
compaction happen ON DEVICE via ``lax.top_k`` on a priority key that
reproduces the reference's candidate-major, jitter-schedule order
(wsprd/wsprd.c:697,741) — so the first-success-per-candidate selection
on host still matches the C's first-hit-wins semantics. Host code only
unpacks messages, dedupes and drives the pass loop.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DT, MAX_UNIQUES, SIGNAL_SAMPLES, DecoderOptions
from ..models.decoder import Spot
from ..ops.candidates import find_candidates
from ..ops.coarse import coarse_search
from ..ops.fano import batched_fano, build_mettab
from ..ops.fano_hybrid import (
    DEVICE_MAXCYCLES,
    host_finish,
    pending_mask,
)
from ..ops.stft import power_spectrogram
from ..ops.subtract import subtract_signal2, subtract_signal2_many
from ..ops.sync import fine_sync, jitter_offsets, soft_symbols_jittered
from ..utils.channel import INTERLEAVE_PERM, get_wspr_channel_symbols
from ..utils.codec import unpack_message
from ..utils.hashtable import WsprHashTable
from .mesh import channel_sharding, replicated

_METTAB = build_mettab()
_LOG = logging.getLogger("rtlsdr_wsprd_tpu.multichannel")

# attempts decoded per channel per pass; gate-passing attempts beyond
# this (priority = candidate-major, jitter order) are dropped. The
# reference has no such cap but stops each candidate at first success;
# 128 attempts comfortably covers a busy band (observed gate counts on
# the golden capture are < 40).
DEFAULT_MAX_ATTEMPTS = 128

_BIG = jnp.int32(2**30)


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
    i32 = jnp.stack([
        o.sel_cand, o.sel_jit, o.sel_valid.astype(jnp.int32),
        o.success.astype(jnp.int32), o.cycles.astype(jnp.int32),
    ], axis=1)                                       # (B, 5, K)
    return f32, i32, o.data, o.deint                 # + (B,K,11) (B,K,162)


def _unpack(f32: np.ndarray, i32: np.ndarray, data: np.ndarray,
            deint: np.ndarray) -> ChannelDecode:
    return ChannelDecode(
        snr=f32[:, 0], freq=f32[:, 1], sync=f32[:, 2], drift=f32[:, 3],
        valid=f32[:, 4] != 0.0, shift=f32[:, 5].astype(np.int32),
        sel_cand=i32[:, 0], sel_jit=i32[:, 1],
        sel_valid=i32[:, 2] != 0, success=i32[:, 3] != 0,
        cycles=i32[:, 4].astype(np.uint32), data=data, deint=deint,
    )


def _finish_stragglers(out: ChannelDecode,
                       options: DecoderOptions) -> ChannelDecode:
    """Host side of the hybrid FEC decode: lanes that hit the device
    Fano budget re-run on the native sequential decoder with the full
    reference budget (ops/fano_hybrid.py)."""
    dev_mc = min(options.maxcycles, DEVICE_MAXCYCLES)
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
    unpack, dedupe; returns (candidate, message) pairs to subtract.
    Mirrors models/decoder.py and wsprd/wsprd.c:768-822."""
    new_decodes: list[tuple[int, str]] = []
    decoded: dict[int, tuple[int, bytes, int]] = {}
    K = out.sel_valid.shape[1]
    for a in range(K):
        if not out.sel_valid[b, a] or not out.success[b, a]:
            continue
        c = int(out.sel_cand[b, a])
        if c not in decoded:
            decoded[c] = (int(out.sel_jit[b, a]), bytes(out.data[b, a]),
                          int(out.cycles[b, a]))
    for c in sorted(decoded):
        j, data, cycles = decoded[c]
        msg = unpack_message([x if x < 128 else x - 256 for x in data[:11]],
                             ht)
        if msg is None or msg.loc == "A000AA":
            continue
        freq_c = float(out.freq[b, c])
        if any(msg.callsign == s_call and abs(freq_c - s_freq) < 3.0
               for s_call, s_freq in seen):
            continue
        if len(uniques) >= MAX_UNIQUES:
            break  # result buffer bound (wsprd/wsprd.h:41)
        seen.append((msg.callsign, freq_c))
        uniques.append(Spot(
            freq=options.freq / 1e6 + (1500.0 + freq_c) / 1e6,
            sync=float(out.sync[b, c]),
            snr=float(out.snr[b, c]),
            dt=float(out.shift[b, c]) * DT - 2.0,
            drift=float(out.drift[b, c]),
            jitter=int(jit_offs[j]),
            message=msg.call_loc_pow,
            call=msg.call, loc=msg.loc, pwr=msg.pwr,
            cycles=cycles, noprint=msg.noprint,
        ))
        if options.subtraction and ipass == 0 and not msg.noprint:
            new_decodes.append((c, msg.call_loc_pow))
    return new_decodes


def decode_channels(
    i_windows: np.ndarray,
    q_windows: np.ndarray,
    options: DecoderOptions = DecoderOptions(),
    hashtable: WsprHashTable | None = None,
    sharding=None,
    max_attempts: int = DEFAULT_MAX_ATTEMPTS,
    device_batch: int = 8,
) -> list[list[Spot]]:
    """Decode B channels' 120 s windows in one batched device program.

    i_windows/q_windows: float32[B, SIGNAL_SAMPLES] planar I/Q (already
    -3 dB normalized). ``sharding``: optional NamedSharding for the
    channel axis (see parallel.mesh.channel_sharding); None runs on the
    default device. Returns per-channel Spot lists, each sorted by SNR
    descending.
    """
    ht = hashtable if hashtable is not None else WsprHashTable()
    # canonical window state lives on HOST: if the accelerator worker
    # crashes mid-batch (observed on tunneled single-chip setups), the
    # chunk retries below re-upload and continue (SURVEY.md section 5,
    # failure detection / per-window isolation)
    cur_i = np.asarray(i_windows, np.float32)
    cur_q = np.asarray(q_windows, np.float32)
    assert cur_i.ndim == 2 and cur_i.shape[1] == SIGNAL_SAMPLES
    assert cur_i.shape == cur_q.shape
    B = cur_i.shape[0]

    def upload():
        si = jnp.asarray(cur_i)
        sq = jnp.asarray(cur_q)
        if sharding is not None:
            si = jax.device_put(si, sharding)
            sq = jax.device_put(sq, sharding)
        return si, sq

    sig_i, sig_q = upload()

    lagstep = 16 if options.quickmode else 8
    jit_offs = jitter_offsets(options.iifac, options.quickmode)
    kw = dict(
        fmin=options.fmin, fmax=options.fmax, lagstep=lagstep,
        iifac=options.iifac, quickmode=options.quickmode,
        symfac=options.symfac, minsync1=options.minsync1,
        minsync2=options.minsync2, minrms=options.minrms,
        max_attempts=max_attempts, delta=options.delta,
        # hybrid FEC: the device runs a small budget; stragglers are
        # finished on the host (_finish_stragglers)
        maxcycles=min(options.maxcycles, DEVICE_MAXCYCLES),
    )

    uniques: list[list[Spot]] = [[] for _ in range(B)]
    seen: list[list[tuple[str, float]]] = [[] for _ in range(B)]

    for ipass in range(options.npasses):
        if ipass == 1 and not any(uniques):
            break  # wsprd/wsprd.c:522 (per-batch: nothing to subtract)
        maxdrift = np.full((B,), options.maxdrift if ipass < 2 else 0,
                           np.int32)
        md = jnp.asarray(maxdrift)
        if sharding is not None:
            # mesh path: one call, channels sharded over devices (the
            # per-device slice is the memory unit)
            md = jax.device_put(md, sharding)
            pk = _decode_device_packed(sig_i, sig_q, md, **kw)
            out = _unpack(*(np.asarray(a) for a in pk))
        else:
            # single device: bound HBM by decoding fixed-size
            # sub-batches (one compiled executable for any B; the last
            # chunk is padded with copies of channel 0 and discarded),
            # with crash-isolation retries per chunk
            packs = []
            for c0 in range(0, B, device_batch):
                c1 = min(c0 + device_batch, B)
                pad = device_batch - (c1 - c0)
                for attempt in range(3):
                    try:
                        ci = jnp.concatenate(
                            [sig_i[c0:c1],
                             jnp.repeat(sig_i[:1], pad, axis=0)]) \
                            if pad else sig_i[c0:c1]
                        cq = jnp.concatenate(
                            [sig_q[c0:c1],
                             jnp.repeat(sig_q[:1], pad, axis=0)]) \
                            if pad else sig_q[c0:c1]
                        cm = jnp.concatenate(
                            [md[c0:c1], jnp.repeat(md[:1], pad, axis=0)]) \
                            if pad else md[c0:c1]
                        _LOG.debug("pass %d chunk %d dispatch", ipass, c0)
                        pk = _decode_device_packed(ci, cq, cm, **kw)
                        packs.append(tuple(np.asarray(a)[:c1 - c0]
                                           for a in pk))
                        _LOG.debug("pass %d chunk %d done", ipass, c0)
                        break
                    except jax.errors.JaxRuntimeError as e:
                        _LOG.warning("device chunk crashed (pass %d, "
                                     "chunk %d, attempt %d): %s",
                                     ipass, c0, attempt, str(e)[:80])
                        if attempt == 2:
                            raise
                        time.sleep(5.0 * (attempt + 1))
                        sig_i, sig_q = upload()  # worker restarted
                        md = jnp.asarray(maxdrift)
            out = _unpack(*(np.concatenate(parts, axis=0)
                            for parts in zip(*packs)))
        out = _finish_stragglers(out, options)

        # collect this pass's new decodes per channel, then subtract in
        # vmapped ROUNDS: round r applies each channel's r-th decode
        # (same-channel decodes stay sequential, matching the C's order
        # wsprd/wsprd.c:781-789; cross-channel lanes run in parallel)
        subs: dict[int, list[tuple]] = {}
        for b in range(B):
            if ipass == 1 and not uniques[b]:
                continue  # this channel's pass 0 was empty (wsprd.c:522)
            new_decodes = _collect_channel_spots(
                b, out, jit_offs, options, ht, seen[b], uniques[b], ipass)
            for c, call_loc_pow in new_decodes:
                chan_syms = get_wspr_channel_symbols(call_loc_pow, ht)
                if chan_syms is None:
                    continue
                subs.setdefault(b, []).append((
                    float(out.freq[b, c]), int(out.shift[b, c]),
                    float(out.drift[b, c]),
                    np.asarray(chan_syms, np.uint8)))
        if subs:
            n_rounds = max(len(v) for v in subs.values())
            _LOG.debug("subtracting %d decodes in %d rounds",
                       sum(len(v) for v in subs.values()), n_rounds)
            lane_n = device_batch
            for r in range(n_rounds):
                lanes = [(b, *subs[b][r]) for b in sorted(subs)
                         if len(subs[b]) > r]
                for l0 in range(0, len(lanes), lane_n):
                    grp = lanes[l0:l0 + lane_n]
                    n = len(grp)
                    pad = lane_n - n
                    bidx = np.array([g[0] for g in grp] + [0] * pad)
                    ni, nq = subtract_signal2_many(
                        jnp.asarray(cur_i[bidx]), jnp.asarray(cur_q[bidx]),
                        jnp.asarray(np.array(
                            [g[1] for g in grp] + [0.0] * pad, np.float32)),
                        jnp.asarray(np.array(
                            [g[2] for g in grp] + [0] * pad, np.int32)),
                        jnp.asarray(np.array(
                            [g[3] for g in grp] + [0.0] * pad, np.float32)),
                        jnp.asarray(np.stack(
                            [g[4] for g in grp]
                            + [np.zeros(162, np.uint8)] * pad)),
                        jnp.asarray(np.array([True] * n + [False] * pad)),
                    )
                    ni = np.asarray(ni)
                    nq = np.asarray(nq)
                    for k in range(n):
                        cur_i[bidx[k]] = ni[k]
                        cur_q[bidx[k]] = nq[k]
            sig_i, sig_q = upload()

    for b in range(B):
        uniques[b].sort(key=lambda s: -s.snr)
    return uniques


def shard_windows(i_windows: np.ndarray, q_windows: np.ndarray, mesh):
    """Place planar (B, SIGNAL_SAMPLES) window batches sharded over the
    mesh."""
    sh = channel_sharding(mesh)
    return (jax.device_put(jnp.asarray(i_windows, jnp.float32), sh),
            jax.device_put(jnp.asarray(q_windows, jnp.float32), sh))


__all__ = [
    "ChannelDecode",
    "multichannel_decode_device",
    "decode_channels",
    "shard_windows",
    "DEFAULT_MAX_ATTEMPTS",
    "replicated",
]
