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

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DT, SIGNAL_SAMPLES, DecoderOptions
from ..models.decoder import Spot
from ..ops.candidates import find_candidates
from ..ops.coarse import coarse_search
from ..ops.fano import batched_fano, build_mettab
from ..ops.stft import power_spectrogram
from ..ops.subtract import subtract_signal2
from ..ops.sync import fine_sync, jitter_offsets, soft_symbols_jittered
from ..utils.channel import INTERLEAVE_PERM, get_wspr_channel_symbols
from ..utils.codec import unpack_message
from ..utils.hashtable import WsprHashTable
from .mesh import channel_sharding, replicated

_METTAB = build_mettab()

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
) -> list[list[Spot]]:
    """Decode B channels' 120 s windows in one batched device program.

    i_windows/q_windows: float32[B, SIGNAL_SAMPLES] planar I/Q (already
    -3 dB normalized). ``sharding``: optional NamedSharding for the
    channel axis (see parallel.mesh.channel_sharding); None runs on the
    default device. Returns per-channel Spot lists, each sorted by SNR
    descending.
    """
    ht = hashtable if hashtable is not None else WsprHashTable()
    sig_i = jnp.asarray(i_windows, jnp.float32)
    sig_q = jnp.asarray(q_windows, jnp.float32)
    assert sig_i.ndim == 2 and sig_i.shape[1] == SIGNAL_SAMPLES
    assert sig_i.shape == sig_q.shape
    B = sig_i.shape[0]
    if sharding is not None:
        sig_i = jax.device_put(sig_i, sharding)
        sig_q = jax.device_put(sig_q, sharding)

    lagstep = 16 if options.quickmode else 8
    jit_offs = jitter_offsets(options.iifac, options.quickmode)
    kw = dict(
        fmin=options.fmin, fmax=options.fmax, lagstep=lagstep,
        iifac=options.iifac, quickmode=options.quickmode,
        symfac=options.symfac, minsync1=options.minsync1,
        minsync2=options.minsync2, minrms=options.minrms,
        max_attempts=max_attempts, delta=options.delta,
        maxcycles=options.maxcycles,
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
            md = jax.device_put(md, sharding)
        out_dev = multichannel_decode_device(sig_i, sig_q, md, **kw)
        out = jax.tree.map(np.asarray, out_dev)

        host_i = host_q = None
        for b in range(B):
            if ipass == 1 and not uniques[b]:
                continue  # this channel's pass 0 was empty (wsprd.c:522)
            new_decodes = _collect_channel_spots(
                b, out, jit_offs, options, ht, seen[b], uniques[b], ipass)
            for c, call_loc_pow in new_decodes:
                chan_syms = get_wspr_channel_symbols(call_loc_pow, ht)
                if chan_syms is None:
                    continue
                if host_i is None:
                    host_i = np.array(sig_i)  # mutable copies
                    host_q = np.array(sig_q)
                ni, nq = subtract_signal2(
                    jnp.asarray(host_i[b]), jnp.asarray(host_q[b]),
                    jnp.float32(out.freq[b, c]),
                    jnp.int32(out.shift[b, c]),
                    jnp.float32(out.drift[b, c]),
                    jnp.asarray(chan_syms),
                )
                host_i[b] = np.asarray(ni)
                host_q[b] = np.asarray(nq)
        if host_i is not None:
            sig_i = jnp.asarray(host_i)
            sig_q = jnp.asarray(host_q)
            if sharding is not None:
                sig_i = jax.device_put(sig_i, sharding)
                sig_q = jax.device_put(sig_q, sharding)

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
