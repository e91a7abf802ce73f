"""Fine sync and soft-symbol demodulation: batched correlator banks.

The reference's sync_and_demodulate (wsprd/wsprd.c:101-259) is a
3-mode sequential matched filter: per (freq, lag) it rebuilds 4 tone
phasors by Chebyshev recursion (with a non-reentrant static cache) and
correlates 162 symbols x 256 samples. Here all candidates run at once
and the phasor factorizes:

    exp(-i*2*pi*dt*(fp_i + (t-1.5)*DF)*j)
      = E_cand[c,i,j] * E_TONE[j,t]

where E_cand depends only on the candidate's (freq, drift) and E_TONE
is a static (256, 4) matrix. The tone correlation then becomes a
(C*162, 256) @ (256, 4) matmul — MXU work — and the lag/freq/jitter
axis is a short lax.scan re-using E_cand. A frequency-offset factor
E_freq[f,j] separates the same way for the mode-1 search.

All complex arithmetic is PLANAR REAL (separate re/im float32 arrays):
TPUs have no native complex type, so the correlations are explicit
4-term real einsums and magnitudes are sqrt(re^2 + im^2).

Modes map to: fine_sync (mode 0 lag search + mode 1 freq search,
wsprd/wsprd.c:709-726) and soft_symbols_jittered (mode 2 over the
full jitter schedule, wsprd/wsprd.c:739-766).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DF, DT, NBITS, NSPERSYM, NSYM, SIGNAL_SAMPLES
from ..utils.channel import PR3_VECTOR

TWOPIDT = 2.0 * np.pi * DT

# Correlator operand precision (reductions always accumulate float32
# via preferred_element_type). NB the TPU backend's DEFAULT matmul
# already truncates f32 operands to bfloat16 (verified), so the MXU
# einsums here are bf16-operand either way; this knob additionally
# casts the elementwise derotate/phasor operands.
# RTLSDR_WSPRD_TPU_SYNC_BF16=1 measured: ~5% end-to-end throughput
# gain, fixed-seed sensitivity-sweep decode counts IDENTICAL to
# float32 at every SNR point (-28..-31 dB). Kept off by default to
# preserve exact float32 elementwise semantics for parity tests.
_BF16 = os.environ.get("RTLSDR_WSPRD_TPU_SYNC_BF16", "0") == "1"
_CDT = jnp.bfloat16 if _BF16 else jnp.float32


def _scan_unroll() -> int:
    """Unroll factor for the lag/jitter scans. The steps are
    independent (the scan is a map over offsets), so larger unrolls cut
    tunnel while_loop round-trips (~1.5 ms each) and give XLA freedom
    to co-schedule steps, at the cost of compile time. Tunable via
    RTLSDR_WSPRD_TPU_SCAN_UNROLL."""
    v = os.environ.get("RTLSDR_WSPRD_TPU_SCAN_UNROLL")
    if v:
        return int(v)
    return 4 if jax.default_backend() == "tpu" else 1

# E_TONE[j, t] = exp(-i * 2*pi*dt * (t-1.5)*DF * j): static tone phasors
_j = np.arange(NSPERSYM, dtype=np.float64)
_t = np.arange(4, dtype=np.float64) - 1.5
_ANG_TONE = TWOPIDT * DF * np.outer(_j, _t)
E_TONE_R = np.cos(_ANG_TONE).astype(np.float32)   # (256, 4)
E_TONE_I = (-np.sin(_ANG_TONE)).astype(np.float32)

_PR3 = PR3_VECTOR.astype(bool)          # (162,)
_PR3_SIGN = 2.0 * PR3_VECTOR.astype(np.float32) - 1.0


def _cand_phasor_conj(f0: jnp.ndarray, drift: jnp.ndarray):
    """conj of the per-candidate base phasor, planar (re, im), each
    (C, 162, 256) float32.

    fp_i = f0 + (drift/2) * (i - 81)/81 (wsprd/wsprd.c:156); phase
    accumulates as j * 2*pi*dt*fp_i within each symbol (phase resets at
    symbol boundaries, wsprd/wsprd.c:174-188).
    """
    i = jnp.arange(NSYM, dtype=jnp.float32)
    fp = f0[:, None] + (drift[:, None] / 2.0) * (i[None, :] - NBITS) / NBITS  # (C,162)
    dphi = TWOPIDT * fp  # (C,162)
    phase = dphi[:, :, None] * jnp.arange(NSPERSYM, dtype=jnp.float32)  # (C,162,256)
    return (jnp.cos(phase).astype(_CDT),
            (-jnp.sin(phase)).astype(_CDT))


def _gather_symbols(sig_i: jnp.ndarray, sig_q: jnp.ndarray,
                    shifts: jnp.ndarray):
    """Windowed samples x[c, i, j] = sig[shift_c + 256*i + j], zero
    outside (0, np) — note the reference's strict k > 0 bound
    (wsprd/wsprd.c:199). Reference formulation (generic gather); the
    hot paths use the slice-based window machinery below instead."""
    k = (shifts[:, None, None]
         + (jnp.arange(NSYM, dtype=jnp.int32) * NSPERSYM)[None, :, None]
         + jnp.arange(NSPERSYM, dtype=jnp.int32)[None, None, :])  # (C,162,256)
    ok = (k > 0) & (k < SIGNAL_SAMPLES)
    kc = jnp.clip(k, 0, SIGNAL_SAMPLES - 1)
    xr = jnp.where(ok, sig_i[kc], 0.0)
    xi = jnp.where(ok, sig_q[kc], 0.0)
    return xr, xi


# ---- slice-based candidate windows (the TPU-fast path) ---------------------
#
# Generic (C,162,256) gathers scalarize on TPU (~seconds per call).
# Instead: one vmapped contiguous dynamic_slice pulls each candidate's
# maximal window covering every lag/jitter offset, and each offset then
# needs only a contiguous slice + reshape — gather-free, and XLA fuses
# the slices straight into the correlator einsums.

HALF_SPAN = 128                       # max |lag| (mode 0) and |jitter|
NSIG = NSYM * NSPERSYM                # 41472
WLEN = NSIG + 2 * HALF_SPAN           # per-candidate window length
_PAD = 2048                           # coarse shift range is [-1152, 2944]


def _padded_signal(sig_i: jnp.ndarray, sig_q: jnp.ndarray):
    """Zero sample 0 (the C's strict k > 0 bound, wsprd/wsprd.c:199 —
    every read of it is masked) and pad so all window starts/ends are
    in range; out-of-range samples read the zero padding, matching the
    reference's mask."""
    zi = sig_i.at[0].set(0.0)
    zq = sig_q.at[0].set(0.0)
    pi = jnp.pad(zi, (_PAD, _PAD))
    pq = jnp.pad(zq, (_PAD, _PAD))
    return pi, pq


def _candidate_windows(pi: jnp.ndarray, pq: jnp.ndarray,
                       shifts: jnp.ndarray):
    """(C,) base shifts -> (C, WLEN) windows starting at shift-HALF_SPAN."""
    starts = shifts + (_PAD - HALF_SPAN)

    def slice1(s):
        return (jax.lax.dynamic_slice(pi, (s,), (WLEN,)),
                jax.lax.dynamic_slice(pq, (s,), (WLEN,)))

    return jax.vmap(slice1)(starts)


def _window_symbols(wr: jnp.ndarray, wi: jnp.ndarray, off: jnp.ndarray):
    """(C, WLEN) windows at a SHARED relative offset ``off`` in
    [0, 2*HALF_SPAN] -> (C, 162, 256) symbol frames (contiguous slice +
    reshape)."""
    C = wr.shape[0]
    xr = jax.lax.dynamic_slice_in_dim(wr, off, NSIG, axis=1)
    xi = jax.lax.dynamic_slice_in_dim(wi, off, NSIG, axis=1)
    return (xr.reshape(C, NSYM, NSPERSYM), xi.reshape(C, NSYM, NSPERSYM))


def _window_symbols_percand(wr: jnp.ndarray, wi: jnp.ndarray,
                            offs: jnp.ndarray):
    """Per-candidate offsets (C,) -> (C, 162, 256) frames."""

    def one(w_r, w_i, o):
        return (
            jax.lax.dynamic_slice(w_r, (o,), (NSIG,)).reshape(NSYM, NSPERSYM),
            jax.lax.dynamic_slice(w_i, (o,), (NSIG,)).reshape(NSYM, NSPERSYM),
        )

    return jax.vmap(one)(wr, wi, offs)


def _padded_signals(sig_i: jnp.ndarray, sig_q: jnp.ndarray):
    """Batched _padded_signal: (B, N) -> (B, N + 2*_PAD)."""
    return jax.vmap(_padded_signal)(sig_i, sig_q)


def _lane_windows(pi: jnp.ndarray, pq: jnp.ndarray, lane_w: jnp.ndarray,
                  shifts: jnp.ndarray):
    """Cross-window candidate lanes: pi/pq (B, N+2*_PAD) padded signal
    planes, lane_w int32[G] window index per lane, shifts int32[G] ->
    (G, WLEN) windows. One 2-D dynamic_slice per lane — gather-free,
    same as _candidate_windows but with a batch coordinate."""
    starts = shifts + (_PAD - HALF_SPAN)

    def one(w, s):
        return (jax.lax.dynamic_slice(pi, (w, s), (1, WLEN))[0],
                jax.lax.dynamic_slice(pq, (w, s), (1, WLEN))[0])

    return jax.vmap(one)(lane_w, starts)


def _tone_mags(yr: jnp.ndarray, yi: jnp.ndarray,
               er: jnp.ndarray, ei: jnp.ndarray) -> jnp.ndarray:
    """y: (C,162,256) de-rotated samples (planar); e: (256, K) tone
    (/freq) phasors (planar) -> |z|: (C,162,K). Four real einsums on
    the MXU."""
    zr = (jnp.einsum("cij,jk->cik", yr, er, preferred_element_type=jnp.float32)
          - jnp.einsum("cij,jk->cik", yi, ei, preferred_element_type=jnp.float32))
    zi = (jnp.einsum("cij,jk->cik", yr, ei, preferred_element_type=jnp.float32)
          + jnp.einsum("cij,jk->cik", yi, er, preferred_element_type=jnp.float32))
    return jnp.sqrt(zr * zr + zi * zi)


def _derotate(xr, xi, ecr, eci):
    """y = x * ec, planar (in the correlator compute dtype)."""
    xr = xr.astype(_CDT)
    xi = xi.astype(_CDT)
    return xr * ecr - xi * eci, xr * eci + xi * ecr


def _sync_from_powers(p: jnp.ndarray) -> jnp.ndarray:
    """p: (..., 162, 4) tone magnitudes -> sync metric (...,)
    (wsprd/wsprd.c:216-227)."""
    cmet = (p[..., 1] + p[..., 3]) - (p[..., 0] + p[..., 2])
    ss = jnp.sum(jnp.asarray(_PR3_SIGN) * cmet, axis=-1)
    totp = jnp.sum(p, axis=(-2, -1))
    return ss / jnp.maximum(totp, 1e-30)


class FineSync(NamedTuple):
    freq: jnp.ndarray   # float32[C]
    shift: jnp.ndarray  # int32[C]
    sync: jnp.ndarray   # float32[C]


def _fine_sync_core(
    wr: jnp.ndarray,
    wi: jnp.ndarray,
    freq: jnp.ndarray,
    shift: jnp.ndarray,
    drift: jnp.ndarray,
    lagstep: int,
) -> FineSync:
    """Shared mode-0/mode-1 body over already-built (C, WLEN) windows."""
    ecr, eci = _cand_phasor_conj(freq, drift)  # (C,162,256) x2
    etr = jnp.asarray(E_TONE_R).astype(_CDT)
    eti = jnp.asarray(E_TONE_I).astype(_CDT)

    # ---- mode 0: lag search ----
    rel_lags = jnp.arange(-128, 129, lagstep, dtype=jnp.int32)

    def lag_step(_, rel):
        xr, xi = _window_symbols(wr, wi, rel + HALF_SPAN)
        yr, yi = _derotate(xr, xi, ecr, eci)
        p = _tone_mags(yr, yi, etr, eti)  # (C,162,4)
        return None, _sync_from_powers(p)

    _, sync_l = jax.lax.scan(lag_step, None, rel_lags,
                             unroll=_scan_unroll())  # (L, C)
    best_l = jnp.argmax(sync_l, axis=0)  # first max wins = C lag order
    shift1 = shift + rel_lags[best_l]

    # ---- mode 1: freq search at the best lag ----
    fstep = 0.1
    ifreqs = jnp.arange(-2, 3, dtype=jnp.float32)
    # separable frequency offset phasor (256, 5), then combined with the
    # tone phasors into a (256, 20) planar matrix
    jj = jnp.arange(NSPERSYM, dtype=jnp.float32)
    ph = TWOPIDT * fstep * jnp.outer(jj, ifreqs)
    efr, efi = jnp.cos(ph), -jnp.sin(ph)  # (256,5)
    er = (efr[:, :, None] * etr[:, None, :]
          - efi[:, :, None] * eti[:, None, :]).reshape(NSPERSYM, 20)
    ei = (efr[:, :, None] * eti[:, None, :]
          + efi[:, :, None] * etr[:, None, :]).reshape(NSPERSYM, 20)
    er = er.astype(_CDT)
    ei = ei.astype(_CDT)

    # shift1 - shift in [-128, 128] -> still inside the same windows
    xr, xi = _window_symbols_percand(wr, wi, shift1 - shift + HALF_SPAN)
    yr, yi = _derotate(xr, xi, ecr, eci)
    p = _tone_mags(yr, yi, er, ei)                      # (C,162,20)
    p = p.reshape(p.shape[0], NSYM, 5, 4)
    sync_f = _sync_from_powers(jnp.moveaxis(p, 2, 0))   # (5, C)
    best_f = jnp.argmax(sync_f, axis=0)                 # freq ascending, first wins
    freq1 = freq + (best_f.astype(jnp.float32) - 2.0) * fstep
    sync1 = jnp.take_along_axis(sync_f, best_f[None, :], axis=0)[0]
    return FineSync(freq=freq1, shift=shift1, sync=sync1)


@partial(jax.jit, static_argnames=("lagstep",))
def fine_sync(
    sig_i: jnp.ndarray,
    sig_q: jnp.ndarray,
    freq: jnp.ndarray,
    shift: jnp.ndarray,
    drift: jnp.ndarray,
    lagstep: int = 8,
) -> FineSync:
    """Mode-0 lag search (+/-128 by lagstep) then mode-1 freq search
    (+/-0.2 Hz, step 0.1) for all candidates at once
    (wsprd/wsprd.c:709-726). quickmode uses lagstep=16."""
    pi, pq = _padded_signal(sig_i, sig_q)
    wr, wi = _candidate_windows(pi, pq, shift)  # (C, WLEN)
    return _fine_sync_core(wr, wi, freq, shift, drift, lagstep)


def fine_sync_lanes(
    sig_i: jnp.ndarray,
    sig_q: jnp.ndarray,
    lane_w: jnp.ndarray,
    freq: jnp.ndarray,
    shift: jnp.ndarray,
    drift: jnp.ndarray,
    lagstep: int = 8,
) -> FineSync:
    """fine_sync over candidate LANES compacted across a window batch:
    sig_i/sig_q (B, N) planar signals, lane_w int32[G] maps each lane to
    its window. Identical math per lane; the lane axis replaces the
    (window x candidate) grid so invalid candidates cost nothing."""
    pi, pq = _padded_signals(sig_i, sig_q)
    wr, wi = _lane_windows(pi, pq, lane_w, shift)  # (G, WLEN)
    return _fine_sync_core(wr, wi, freq, shift, drift, lagstep)


def jitter_offsets(iifac: int = 3, quickmode: bool = False) -> np.ndarray:
    """The DT peak-up schedule 0, -1, +1, -2, +2, ... times iifac
    (wsprd/wsprd.c:741-745); quickmode tries only the first."""
    n = 1 if quickmode else (128 // iifac) + 1
    out = []
    for idt in range(n):
        ii = (idt + 1) // 2
        if idt % 2 == 1:
            ii = -ii
        out.append(iifac * ii)
    return np.asarray(out, dtype=np.int32)


class JitteredSymbols(NamedTuple):
    symbols: jnp.ndarray  # uint8[J, C, 162] soft symbols (128 = erasure)
    sync: jnp.ndarray     # float32[J, C] mode-2 sync metric
    rms: jnp.ndarray      # float32[J, C] soft-symbol RMS


def _soft_symbols_core(
    wr: jnp.ndarray,
    wi: jnp.ndarray,
    freq: jnp.ndarray,
    drift: jnp.ndarray,
    iifac: int,
    quickmode: bool,
    symfac: int,
) -> JitteredSymbols:
    """Shared mode-2 body over already-built (C, WLEN) windows."""
    ecr, eci = _cand_phasor_conj(freq, drift)
    etr = jnp.asarray(E_TONE_R).astype(_CDT)
    eti = jnp.asarray(E_TONE_I).astype(_CDT)
    jit = jnp.asarray(jitter_offsets(iifac, quickmode))

    pr3 = jnp.asarray(_PR3)

    def jit_step(_, ii):
        xr, xi = _window_symbols(wr, wi, ii + HALF_SPAN)
        yr, yi = _derotate(xr, xi, ecr, eci)
        p = _tone_mags(yr, yi, etr, eti)  # (C,162,4)
        sync = _sync_from_powers(p)
        # fsymb = p3-p1 (pr3=1) else p2-p0 (wsprd/wsprd.c:219-225)
        fsymb = jnp.where(pr3[None, :], p[..., 3] - p[..., 1], p[..., 2] - p[..., 0])
        fsum = jnp.sum(fsymb / NSYM, axis=-1, keepdims=True)
        f2sum = jnp.sum(fsymb * fsymb / NSYM, axis=-1, keepdims=True)
        fac = jnp.sqrt(jnp.maximum(f2sum - fsum * fsum, 1e-30))
        fs = symfac * fsymb / fac
        fs = jnp.clip(fs, -128.0, 127.0)
        # C: symbols[i] = (uchar)(fsymb[i] + 128) truncates toward zero;
        # fs+128 >= 0 so trunc == floor
        sym = jnp.floor(fs + 128.0).astype(jnp.uint8)  # (C,162)
        y = sym.astype(jnp.float32) - 128.0
        rms = jnp.sqrt(jnp.sum(y * y, axis=-1) / NSYM)
        return None, (sym, sync, rms)

    _, (sym, sync, rms) = jax.lax.scan(jit_step, None, jit,
                                       unroll=_scan_unroll())
    return JitteredSymbols(symbols=sym, sync=sync, rms=rms)


@partial(jax.jit, static_argnames=("iifac", "quickmode", "symfac"))
def soft_symbols_jittered(
    sig_i: jnp.ndarray,
    sig_q: jnp.ndarray,
    freq: jnp.ndarray,
    shift: jnp.ndarray,
    drift: jnp.ndarray,
    iifac: int = 3,
    quickmode: bool = False,
    symfac: int = 50,
) -> JitteredSymbols:
    """Mode-2 soft symbols for every jitter attempt of every candidate
    (wsprd/wsprd.c:739-766 jitter loop; mode-2 body :219-256)."""
    pi, pq = _padded_signal(sig_i, sig_q)
    wr, wi = _candidate_windows(pi, pq, shift)  # (C, WLEN)
    return _soft_symbols_core(wr, wi, freq, drift, iifac, quickmode, symfac)


def soft_symbols_lanes(
    sig_i: jnp.ndarray,
    sig_q: jnp.ndarray,
    lane_w: jnp.ndarray,
    freq: jnp.ndarray,
    shift: jnp.ndarray,
    drift: jnp.ndarray,
    iifac: int = 3,
    quickmode: bool = False,
    symfac: int = 50,
) -> JitteredSymbols:
    """Mode-2 soft symbols over candidate lanes compacted across a
    window batch (see fine_sync_lanes)."""
    pi, pq = _padded_signals(sig_i, sig_q)
    wr, wi = _lane_windows(pi, pq, lane_w, shift)  # (G, WLEN)
    return _soft_symbols_core(wr, wi, freq, drift, iifac, quickmode, symfac)
