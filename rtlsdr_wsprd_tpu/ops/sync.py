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
(C*162, 256) @ (256, 4) complex matmul — MXU work — and the lag/freq/
jitter axis is a short lax.scan re-using E_cand. A frequency-offset
factor E_freq[f,j] separates the same way for the mode-1 search.

Modes map to: fine_sync (mode 0 lag search + mode 1 freq search,
wsprd/wsprd.c:709-726) and soft_symbols_jittered (mode 2 over the
full jitter schedule, wsprd/wsprd.c:739-766).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DF, DT, NBITS, NSPERSYM, NSYM, SIGNAL_SAMPLES
from ..utils.channel import PR3_VECTOR

TWOPIDT = 2.0 * np.pi * DT

# E_TONE[j, t] = exp(-i * 2*pi*dt * (t-1.5)*DF * j): static tone phasors
_j = np.arange(NSPERSYM, dtype=np.float64)
_t = np.arange(4, dtype=np.float64) - 1.5
E_TONE = np.exp(-1j * TWOPIDT * DF * np.outer(_j, _t)).astype(np.complex64)  # (256,4)

_PR3 = PR3_VECTOR.astype(bool)          # (162,)
_PR3_SIGN = 2.0 * PR3_VECTOR.astype(np.float32) - 1.0


def _cand_phasor_conj(f0: jnp.ndarray, drift: jnp.ndarray) -> jnp.ndarray:
    """conj of the per-candidate base phasor, (C, 162, 256) complex64.

    fp_i = f0 + (drift/2) * (i - 81)/81 (wsprd/wsprd.c:156); phase
    accumulates as j * 2*pi*dt*fp_i within each symbol (phase resets at
    symbol boundaries, wsprd/wsprd.c:174-188).
    """
    i = jnp.arange(NSYM, dtype=jnp.float32)
    fp = f0[:, None] + (drift[:, None] / 2.0) * (i[None, :] - NBITS) / NBITS  # (C,162)
    dphi = TWOPIDT * fp  # (C,162)
    phase = dphi[:, :, None] * jnp.arange(NSPERSYM, dtype=jnp.float32)  # (C,162,256)
    return jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))


def _gather_symbols(iq: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Windowed samples x[c, i, j] = iq[shift_c + 256*i + j], zero outside
    (0, np) — note the reference's strict k > 0 bound (wsprd/wsprd.c:199)."""
    k = (shifts[:, None, None]
         + (jnp.arange(NSYM, dtype=jnp.int32) * NSPERSYM)[None, :, None]
         + jnp.arange(NSPERSYM, dtype=jnp.int32)[None, None, :])  # (C,162,256)
    ok = (k > 0) & (k < SIGNAL_SAMPLES)
    x = iq[jnp.clip(k, 0, SIGNAL_SAMPLES - 1)]
    return jnp.where(ok, x, 0.0)


def _tone_powers(y: jnp.ndarray, e_ft: jnp.ndarray) -> jnp.ndarray:
    """y: (C,162,256) de-rotated samples; e_ft: (256, K) tone(/freq)
    phasors -> |z|: (C,162,K)."""
    z = jnp.einsum("cij,jk->cik", y, e_ft, preferred_element_type=jnp.complex64)
    return jnp.abs(z)


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


@partial(jax.jit, static_argnames=("lagstep",))
def fine_sync(
    iq: jnp.ndarray,
    freq: jnp.ndarray,
    shift: jnp.ndarray,
    drift: jnp.ndarray,
    lagstep: int = 8,
) -> FineSync:
    """Mode-0 lag search (+/-128 by lagstep) then mode-1 freq search
    (+/-0.2 Hz by 0.1) for all candidates at once (wsprd/wsprd.c:709-726).

    quickmode uses lagstep=16 (rtlsdr options.quickmode,
    wsprd/wsprd.c:716-717).
    """
    ec = _cand_phasor_conj(freq, drift)  # (C,162,256)
    e_tone = jnp.asarray(E_TONE)

    # ---- mode 0: lag search ----
    rel_lags = jnp.arange(-128, 129, lagstep, dtype=jnp.int32)

    def lag_step(_, rel):
        x = _gather_symbols(iq, shift + rel)
        p = _tone_powers(x * ec, e_tone)  # (C,162,4)
        return None, _sync_from_powers(p)

    _, sync_l = jax.lax.scan(lag_step, None, rel_lags)  # (L, C)
    best_l = jnp.argmax(sync_l, axis=0)  # first max wins = C lag order
    shift1 = shift + rel_lags[best_l]

    # ---- mode 1: freq search at the best lag ----
    fstep = 0.1
    ifreqs = jnp.arange(-2, 3, dtype=jnp.float32)
    # separable frequency offset phasor: (256, 5)
    jj = jnp.arange(NSPERSYM, dtype=jnp.float32)
    ph = TWOPIDT * fstep * jnp.outer(jj, ifreqs)
    e_freq = jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))  # (256,5)
    # combined (256, 5*4) matrix
    e_ft = (e_freq[:, :, None] * e_tone[:, None, :]).reshape(NSPERSYM, 20)

    x1 = _gather_symbols(iq, shift1)           # (C,162,256)
    p = _tone_powers(x1 * ec, e_ft)            # (C,162,20)
    p = p.reshape(p.shape[0], NSYM, 5, 4)
    sync_f = _sync_from_powers(jnp.moveaxis(p, 2, 0))  # (5, C)
    best_f = jnp.argmax(sync_f, axis=0)        # freq ascending, first wins
    freq1 = freq + (best_f.astype(jnp.float32) - 2.0) * fstep
    sync1 = jnp.take_along_axis(sync_f, best_f[None, :], axis=0)[0]
    return FineSync(freq=freq1, shift=shift1, sync=sync1)


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


@partial(jax.jit, static_argnames=("iifac", "quickmode", "symfac"))
def soft_symbols_jittered(
    iq: jnp.ndarray,
    freq: jnp.ndarray,
    shift: jnp.ndarray,
    drift: jnp.ndarray,
    iifac: int = 3,
    quickmode: bool = False,
    symfac: int = 50,
) -> JitteredSymbols:
    """Mode-2 soft symbols for every jitter attempt of every candidate
    (wsprd/wsprd.c:739-766 jitter loop; mode-2 body :219-256)."""
    ec = _cand_phasor_conj(freq, drift)
    e_tone = jnp.asarray(E_TONE)
    jit = jnp.asarray(jitter_offsets(iifac, quickmode))

    pr3 = jnp.asarray(_PR3)

    def jit_step(_, ii):
        x = _gather_symbols(iq, shift + ii)
        p = _tone_powers(x * ec, e_tone)  # (C,162,4)
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

    _, (sym, sync, rms) = jax.lax.scan(jit_step, None, jit)
    return JitteredSymbols(symbols=sym, sync=sync, rms=rms)
