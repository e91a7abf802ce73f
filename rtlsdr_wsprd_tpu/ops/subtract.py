"""Decoded-signal subtraction for multi-pass decoding.

``subtract_signal2`` is the production path (wsprd/wsprd.c:315-413,
invoked at :785): regenerate the decoded transmission as a
continuous-phase 4-FSK reference r(t), estimate the channel's complex
envelope c(t) = LPF[s(t) * conj(r(t))] with a 360-tap half-sine FIR,
and subtract c(t) * r(t) with partial-sum edge normalization.

``subtract_signal`` is the simpler per-symbol variant the reference
defines but never calls (wsprd/wsprd.c:263-312); implemented for API
parity.

Everything is expressed on complex64 windows; the LPF is one
``jnp.convolve`` (XLA lowers it to an FFT or direct conv as it sees
fit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DF, DT, NSPERSYM, NSYM, SIGNAL_SAMPLES

TWOPIDT = 2.0 * np.pi * DT
NFILT = 360  # LPF taps (wsprd/wsprd.c:326)
NSIG = NSYM * NSPERSYM  # 41472 reference samples


def _halfsine_taps() -> tuple[np.ndarray, np.ndarray]:
    """Normalized half-sine LPF and its partial sums
    (wsprd/wsprd.c:353-368)."""
    w = np.sin(np.pi * np.arange(NFILT, dtype=np.float64) / (NFILT - 1))
    w = (w / w.sum()).astype(np.float32)
    partial = np.concatenate([[0.0], np.cumsum(w[1:])]).astype(np.float32)
    return w, partial


_W, _PARTIAL = _halfsine_taps()


def _reference_signal(f0, drift, symbols: jnp.ndarray) -> jnp.ndarray:
    """Continuous-phase 4-FSK reference r(t), complex64[41472]
    (wsprd/wsprd.c:339-351)."""
    i = jnp.arange(NSYM, dtype=jnp.float32)
    cs = symbols.astype(jnp.float32)
    fsym = f0 + (drift / 2.0) * (i - NSYM / 2.0) / (NSYM / 2.0) + (cs - 1.5) * DF
    dphi = TWOPIDT * fsym                       # per-sample increment per symbol
    incr = jnp.repeat(dphi, NSPERSYM)           # (41472,)
    phi = jnp.concatenate([jnp.zeros(1), jnp.cumsum(incr)[:-1]])
    return jax.lax.complex(jnp.cos(phi), jnp.sin(phi))


@jax.jit
def subtract_signal2(
    iq: jnp.ndarray,      # complex64[SIGNAL_SAMPLES], the window
    f0: jnp.ndarray,      # scalar float32
    shift: jnp.ndarray,   # scalar int32
    drift: jnp.ndarray,   # scalar float32
    symbols: jnp.ndarray  # uint8[162] channel symbols of the decode
) -> jnp.ndarray:
    """Return the window with the decoded signal coherently removed."""
    r = _reference_signal(f0, drift, symbols)  # (41472,)

    # s(t) * conj(r(t)) at k = shift + i, valid for 0 < k < np
    # (wsprd/wsprd.c:375-381); the C pads NFILT zeros in front.
    k = shift + jnp.arange(NSIG, dtype=jnp.int32)
    ok = (k > 0) & (k < SIGNAL_SAMPLES)
    s = jnp.where(ok, iq[jnp.clip(k, 0, SIGNAL_SAMPLES - 1)], 0.0)
    c = jnp.zeros(SIGNAL_SAMPLES, dtype=iq.dtype)
    c = jax.lax.dynamic_update_slice(c, s * jnp.conj(r), (NFILT,))

    # 360-tap half-sine LPF, output restricted to
    # [NFILT/2, SIGNAL_SAMPLES - NFILT/2) (wsprd/wsprd.c:384-391)
    w = jnp.asarray(_W).astype(iq.real.dtype)
    cf = jnp.convolve(c, w.astype(iq.dtype), mode="same")
    pos = jnp.arange(SIGNAL_SAMPLES)
    cf = jnp.where((pos >= NFILT // 2) & (pos < SIGNAL_SAMPLES - NFILT // 2), cf, 0.0)

    # edge normalization by the filter's partial step response
    # (wsprd/wsprd.c:397-411)
    i = jnp.arange(NSIG)
    partial = jnp.asarray(_PARTIAL)
    norm = jnp.where(
        i < NFILT // 2, partial[NFILT // 2 + i],
        jnp.where(i > NSIG - 1 - NFILT // 2,
                  partial[jnp.clip(NFILT // 2 + NSIG - 1 - i, 0, NFILT - 1)],
                  1.0),
    )
    delta = cf[i + NFILT] * r / norm
    upd = jnp.where(ok, -delta, 0.0)
    return iq.at[jnp.clip(k, 0, SIGNAL_SAMPLES - 1)].add(upd)


@jax.jit
def subtract_signal(
    iq: jnp.ndarray, f0: jnp.ndarray, shift: jnp.ndarray,
    drift: jnp.ndarray, symbols: jnp.ndarray,
) -> jnp.ndarray:
    """Per-symbol amplitude estimate and subtraction
    (wsprd/wsprd.c:263-312; defined but unused in the reference)."""
    i = jnp.arange(NSYM, dtype=jnp.float32)
    cs = symbols.astype(jnp.float32)
    # NB: this variant uses (i - NBITS)/NBITS like sync (wsprd/wsprd.c:274)
    fsym = f0 + (drift / 2.0) * (i - 81.0) / 81.0 + (cs - 1.5) * DF
    dphi = TWOPIDT * fsym  # (162,)
    # phase resets at each symbol (c0[0]=1, wsprd/wsprd.c:280-286)
    phase = dphi[:, None] * jnp.arange(NSPERSYM, dtype=jnp.float32)[None, :]
    e = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))  # (162,256)

    k = (shift + (jnp.arange(NSYM)[:, None] * NSPERSYM)
         + jnp.arange(NSPERSYM)[None, :]).astype(jnp.int32)
    ok = (k > 0) & (k < SIGNAL_SAMPLES)
    s = jnp.where(ok, iq[jnp.clip(k, 0, SIGNAL_SAMPLES - 1)], 0.0)
    amp = jnp.sum(s * jnp.conj(e), axis=1) / NSPERSYM  # (162,)
    delta = amp[:, None] * e
    upd = jnp.where(ok, -delta, 0.0)
    return iq.at[jnp.clip(k.ravel(), 0, SIGNAL_SAMPLES - 1)].add(upd.ravel())
