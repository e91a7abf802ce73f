"""Coarse (freq, time-shift, drift) estimation for all candidates at once.

The reference runs a triple-nested grid per candidate sequentially
(wsprd/wsprd.c:646-678): 3 freq bins x 32 time lags x (2*maxdrift+1)
drifts, scoring a pr3-signed sum of sqrt-power at the 4 tone bins over
162 symbols. Here the whole (candidate x freq x lag x drift x symbol)
tensor is evaluated in one shot — the natural TPU formulation.

Deliberate divergence from the reference (documented, see SURVEY.md
section 7 "quirks"): the C guards only kindex < blocks and reads out of
bounds for kindex < 0 (wsprd/wsprd.c:657); we mask kindex < 0 as
invalid instead of reading garbage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import DF, NBITS, NSYM
from ..utils.channel import PR3_VECTOR
from .stft import BLOCKS

N_FREQ = 3          # ifr in if0-1..if0+1
K0_MIN, K0_MAX = -10, 21  # time search (wsprd/wsprd.c:650)
N_LAG = K0_MAX - K0_MIN + 1  # 32
MAX_DRIFT_SPAN = 4  # compile-time width; actual drift limited by mask
N_DRIFT = 2 * MAX_DRIFT_SPAN + 1  # 9


class CoarseEstimate(NamedTuple):
    freq: jnp.ndarray   # float32[C] refined bin freq, Hz
    shift: jnp.ndarray  # int32[C] sample shift = 128*(k0+1)
    drift: jnp.ndarray  # float32[C]
    sync: jnp.ndarray   # float32[C]


_PR3_SIGN = (2.0 * PR3_VECTOR.astype(np.float32) - 1.0)  # (162,)


def coarse_search(ps: jnp.ndarray, bin_idx: jnp.ndarray, maxdrift: int = 4) -> CoarseEstimate:
    """ps: float32[512, BLOCKS]; bin_idx: int32[C] smspec bin per candidate.

    Returns the best (freq, shift, drift, sync) per candidate over the
    full grid, with the C's first-max-wins tie-breaking in (ifr, k0,
    idrift) loop order (wsprd/wsprd.c:646-678).
    """
    sqrtps = jnp.sqrt(ps)  # (512, BLOCKS)

    # if0 = freq/(DF/2) + 256 = (j - 205) + 256 = j + 51 (wsprd/wsprd.c:648)
    if0 = bin_idx.astype(jnp.int32) + 51  # (C,)

    ifr = if0[:, None] + jnp.arange(-1, 2, dtype=jnp.int32)[None, :]  # (C, 3)
    k0 = jnp.arange(K0_MIN, K0_MAX + 1, dtype=jnp.int32)              # (32,)
    idrift = jnp.arange(-MAX_DRIFT_SPAN, MAX_DRIFT_SPAN + 1, dtype=jnp.int32)  # (9,)
    k = jnp.arange(NSYM, dtype=jnp.int32)                             # (162,)

    # ifd = (int)(ifr + (k - 81)/81 * idrift / DF): the C truncates the
    # whole float sum toward zero (wsprd/wsprd.c:655), NOT the drift
    # term alone — for negative fractional drift terms these differ.
    fd = ((k[None, :].astype(jnp.float32) - NBITS) / NBITS)[..., None] \
        * idrift[None, None, :].astype(jnp.float32) / DF  # (1, 162, 9)
    ifd = jnp.trunc(
        ifr[:, :, None, None].astype(jnp.float32) + fd
    ).astype(jnp.int32)  # (C, 3, 162, 9)

    kindex = k0[:, None] + 2 * k[None, :]  # (32, 162)
    time_ok = (kindex >= 0) & (kindex < BLOCKS)  # (32, 162)
    kindex_c = jnp.clip(kindex, 0, BLOCKS - 1)

    # gather sqrt powers at the four tone bins: (C, 3, 162, 9) x (32, 162)
    # -> p[t][C, 3, 32, 9, 162]
    def tone(offset: int) -> jnp.ndarray:
        rows = jnp.clip(ifd + offset, 0, 511)  # (C, 3, 162, 9)
        # sqrtps[rows, kindex]: broadcast (C,3,1,9,162) rows with (1,1,32,1,162) cols
        r = jnp.transpose(rows, (0, 1, 3, 2))[:, :, None, :, :]   # (C,3,1,9,162)
        c = kindex_c[None, None, :, None, :]                      # (1,1,32,1,162)
        return sqrtps[r, c]                                       # (C,3,32,9,162)

    p0, p1, p3_, p2 = tone(-3), tone(-1), tone(3), tone(1)
    mask = time_ok[None, None, :, None, :]
    cmet = (p1 + p3_) - (p0 + p2)
    totp = p0 + p1 + p2 + p3_
    sign = jnp.asarray(_PR3_SIGN)[None, None, None, None, :]
    ss = jnp.sum(jnp.where(mask, sign * cmet, 0.0), axis=-1)   # (C,3,32,9)
    pw = jnp.sum(jnp.where(mask, totp, 0.0), axis=-1)          # (C,3,32,9)
    sync = ss / jnp.maximum(pw, 1e-30)

    # drift mask: grid is always 9 wide, but |idrift| must be <= maxdrift
    # (pass 3 runs with maxdrift=0, wsprd/wsprd.c:529)
    dmask = (jnp.abs(idrift) <= maxdrift)[None, None, None, :]
    sync = jnp.where(dmask, sync, -jnp.inf)

    flat = sync.reshape(sync.shape[0], -1)  # (C, 3*32*9) in (ifr,k0,idrift) order
    best = jnp.argmax(flat, axis=1)         # first max wins = C loop order
    bi = best // (N_LAG * N_DRIFT)
    bk = (best // N_DRIFT) % N_LAG
    bd = best % N_DRIFT

    best_ifr = jnp.take_along_axis(ifr, bi[:, None], axis=1)[:, 0]
    freq = (best_ifr - 256).astype(jnp.float32) * (DF / 2.0)
    shift = 128 * (k0[bk] + 1)
    drift = idrift[bd].astype(jnp.float32)
    best_sync = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    return CoarseEstimate(freq=freq, shift=shift, drift=drift, sync=best_sync)
