"""STFT power spectrogram of a 2-minute WSPR window.

The reference computes 347 sequential 512-point FFTW transforms with a
quarter-symbol hop and a pseudo-Hann window, then fftshifts into a
power array ps[512][347] (wsprd/wsprd.c:496-553). Here the whole
spectrogram is one batched FFT: frame the window into a (347, 512)
matrix (one XLA gather), window it (fused multiply), and FFT along the
last axis — the shape XLA tiles best on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import FFT_SIZE, SIGNAL_SAMPLES

# blocks = 4 * floor(samples / 512) - 1 (wsprd/wsprd.c:516)
BLOCKS = 4 * (SIGNAL_SAMPLES // FFT_SIZE) - 1  # = 347
HOP = FFT_SIZE // 4  # quarter-symbol hop = 128


def _hann() -> np.ndarray:
    # pseudo-Hann: sin(0.006147931 * i) ~= sin(pi*i/511) (wsprd/wsprd.c:510-513)
    return np.sin(0.006147931 * np.arange(FFT_SIZE, dtype=np.float64)).astype(np.float32)


HANN = _hann()


def power_spectrogram(iq: jnp.ndarray) -> jnp.ndarray:
    """iq: complex64[SIGNAL_SAMPLES] -> ps: float32[FFT_SIZE, BLOCKS].

    ps[j, b] is the power in fftshifted bin j (bin 256 = DC) of frame b,
    matching the reference's quarter-symbol-hop layout
    (wsprd/wsprd.c:536-553). Frequency resolution is DF/2 = 375/512 Hz
    per bin; frame b starts at sample 128*b.
    """
    starts = jnp.arange(BLOCKS) * HOP
    idx = starts[:, None] + jnp.arange(FFT_SIZE)[None, :]  # (BLOCKS, 512)
    frames = iq[idx] * jnp.asarray(HANN)  # (BLOCKS, 512) complex64
    spec = jnp.fft.fft(frames, axis=-1)
    ps = spec.real**2 + spec.imag**2  # (BLOCKS, 512) float32
    # fftshift: output bin j reads FFT bin (j + 256) mod 512 (wsprd/wsprd.c:547-551)
    ps = jnp.roll(ps, FFT_SIZE // 2, axis=-1)
    return ps.T  # (512, BLOCKS)
