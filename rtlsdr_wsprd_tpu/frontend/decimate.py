"""Polyphase decimation: XLA reference path + streaming runtime.

Both stages use the same scheme: with T a multiple of R, the im2col
matrix for a chunk of output frames is built from tpp = T/R static
slices of the row-reshaped input (no gather), and the complex filter is
one real (chunk, 2T) @ (2T, 2) matmul — MXU shape. The Pallas kernel
(pallas_decimate.py) implements the identical contraction fused with
the uint8->float conversion for the 2.4 Msps stage.

The reference's equivalent is the per-sample C loop at
rtlsdr_wsprd.c:184-234 (CIC + FIR); parity is spectral + end-to-end,
not bitwise (SURVEY.md section 7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .filters import (
    R1,
    R2,
    STAGE1_TAPS,
    STAGE2_TAPS,
    combined_matrix,
    conv_order,
    stage1_coeffs,
    stage2_coeffs,
)

_CHUNK = 512  # output frames per scan step


def _stage_matrices():
    m1 = combined_matrix(conv_order(stage1_coeffs()))           # (1280, 2)
    m2 = combined_matrix(conv_order(stage2_coeffs().astype(np.complex64)))
    return m1, m2                                               # numpy!


_M1, _M2 = None, None


def _mats():
    """Filter matrices as NUMPY constants (safe to reference from any
    trace context; jit embeds them as literals)."""
    global _M1, _M2
    if _M1 is None:
        _M1, _M2 = _stage_matrices()
    return _M1, _M2


@partial(jax.jit, static_argnames=("R", "T", "n_frames"))
def _polyphase_chunked(xI, xQ, M, R: int, T: int, n_frames: int):
    """xI/xQ: float32[n_frames*R + T - R]; returns planar
    (float32[n_frames], float32[n_frames]).

    Frame m reads x[mR .. mR+T-1] (correlation order matching
    filters.conv_order). Planar output: no complex dtype on TPU.
    """
    tpp = T // R
    n_pad = (-n_frames) % _CHUNK
    F = n_frames + n_pad
    # pad input so every chunk's slice exists
    pad_in = F * R + T - R - xI.shape[0]
    xI = jnp.pad(xI, (0, pad_in))
    xQ = jnp.pad(xQ, (0, pad_in))
    rowsI = xI.reshape(-1, R)
    rowsQ = xQ.reshape(-1, R)

    def chunk(carry, r0):
        del carry
        # rows r0 .. r0 + _CHUNK + tpp - 2
        blkI = jax.lax.dynamic_slice_in_dim(rowsI, r0, _CHUNK + tpp - 1)
        blkQ = jax.lax.dynamic_slice_in_dim(rowsQ, r0, _CHUNK + tpp - 1)
        XI = jnp.concatenate([blkI[t:t + _CHUNK] for t in range(tpp)], axis=1)
        XQ = jnp.concatenate([blkQ[t:t + _CHUNK] for t in range(tpp)], axis=1)
        X = jnp.concatenate([XI, XQ], axis=1)                  # (chunk, 2T)
        y = jnp.dot(X, M, preferred_element_type=jnp.float32)  # (chunk, 2)
        return None, y

    starts = jnp.arange(0, F, _CHUNK, dtype=jnp.int32)
    _, ys = jax.lax.scan(chunk, None, starts)  # (n_chunks, chunk, 2)
    flat = ys.reshape(-1, 2)[:n_frames]
    return flat[:, 0], flat[:, 1]


def decimate_stage1_xla(xI: jnp.ndarray, xQ: jnp.ndarray,
                        n_frames: int):
    """2.4 Msps planar float32 -> 30 ksps planar (I, Q) float32 (fs/4
    mix folded in). Input length must be n_frames*R1 + STAGE1_TAPS - R1.
    """
    M1, _ = _mats()
    return _polyphase_chunked(xI, xQ, M1, R1, STAGE1_TAPS, n_frames)


def decimate_stage1_batched(xI: jnp.ndarray, xQ: jnp.ndarray,
                            n_frames: int):
    """Stage-1 polyphase over a CHANNEL batch: (C, L) planar float32 ->
    (C, n_frames) planar, L = n_frames*R1 + STAGE1_TAPS - R1.

    The single-stream scan is loop-step-overhead bound on the 2.4 Msps
    stage; batching channels multiplies the work per step instead of
    the step count (measured: 0.74 Gsps single stream -> 2.25 Gsps at
    C=256, i.e. ~940 real-time 2.4 Msps channels per chip). This is
    the production many-dongle/many-band ingest shape; each row is an
    independent stream (same math as decimate_stage1_xla per row).
    """
    M1, _ = _mats()
    return jax.vmap(
        lambda a, b: _polyphase_chunked(a, b, M1, R1, STAGE1_TAPS, n_frames)
    )(xI, xQ)


def decimate_stage2_xla(midI: jnp.ndarray, midQ: jnp.ndarray,
                        n_frames: int):
    """30 ksps planar -> 375 sps planar (I, Q) float32.

    Input length must be n_frames*R2 + STAGE2_TAPS - R2.
    """
    _, M2 = _mats()
    return _polyphase_chunked(midI, midQ, M2, R2, STAGE2_TAPS, n_frames)


def decimate_stage2_batched(midI: jnp.ndarray, midQ: jnp.ndarray,
                            n_frames: int):
    """Stage-2 polyphase over a channel batch: (C, L2) -> (C, n_frames),
    L2 = n_frames*R2 + STAGE2_TAPS - R2."""
    _, M2 = _mats()
    return jax.vmap(
        lambda a, b: _polyphase_chunked(a, b, M2, R2, STAGE2_TAPS, n_frames)
    )(midI, midQ)


@jax.jit
def u8_planar_to_f32(u8: jnp.ndarray) -> jnp.ndarray:
    """RTL uint8 -> centered float32 (the reference's XOR 0x80 recenter,
    rtlsdr_wsprd.c:171)."""
    return u8.astype(jnp.float32) - 128.0


def decimate_window(
    rawI: np.ndarray, rawQ: np.ndarray, n_out: int | None = None,
    use_pallas: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """One-shot 2.4 Msps -> 375 sps planar (I, Q) for a whole capture.

    rawI/rawQ: uint8 or float planar arrays (same length). Output is
    time-aligned so out[m] ~ input time m*6400 (half-filter priming).
    """
    L = rawI.shape[0]
    prime1 = STAGE1_TAPS // 2
    if rawI.dtype == np.uint8:
        xI = np.empty(L + prime1, np.float32)
        xQ = np.empty(L + prime1, np.float32)
        xI[:prime1] = 0.0
        xQ[:prime1] = 0.0
        xI[prime1:] = rawI.astype(np.float32) - 128.0
        xQ[prime1:] = rawQ.astype(np.float32) - 128.0
    else:
        xI = np.concatenate([np.zeros(prime1, np.float32),
                             rawI.astype(np.float32)])
        xQ = np.concatenate([np.zeros(prime1, np.float32),
                             rawQ.astype(np.float32)])

    n_mid = (xI.shape[0] - (STAGE1_TAPS - R1)) // R1
    need = n_mid * R1 + STAGE1_TAPS - R1
    if use_pallas:
        from .pallas_decimate import decimate_stage1_pallas
        midI, midQ = decimate_stage1_pallas(
            jnp.asarray(xI[:need]), jnp.asarray(xQ[:need]), n_mid)
    else:
        midI, midQ = decimate_stage1_xla(
            jnp.asarray(xI[:need]), jnp.asarray(xQ[:need]), n_mid)

    prime2 = STAGE2_TAPS // 2
    z = jnp.zeros(prime2, jnp.float32)
    midI = jnp.concatenate([z, midI])
    midQ = jnp.concatenate([z, midQ])
    n_final = (midI.shape[0] - (STAGE2_TAPS - R2)) // R2
    if n_out is not None:
        n_final = min(n_final, n_out)
    need2 = n_final * R2 + STAGE2_TAPS - R2
    outI, outQ = decimate_stage2_xla(midI[:need2], midQ[:need2], n_final)
    return np.asarray(outI), np.asarray(outQ)


class StreamingDecimator:
    """Stateful overlap-save streaming front end (host-driven).

    The reference carries CIC/FIR state in C statics across USB
    callbacks (rtlsdr_wsprd.c:129-156); here the state is explicit:
    float32 tails of (STAGE1_TAPS - R1) input samples and
    (STAGE2_TAPS - R2) mid-rate samples, primed half-filter for time
    alignment. ``push`` accepts arbitrary-size planar chunks and
    returns whatever 375 sps samples become available.
    """

    # work-size quanta: frame counts are static shapes under jit, so
    # processing only in these multiples bounds the number of compiled
    # executables regardless of push chunk sizes
    QUANT1 = 7500   # stage-1 output frames (0.25 s of mid-rate)
    QUANT2 = 125    # stage-2 output frames (1/3 s of baseband)

    def __init__(self, use_pallas: bool = False):
        self.use_pallas = use_pallas
        prime1 = STAGE1_TAPS // 2
        prime2 = STAGE2_TAPS // 2
        # prime half a filter of zeros so output m ~ input time m*6400
        self._bufI = np.zeros(prime1, np.float32)
        self._bufQ = np.zeros(prime1, np.float32)
        self._midI = np.zeros(prime2, np.float32)
        self._midQ = np.zeros(prime2, np.float32)
        self._tail1 = STAGE1_TAPS - R1
        self._tail2 = STAGE2_TAPS - R2

    def push(self, rawI: np.ndarray, rawQ: np.ndarray,
             exact: bool = False) -> tuple[np.ndarray, np.ndarray]:
        """Feed a chunk; returns newly available planar (I, Q) 375 sps
        samples. ``exact=True`` (flush) processes every whole frame
        available instead of quantized work sizes."""
        if rawI.dtype == np.uint8:
            fI = rawI.astype(np.float32) - 128.0
            fQ = rawQ.astype(np.float32) - 128.0
        else:
            fI = rawI.astype(np.float32)
            fQ = rawQ.astype(np.float32)
        self._bufI = np.concatenate([self._bufI, fI])
        self._bufQ = np.concatenate([self._bufQ, fQ])

        n_mid = (self._bufI.shape[0] - self._tail1) // R1
        if not exact:
            n_mid -= n_mid % self.QUANT1
        if n_mid > 0:
            need = n_mid * R1 + self._tail1
            if self.use_pallas:
                from .pallas_decimate import decimate_stage1_pallas
                mi, mq = decimate_stage1_pallas(
                    jnp.asarray(self._bufI[:need]),
                    jnp.asarray(self._bufQ[:need]), n_mid)
            else:
                mi, mq = decimate_stage1_xla(
                    jnp.asarray(self._bufI[:need]),
                    jnp.asarray(self._bufQ[:need]), n_mid)
            consumed = n_mid * R1
            self._bufI = self._bufI[consumed:]
            self._bufQ = self._bufQ[consumed:]
            self._midI = np.concatenate([self._midI, np.asarray(mi)])
            self._midQ = np.concatenate([self._midQ, np.asarray(mq)])

        n_out = (self._midI.shape[0] - self._tail2) // R2
        if not exact:
            n_out -= n_out % self.QUANT2
        if n_out <= 0:
            return np.zeros(0, np.float32), np.zeros(0, np.float32)
        need2 = n_out * R2 + self._tail2
        oi, oq = decimate_stage2_xla(jnp.asarray(self._midI[:need2]),
                                     jnp.asarray(self._midQ[:need2]), n_out)
        self._midI = self._midI[n_out * R2:]
        self._midQ = self._midQ[n_out * R2:]
        return np.asarray(oi), np.asarray(oq)

    def flush(self) -> tuple[np.ndarray, np.ndarray]:
        """Drain every whole output frame still in the pipeline."""
        return self.push(np.zeros(0, np.float32), np.zeros(0, np.float32),
                         exact=True)


class BatchedStreamingDecimator:
    """Stateful streaming front end for C channels in lockstep.

    Production many-dongle/many-band ingest: all channels receive the
    same-size chunk each ``push`` (a multi-channel source naturally
    delivers aligned blocks), so one batched device call advances every
    stream — the batched stage-1 kernel runs ~3x the aggregate Msps of
    per-channel calls (see decimate_stage1_batched). Per-row math is
    identical to StreamingDecimator; states are (C, n) planes.
    """

    QUANT1 = StreamingDecimator.QUANT1
    QUANT2 = StreamingDecimator.QUANT2

    def __init__(self, n_channels: int):
        C = n_channels
        prime1 = STAGE1_TAPS // 2
        prime2 = STAGE2_TAPS // 2
        self._bufI = np.zeros((C, prime1), np.float32)
        self._bufQ = np.zeros((C, prime1), np.float32)
        self._midI = np.zeros((C, prime2), np.float32)
        self._midQ = np.zeros((C, prime2), np.float32)
        self._tail1 = STAGE1_TAPS - R1
        self._tail2 = STAGE2_TAPS - R2

    def push(self, rawI: np.ndarray, rawQ: np.ndarray,
             exact: bool = False) -> tuple[np.ndarray, np.ndarray]:
        """Feed (C, n) planar chunks (uint8 or float); returns newly
        available (C, m) planar 375 sps samples (m can be 0)."""
        if rawI.dtype == np.uint8:
            fI = rawI.astype(np.float32) - 128.0
            fQ = rawQ.astype(np.float32) - 128.0
        else:
            fI = np.asarray(rawI, np.float32)
            fQ = np.asarray(rawQ, np.float32)
        self._bufI = np.concatenate([self._bufI, fI], axis=1)
        self._bufQ = np.concatenate([self._bufQ, fQ], axis=1)

        n_mid = (self._bufI.shape[1] - self._tail1) // R1
        if not exact:
            n_mid -= n_mid % self.QUANT1
        if n_mid > 0:
            need = n_mid * R1 + self._tail1
            mi, mq = decimate_stage1_batched(
                jnp.asarray(self._bufI[:, :need]),
                jnp.asarray(self._bufQ[:, :need]), n_mid)
            consumed = n_mid * R1
            self._bufI = self._bufI[:, consumed:]
            self._bufQ = self._bufQ[:, consumed:]
            self._midI = np.concatenate([self._midI, np.asarray(mi)], axis=1)
            self._midQ = np.concatenate([self._midQ, np.asarray(mq)], axis=1)

        n_out = (self._midI.shape[1] - self._tail2) // R2
        if not exact:
            n_out -= n_out % self.QUANT2
        C = self._bufI.shape[0]
        if n_out <= 0:
            return (np.zeros((C, 0), np.float32),
                    np.zeros((C, 0), np.float32))
        need2 = n_out * R2 + self._tail2
        oi, oq = decimate_stage2_batched(
            jnp.asarray(self._midI[:, :need2]),
            jnp.asarray(self._midQ[:, :need2]), n_out)
        self._midI = self._midI[:, n_out * R2:]
        self._midQ = self._midQ[:, n_out * R2:]
        return np.asarray(oi), np.asarray(oq)

    def flush(self) -> tuple[np.ndarray, np.ndarray]:
        """Drain every whole output frame still in the pipeline."""
        C = self._bufI.shape[0]
        return self.push(np.zeros((C, 0), np.float32),
                         np.zeros((C, 0), np.float32), exact=True)
