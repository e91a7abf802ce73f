"""Wideband channelizer: N WSPR dials from ONE 2.4 Msps capture.

The reference binds one dongle to one 200 Hz WSPR band
(rtlsdr_wsprd.c:1044-1124). A 2.4 Msps capture actually spans
+/-1.2 MHz around the tuned center, which can hold several WSPR dials
(137/475 kHz LF+MF under direct sampling, 5.2887+7.0386 MHz 60m+40m,
...). This module decodes ALL of them from the one stream: per dial k
the raw baseband is derotated by

    exp(j 2*pi delta_k n / fs),   delta_k = tuned_dial - dial_k

which moves dial_k's band to the -600 kHz slot the stage-1 polyphase
expects (frontend/filters.py mixer convention), and the shared
polyphase chain then runs with K channel rows — on TPU the raw block
is uploaded ONCE and fans out to all dials inside one fused device
step (derotate + stage 1 + stage 2, mid carry device-resident), so K
bands cost one band's link bytes.

Placement mirrors the front-end policy (frontend/host_decimate.py):
``device`` fuses everything into one XLA program; ``host`` derotates
with the native C++ kernel and reuses HostBatchedStreamingDecimator —
the auto choice on RPC-tunneled backends.

Phase bookkeeping: tables hold cos/sin(theta_k * p) for buffer
position p; a per-dial scalar phasor carries the accumulated phase
(float64 on host, advanced by exactly the consumed sample count each
step, so re-derotated carry-tail samples get identical phase). The
window-constant residual phase per dial is irrelevant to WSPR decode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from .decimate import _center_f32, _polyphase_pp, _pp_mats
from .filters import R1, R2, STAGE1_TAPS, STAGE2_TAPS
from .host_decimate import HostBatchedStreamingDecimator

FS = 2_400_000


@partial(jax.jit, static_argnames=("n_mid",))
def _channelized_frontend_step(rawI, rawQ, tabC, tabS, phC, phS,
                               m2I, m2Q, n_mid: int):
    """One fused derotate + stage-1 + stage-2 step for K dials.

    rawI/rawQ: uint8|float32[L] single raw stream,
    L = n_mid*R1 + tail1; tabC/tabS: float32[K, L] per-dial phasor
    tables for buffer positions 0..L-1; phC/phS: float32[K] carried
    phase scalars; m2I/m2Q: float32[K, m] device-resident mid carry.
    Returns (outI, outQ, new m2I, new m2Q) like _fused_frontend_step.
    """
    H1t, H1b, H2t, H2b = _pp_mats()
    tail2 = STAGE2_TAPS - R2
    fI = _center_f32(rawI)
    fQ = _center_f32(rawQ)
    c = phC[:, None] * tabC - phS[:, None] * tabS
    s = phC[:, None] * tabS + phS[:, None] * tabC
    yI = fI[None, :] * c - fQ[None, :] * s
    yQ = fI[None, :] * s + fQ[None, :] * c
    mi, mq = _polyphase_pp(yI, yQ, H1t, H1b, n_mid)
    midI = jnp.concatenate([m2I, mi], axis=1)
    midQ = jnp.concatenate([m2Q, mq], axis=1)
    n_out = (midI.shape[1] - tail2) // R2
    need2 = n_out * R2
    oi, oq = _polyphase_pp(midI[:, :need2 + tail2],
                           midQ[:, :need2 + tail2], H2t, H2b, n_out)
    return oi, oq, midI[:, need2:], midQ[:, need2:]


def _phasor_tables(offsets_hz: np.ndarray, length: int):
    """cos/sin(2*pi*delta_k*p/fs) float32[K, length], float64 math."""
    p = np.arange(length, dtype=np.float64)
    theta = 2.0 * np.pi * offsets_hz[:, None] / FS
    ang = theta * p[None, :]
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


class ChannelizingStreamingDecimator:
    """Stateful streaming channelizer: push one raw stream, get K
    375 sps channels.

    ``offsets_hz[k] = tuned_dial - dial_k`` (0 for the tuned dial
    itself). Same push/flush contract as BatchedStreamingDecimator
    except the input is the single stream — (n,) or (1, n) planar
    uint8/float32 — and the output is (K, m) planar float32.
    """

    QUANT1 = 8000  # stage-1 frames per fused step (mult of R2)

    def __init__(self, offsets_hz, placement: str = "device",
                 threads: int = 8):
        self.offsets = np.asarray(offsets_hz, np.float64)
        K = self.offsets.shape[0]
        self._K = K
        self.placement = placement
        prime1 = STAGE1_TAPS // 2
        prime2 = STAGE2_TAPS // 2
        self._prime1 = prime1
        self._tail1 = STAGE1_TAPS - R1
        # stream sample j receives phase theta*j on both placements:
        # the device path indexes its phasor table by BUFFER position,
        # whose first prime1 entries are the zero pad, so its phase
        # origin starts at -theta*prime1
        if placement == "device":
            self._phase = np.mod(
                -2.0 * np.pi * self.offsets * prime1 / FS, 2.0 * np.pi)
        else:
            self._phase = np.zeros(K, np.float64)
        self._tabs: dict[int, tuple] = {}
        if placement == "host":
            if not native.HAS_DECIMATE:
                raise RuntimeError("native hostdsp polyphase unavailable")
            # derotation happens per incoming chunk (stream-positioned
            # phase); the host decimator carries the raw remnant itself
            self._host = HostBatchedStreamingDecimator(K, threads=threads)
        elif placement == "device":
            self._bufI = None  # primed by first push (dtype-decided)
            self._bufQ = None
            self._m2I = jnp.zeros((K, prime2), jnp.float32)
            self._m2Q = jnp.zeros((K, prime2), jnp.float32)
        else:
            raise ValueError(f"unknown placement: {placement!r}")

    # -- shared helpers -----------------------------------------------------

    def _tables(self, length: int, device: bool):
        key = (length, device)
        t = self._tabs.get(key)
        if t is None:
            if len(self._tabs) >= 8:  # bound memory under odd chunking
                self._tabs.clear()
            c, s = _phasor_tables(self.offsets, length)
            if device:
                c, s = jnp.asarray(c), jnp.asarray(s)
            t = self._tabs[key] = (c, s)
        return t

    def _advance_phase(self, n: int) -> None:
        self._phase = np.mod(
            self._phase + 2.0 * np.pi * self.offsets * n / FS,
            2.0 * np.pi)

    @staticmethod
    def _flat(raw: np.ndarray) -> np.ndarray:
        if raw.ndim == 2:
            assert raw.shape[0] == 1, "channelizer takes ONE raw stream"
            return raw[0]
        return raw

    # -- host placement: derotate per chunk, reuse the host decimator -------

    def _push_host(self, rawI, rawQ, exact):
        n = rawI.shape[0]
        K = self._K
        if n:
            if rawI.dtype == np.uint8:
                fI = rawI.astype(np.float32) - 128.0
                fQ = rawQ.astype(np.float32) - 128.0
            else:
                fI = rawI.astype(np.float32)
                fQ = rawQ.astype(np.float32)
            tabC, tabS = self._tables(n, device=False)
            yI = np.empty((K, n), np.float32)
            yQ = np.empty((K, n), np.float32)
            for k in range(K):
                cph = np.float32(np.cos(self._phase[k]))
                sph = np.float32(np.sin(self._phase[k]))
                native.derotate(fI, fQ, tabC[k], tabS[k], cph, sph,
                                yI[k], yQ[k])
            self._advance_phase(n)
            return self._host.push(yI, yQ, exact)
        return self._host.push(np.zeros((K, 0), np.float32),
                               np.zeros((K, 0), np.float32), exact)

    # -- device placement: fused derotate+stage1+stage2 ---------------------

    def _push_device(self, rawI, rawQ, exact):
        in_dtype = (np.uint8 if rawI.dtype == np.uint8 else np.float32)
        if self._bufI is None:
            fill = 128 if in_dtype == np.uint8 else 0
            self._bufI = np.full(self._prime1, fill, in_dtype)
            self._bufQ = np.full(self._prime1, fill, in_dtype)
        if in_dtype != self._bufI.dtype and rawI.size > 0:
            if self._bufI.dtype == np.uint8:
                self._bufI = self._bufI.astype(np.float32) - 128.0
                self._bufQ = self._bufQ.astype(np.float32) - 128.0
            else:
                rawI = rawI.astype(np.float32) - 128.0
                rawQ = rawQ.astype(np.float32) - 128.0
        if rawI.size > 0:
            self._bufI = np.concatenate(
                [self._bufI, np.asarray(rawI, self._bufI.dtype)])
            self._bufQ = np.concatenate(
                [self._bufQ, np.asarray(rawQ, self._bufQ.dtype)])

        K = self._K
        n_whole = (self._bufI.shape[0] - self._tail1) // R1
        n_mid = n_whole - (n_whole % (R2 if exact else self.QUANT1))
        if n_mid > 0:
            need = n_mid * R1 + self._tail1
            tabC, tabS = self._tables(need, device=True)
            phC = jnp.asarray(np.cos(self._phase).astype(np.float32))
            phS = jnp.asarray(np.sin(self._phase).astype(np.float32))
            oi, oq, self._m2I, self._m2Q = _channelized_frontend_step(
                jnp.asarray(self._bufI[:need]),
                jnp.asarray(self._bufQ[:need]),
                tabC, tabS, phC, phS, self._m2I, self._m2Q, n_mid)
            self._bufI = self._bufI[n_mid * R1:]
            self._bufQ = self._bufQ[n_mid * R1:]
            self._advance_phase(n_mid * R1)
            out = np.asarray(oi), np.asarray(oq)
        else:
            out = (np.zeros((K, 0), np.float32),
                   np.zeros((K, 0), np.float32))
        if not exact:
            return out
        self._stage1_rest(n_whole - n_mid)  # < R2 frames, host derotate
        rest = self._drain_mid()
        return (np.concatenate([out[0], rest[0]], axis=1),
                np.concatenate([out[1], rest[1]], axis=1))

    def _stage1_rest(self, n_rest: int) -> None:
        """Flush remainder stage-1 frames (< R2) into the mid carry:
        host derotation (tiny) + the unfused stage-1 kernel, so flush
        loses no whole output frame while the steady-state fused step
        keeps its single fixed executable."""
        if n_rest <= 0:
            return
        from .decimate import decimate_stage1_batched

        need = n_rest * R1 + self._tail1
        if self._bufI.dtype == np.uint8:
            fI = self._bufI[:need].astype(np.float32) - 128.0
            fQ = self._bufQ[:need].astype(np.float32) - 128.0
        else:
            fI = self._bufI[:need].astype(np.float32)
            fQ = self._bufQ[:need].astype(np.float32)
        tabC, tabS = _phasor_tables(self.offsets, need)
        cph = np.cos(self._phase).astype(np.float32)[:, None]
        sph = np.sin(self._phase).astype(np.float32)[:, None]
        c = cph * tabC - sph * tabS
        s = cph * tabS + sph * tabC
        yI = fI[None, :] * c - fQ[None, :] * s
        yQ = fI[None, :] * s + fQ[None, :] * c
        mi, mq = decimate_stage1_batched(jnp.asarray(yI), jnp.asarray(yQ),
                                         n_rest)
        self._m2I = jnp.concatenate([self._m2I, jnp.asarray(mi)], axis=1)
        self._m2Q = jnp.concatenate([self._m2Q, jnp.asarray(mq)], axis=1)
        self._bufI = self._bufI[n_rest * R1:]
        self._bufQ = self._bufQ[n_rest * R1:]
        self._advance_phase(n_rest * R1)

    def _drain_mid(self):
        """Flush whole output frames still in the device mid carry."""
        from .decimate import decimate_stage2_batched

        tail2 = STAGE2_TAPS - R2
        midI, midQ = np.asarray(self._m2I), np.asarray(self._m2Q)
        n_out = (midI.shape[1] - tail2) // R2
        if n_out <= 0:
            return (np.zeros((self._K, 0), np.float32),
                    np.zeros((self._K, 0), np.float32))
        need2 = n_out * R2 + tail2
        oi, oq = decimate_stage2_batched(
            jnp.asarray(midI[:, :need2]), jnp.asarray(midQ[:, :need2]),
            n_out)
        self._m2I = jnp.asarray(midI[:, n_out * R2:])
        self._m2Q = jnp.asarray(midQ[:, n_out * R2:])
        return np.asarray(oi), np.asarray(oq)

    # -- public API ----------------------------------------------------------

    def push(self, rawI: np.ndarray, rawQ: np.ndarray,
             exact: bool = False) -> tuple[np.ndarray, np.ndarray]:
        rawI, rawQ = self._flat(rawI), self._flat(rawQ)
        if self.placement == "host":
            return self._push_host(rawI, rawQ, exact)
        return self._push_device(rawI, rawQ, exact)

    def flush(self) -> tuple[np.ndarray, np.ndarray]:
        return self.push(np.zeros(0, np.float32),
                         np.zeros(0, np.float32), exact=True)


__all__ = ["ChannelizingStreamingDecimator"]
