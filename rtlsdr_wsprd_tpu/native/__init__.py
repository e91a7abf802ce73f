"""ctypes bindings for the native host runtime (native/hostdsp.cpp).

Builds the shared object on first use if g++ is available; every entry
point has a pure-Python/JAX fallback, so the framework works without a
toolchain (``AVAILABLE`` tells you which path you're on). The native
pieces mirror the reference's C host code: lookup3 nhash
(wsprd/nhash.c), the sequential Fano decoder (wsprd/fano.c) used here
as a parity oracle / CPU fallback, and uint8 IQ ingest
(rtlsdr_wsprd.c:158-182).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
# installed (non-repo) deployments point at the built library directly
_SO = Path(os.environ.get("RTLSDR_WSPRD_TPU_NATIVE",
                          _NATIVE_DIR / "libhostdsp.so"))

_lib = None

# ABI version this binding layer expects; must equal the .so's
# wspr_hostdsp_abi(). Bump BOTH (here and native/hostdsp.cpp) when an
# entry point is added/removed/changed. A mismatched (stale prebuilt)
# library is rejected outright — every caller then takes its
# pure-Python fallback — instead of binding a partial symbol set.
_ABI = 4


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _SO.exists()
    except (subprocess.SubprocessError, OSError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (_NATIVE_DIR / "Makefile").exists():
        _build()  # make decides staleness; no-op when fresh
    if not _SO.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    try:
        lib.wspr_hostdsp_abi.restype = ctypes.c_int
        abi = int(lib.wspr_hostdsp_abi())
    except AttributeError:
        abi = -1
    if abi != _ABI:
        # stale prebuilt .so (make above would have refreshed any repo
        # checkout); refuse to bind rather than call mismatched symbols
        return None

    lib.wspr_nhash.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.wspr_nhash.restype = ctypes.c_uint32

    lib.wspr_hashlittle.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32]
    lib.wspr_hashlittle.restype = ctypes.c_uint32

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.wspr_fano_decode.argtypes = [
        u8p, i32p, ctypes.c_int32, ctypes.c_uint32, u8p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.wspr_fano_decode.restype = ctypes.c_int

    lib.wspr_conv_encode.argtypes = [u8p, u8p, ctypes.c_int]
    lib.wspr_conv_encode.restype = None

    lib.u8_deinterleave_center.argtypes = [u8p, ctypes.c_uint64, f32p, f32p]
    lib.u8_deinterleave_center.restype = None

    lib.u8_deinterleave_pairs.argtypes = [u8p, ctypes.c_uint64, u8p, u8p]
    lib.u8_deinterleave_pairs.restype = None

    i64 = ctypes.c_int64
    lib.wspr_pp_decimate_f32.argtypes = [
        f32p, f32p, f32p, f32p, i64, i64, i64, f32p, f32p]
    lib.wspr_pp_decimate_f32.restype = None
    lib.wspr_pp_decimate_u8.argtypes = [
        u8p, u8p, f32p, f32p, i64, i64, i64, f32p, f32p]
    lib.wspr_pp_decimate_u8.restype = None
    lib.wspr_fir_decimate_f32.argtypes = [
        f32p, f32p, f32p, i64, i64, i64, f32p, f32p]
    lib.wspr_fir_decimate_f32.restype = None

    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.f32_quantize_i8.argtypes = [
        f32p, ctypes.c_uint64, ctypes.c_float, i8p]
    lib.f32_quantize_i8.restype = None
    lib.f32_quantize_i16.argtypes = [
        f32p, ctypes.c_uint64, ctypes.c_float, i16p]
    lib.f32_quantize_i16.restype = None

    _lib = lib
    return lib


AVAILABLE = (os.environ.get("RTLSDR_WSPRD_TPU_NO_NATIVE") != "1"
             and _load() is not None)


def nhash(callsign: str | bytes) -> int:
    lib = _load()
    if isinstance(callsign, str):
        callsign = callsign.encode("ascii")
    if lib is None:
        from ..utils.nhash import nhash as py_nhash
        return py_nhash(callsign)
    return int(lib.wspr_nhash(callsign, len(callsign)))


def fano_decode(symbols: np.ndarray, mettab: np.ndarray,
                delta: int = 60, maxcycles: int = 10000):
    """Sequential host Fano. symbols: uint8[162] (deinterleaved);
    mettab: int32[2, 256]. Returns (success, data[11], cycles, metric,
    maxnp) — full result parity with the reference's fano()
    (wsprd/fano.c:87-95: metric, cycles, maxnp = progress before
    timeout) and with ops.fano.batched_fano.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native hostdsp unavailable "
                           "(use ops.fano.batched_fano instead)")
    symbols = np.ascontiguousarray(symbols, np.uint8)
    mettab = np.ascontiguousarray(mettab, np.int32)
    assert symbols.shape == (162,) and mettab.shape == (2, 256)
    data = np.zeros(11, np.uint8)
    cycles = ctypes.c_uint32(0)
    metric = ctypes.c_int32(0)
    maxnp = ctypes.c_int32(0)
    ok = lib.wspr_fano_decode(symbols, mettab.reshape(-1), delta, maxcycles,
                              data, ctypes.byref(cycles),
                              ctypes.byref(metric), ctypes.byref(maxnp))
    return (bool(ok), data, int(cycles.value), int(metric.value),
            int(maxnp.value))


def fano_decode_many(symbols: np.ndarray, mettab: np.ndarray,
                     delta: int = 60, maxcycles: int = 10000,
                     threads: int = 16):
    """Sequential host Fano over a batch (threaded; the ctypes call
    releases the GIL). symbols: uint8[N, 162] deinterleaved.

    Returns (success bool[N], data uint8[N, 11], cycles uint32[N],
    metric int32[N], maxnp int32[N]). Used as the straggler path of
    the hybrid FEC decode: lanes whose search outruns the device
    budget are re-run here from scratch — Fano is deterministic, so
    results equal a full-budget run bit for bit (semantics of
    wsprd/fano.c).
    """
    from concurrent.futures import ThreadPoolExecutor

    n = symbols.shape[0]
    success = np.zeros(n, bool)
    data = np.zeros((n, 11), np.uint8)
    cycles = np.zeros(n, np.uint32)
    metric = np.zeros(n, np.int32)
    maxnp = np.zeros(n, np.int32)
    if n == 0:
        return success, data, cycles, metric, maxnp
    mettab = np.ascontiguousarray(mettab, np.int32)

    def run(k):
        ok, d, c, m, mn = fano_decode(symbols[k], mettab, delta, maxcycles)
        success[k] = ok
        data[k] = d
        cycles[k] = c
        metric[k] = m
        maxnp[k] = mn

    if n == 1 or threads <= 1:
        for k in range(n):
            run(k)
    else:
        with ThreadPoolExecutor(max_workers=min(threads, n)) as ex:
            list(ex.map(run, range(n)))
    return success, data, cycles, metric, maxnp


def conv_encode(data: np.ndarray, nsym: int = 162) -> np.ndarray:
    lib = _load()
    data = np.ascontiguousarray(data, np.uint8)
    assert data.shape == (11,)
    if lib is None:
        raise RuntimeError("native hostdsp unavailable")
    out = np.zeros(nsym, np.uint8)
    lib.wspr_conv_encode(data, out, nsym)
    return out


def u8_deinterleave_center(raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved uint8 IQ -> planar recentered float32 (I, Q)."""
    raw = np.ascontiguousarray(raw, np.uint8)
    n = raw.shape[0] // 2
    lib = _load()
    if lib is None:
        f = raw[:2 * n].astype(np.float32) - 128.0
        return np.ascontiguousarray(f[0::2]), np.ascontiguousarray(f[1::2])
    out_i = np.empty(n, np.float32)
    out_q = np.empty(n, np.float32)
    lib.u8_deinterleave_center(raw, n, out_i, out_q)
    return out_i, out_q


def u8_deinterleave_pairs(raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved uint8 IQ -> planar uint8 (I, Q), no centering (the
    device stage-1 kernel centers; runtime/sources.py read_pairs)."""
    raw = np.ascontiguousarray(raw, np.uint8)
    n = raw.shape[0] // 2
    lib = _load()
    if lib is None:
        return (np.ascontiguousarray(raw[: 2 * n : 2]),
                np.ascontiguousarray(raw[1 : 2 * n : 2]))
    out_i = np.empty(n, np.uint8)
    out_q = np.empty(n, np.uint8)
    lib.u8_deinterleave_pairs(raw, n, out_i, out_q)
    return out_i, out_q


# the ABI gate above guarantees a bound library has every entry point
HAS_DECIMATE = AVAILABLE


def pp_decimate(xI: np.ndarray, xQ: np.ndarray, gr: np.ndarray,
                gi: np.ndarray, R: int,
                n_frames: int) -> tuple[np.ndarray, np.ndarray]:
    """Complex-tap polyphase decimation on host (one output per R
    inputs; conv-ordered taps; uint8 inputs centered by -128 inline).
    Same math as the device kernel frontend/decimate._polyphase_pp —
    the host-placed front end for link-constrained deployments
    (frontend/host_decimate.py)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hostdsp polyphase unavailable "
                           "(rebuild native/, or use the device path)")
    taps = gr.shape[0]
    assert xI.shape == xQ.shape == (n_frames * R + taps - R,)
    gr = np.ascontiguousarray(gr, np.float32)
    gi = np.ascontiguousarray(gi, np.float32)
    yI = np.empty(n_frames, np.float32)
    yQ = np.empty(n_frames, np.float32)
    if xI.dtype == np.uint8:
        lib.wspr_pp_decimate_u8(np.ascontiguousarray(xI),
                                np.ascontiguousarray(xQ),
                                gr, gi, taps, R, n_frames, yI, yQ)
    else:
        lib.wspr_pp_decimate_f32(
            np.ascontiguousarray(xI, np.float32),
            np.ascontiguousarray(xQ, np.float32),
            gr, gi, taps, R, n_frames, yI, yQ)
    return yI, yQ


def fir_decimate(xI: np.ndarray, xQ: np.ndarray, g: np.ndarray, R: int,
                 n_frames: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-tap polyphase decimation on host (both planes share taps)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hostdsp polyphase unavailable")
    taps = g.shape[0]
    assert xI.shape == xQ.shape == (n_frames * R + taps - R,)
    yI = np.empty(n_frames, np.float32)
    yQ = np.empty(n_frames, np.float32)
    lib.wspr_fir_decimate_f32(
        np.ascontiguousarray(xI, np.float32),
        np.ascontiguousarray(xQ, np.float32),
        np.ascontiguousarray(g, np.float32), taps, R, n_frames, yI, yQ)
    return yI, yQ


def quantize_into(x: np.ndarray, out: np.ndarray, scale: float) -> None:
    """float32 -> int8/int16 transfer quantization: round to nearest
    (ties to even), clamp to the dtype's symmetric range, NaN -> 0.
    Writes into ``out`` (int8 or int16, same shape as ``x``). One
    native pass when available; numpy fallback otherwise."""
    assert x.dtype == np.float32 and x.flags.c_contiguous
    assert out.flags.c_contiguous and out.shape == x.shape
    lib = _load()
    fn = None
    if lib is not None:
        fn = (lib.f32_quantize_i8 if out.dtype == np.int8
              else lib.f32_quantize_i16)
    if fn is None:
        lim = 127 if out.dtype == np.int8 else 32767
        out[...] = np.clip(np.nan_to_num(np.rint(x * scale)), -lim, lim)
        return
    fn(x.reshape(-1), x.size, np.float32(scale), out.reshape(-1))
