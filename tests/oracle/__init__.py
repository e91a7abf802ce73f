"""Reference-decoder test oracle.

Compiles the read-only reference sources (/root/reference/wsprd/*.c)
plus our minimal FFTW shim into a shared library at test time, exposing
``wspr_decode`` via ctypes. This gives exact reference spot values
(snr/dt/freq/drift/sync/message) for any synthetic input — the
strongest possible parity oracle. Skips gracefully when gcc or the
reference tree is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from dataclasses import dataclass
from pathlib import Path

import numpy as np

REF = Path("/root/reference")
HERE = Path(__file__).resolve().parent

_LIB = None


def _build() -> Path | None:
    if not (REF / "wsprd" / "wsprd.c").exists():
        return None
    out = Path(tempfile.gettempdir()) / "libwsprd_oracle.so"
    if out.exists():
        return out
    srcs = [
        str(REF / "wsprd" / s)
        for s in ("wsprd.c", "wsprd_utils.c", "wsprsim_utils.c",
                  "fano.c", "tab.c", "nhash.c")
    ] + [str(HERE / "fftw_shim.c")]
    cmd = ["gcc", "-O2", "-shared", "-fPIC", "-I", str(HERE), "-o", str(out), *srcs, "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return out


class _DecoderOptionsC(ctypes.Structure):
    # struct decoder_options (wsprd/wsprd.h:44-52)
    _fields_ = [
        ("freq", ctypes.c_int),
        ("rcall", ctypes.c_char * 13),
        ("rloc", ctypes.c_char * 7),
        ("quickmode", ctypes.c_int),
        ("usehashtable", ctypes.c_int),
        ("npasses", ctypes.c_int),
        ("subtraction", ctypes.c_int),
    ]


class _DecoderResultsC(ctypes.Structure):
    # struct decoder_results (wsprd/wsprd.h:62-74)
    _fields_ = [
        ("freq", ctypes.c_double),
        ("sync", ctypes.c_float),
        ("snr", ctypes.c_float),
        ("dt", ctypes.c_float),
        ("drift", ctypes.c_float),
        ("jitter", ctypes.c_int),
        ("message", ctypes.c_char * 23),
        ("call", ctypes.c_char * 13),
        ("loc", ctypes.c_char * 7),
        ("pwr", ctypes.c_char * 3),
        ("cycles", ctypes.c_int),
    ]


@dataclass
class OracleSpot:
    freq: float
    sync: float
    snr: float
    dt: float
    drift: float
    jitter: int
    message: str
    call: str
    loc: str
    pwr: str
    cycles: int


def available() -> bool:
    return _build() is not None


def wspr_decode_reference(
    i_samples: np.ndarray,
    q_samples: np.ndarray,
    dialfreq: int = 0,
    npasses: int = 2,
    subtraction: bool = True,
    quickmode: bool = False,
    usehashtable: bool = False,
    workdir: str | None = None,
) -> list[OracleSpot]:
    """Run the REFERENCE decoder on a window. NB: mutates nothing; runs
    in ``workdir`` (hashtable.txt / fftw_wisdom.dat side effects)."""
    global _LIB
    lib_path = _build()
    assert lib_path is not None, "oracle unavailable"
    if _LIB is None:
        _LIB = ctypes.CDLL(str(lib_path))
        _LIB.wspr_decode.restype = ctypes.c_int

    # copies: the reference decoder mutates the window in place
    # (subtract_signal2, wsprd/wsprd.c:785)
    i = np.array(i_samples, dtype=np.float32, copy=True, order="C")
    q = np.array(q_samples, dtype=np.float32, copy=True, order="C")
    assert i.size == q.size == 45000

    opts = _DecoderOptionsC(
        freq=dialfreq, rcall=b"", rloc=b"",
        quickmode=int(quickmode), usehashtable=int(usehashtable),
        npasses=npasses, subtraction=int(subtraction),
    )
    results = (_DecoderResultsC * 110)()
    n = ctypes.c_int(0)
    cwd = os.getcwd()
    try:
        if workdir:
            os.chdir(workdir)
        _LIB.wspr_decode(
            i.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(45000), opts, results, ctypes.byref(n),
        )
    finally:
        os.chdir(cwd)
    out = []
    for k in range(n.value):
        r = results[k]
        out.append(OracleSpot(
            freq=r.freq, sync=r.sync, snr=r.snr, dt=r.dt, drift=r.drift,
            jitter=r.jitter, message=r.message.decode("ascii", "replace"),
            call=r.call.decode("ascii", "replace"),
            loc=r.loc.decode("ascii", "replace"),
            pwr=r.pwr.decode("ascii", "replace"), cycles=r.cycles,
        ))
    return out
