"""Decode-sensitivity sweep: message parity rate vs SNR.

Synthesizes T trials per SNR point (one K1JT FN20 37 signal + WGN per
window, random frequency), decodes through the staged batched path on
the current backend, and prints the decode rate. The WSPR protocol's
design sensitivity is about -28 dB SNR in 2500 Hz (SURVEY.md section
6); the reference decoder's practical floor is around -26..-28 dB.

Usage: python tools/snr_sweep.py [trials_per_point] [transfer_dtype]
(transfer_dtype: int8 default, int16, float32)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from rtlsdr_wsprd_tpu.config import DecoderOptions  # noqa: E402
from rtlsdr_wsprd_tpu.parallel.multichannel import decode_channels  # noqa: E402
from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db  # noqa: E402
from rtlsdr_wsprd_tpu.runtime.synth import synth_window_at_snr  # noqa: E402

SNRS = [0, -15, -20, -24, -26, -28, -29, -30, -31]
MSG = "K1JT FN20 37"


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tdt = sys.argv[2] if len(sys.argv) > 2 else "int8"
    options = DecoderOptions()
    rng = np.random.default_rng(2026)
    print(f"{'SNR dB':>7} {'decoded':>8} {'rate':>6}  (transfer={tdt})")
    for snr in SNRS:
        wi = np.zeros((trials, 45000), np.float32)
        wq = np.zeros((trials, 45000), np.float32)
        for t in range(trials):
            f0 = float(rng.uniform(-100, 100))
            i, q = synth_window_at_snr(MSG, snr_db=float(snr), f0=f0,
                                       seed=int(rng.integers(1 << 30)))
            wi[t], wq[t] = normalize_minus3db(i, q)
        spots = decode_channels(wi, wq, options, device_batch=32,
                                transfer_dtype=tdt)
        ok = sum(1 for ch in spots
                 for s in ch if s.call == "K1JT" and s.loc == "FN20")
        print(f"{snr:>7} {ok:>5}/{trials:<3} {ok / trials:>6.2f}")


if __name__ == "__main__":
    main()
