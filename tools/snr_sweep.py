"""Decode-sensitivity sweep: message parity rate vs SNR, ours vs the
compiled reference oracle on IDENTICAL windows.

Synthesizes T trials per SNR point (one K1JT FN20 37 signal + WGN per
window, random frequency), decodes every window through (a) the staged
batched path on the current backend and (b) the reference wsprd
compiled as a ctypes oracle (tests/oracle) on the same float samples,
and prints both rates side by side. The WSPR protocol's design
sensitivity is about -28 dB SNR in 2500 Hz (SURVEY.md section 6).

Usage: python tools/snr_sweep.py [trials_per_point] [transfer_dtype]
(transfer_dtype: int8 default, int16, float32; pass --no-oracle to
skip the reference run; ``--floor-trials N`` raises the trial count to
N at the sensitivity floor, SNR <= -29 dB, where ±2/100 sampling noise
would otherwise swamp the ours-vs-reference delta — VERDICT r3 item 5)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from rtlsdr_wsprd_tpu.config import DecoderOptions  # noqa: E402
from rtlsdr_wsprd_tpu.parallel.multichannel import decode_channels  # noqa: E402
from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db  # noqa: E402
from rtlsdr_wsprd_tpu.runtime.synth import synth_window_at_snr  # noqa: E402

SNRS = [0, -15, -20, -24, -26, -28, -29, -30, -31]
MSG = "K1JT FN20 37"


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--no-oracle"]
    use_oracle = "--no-oracle" not in sys.argv
    floor_trials = 0
    if "--floor-trials" in args:
        k = args.index("--floor-trials")
        floor_trials = int(args[k + 1])
        del args[k:k + 2]
    trials = int(args[0]) if len(args) > 0 else 32
    tdt = args[1] if len(args) > 1 else "int8"

    oracle = None
    if use_oracle:
        import tempfile

        import oracle as oracle_mod
        if oracle_mod.available():
            oracle = oracle_mod
            workdir = tempfile.mkdtemp(prefix="snr_oracle_")
        else:
            print("(reference oracle unavailable; ours-only sweep)")

    options = DecoderOptions()
    rng = np.random.default_rng(2026)
    hdr = f"{'SNR dB':>7} {'ours':>9} {'rate':>6}"
    if oracle:
        hdr += f" {'ref':>9} {'rate':>6} {'ours-ref':>8}"
    print(hdr + f"  (transfer={tdt}, trials={trials}"
          + (f", floor {floor_trials} at <=-29" if floor_trials else "")
          + ")")
    for snr in SNRS:
        T = max(trials, floor_trials) if snr <= -29 else trials
        wi = np.zeros((T, 45000), np.float32)
        wq = np.zeros((T, 45000), np.float32)
        for t in range(T):
            f0 = float(rng.uniform(-100, 100))
            i, q = synth_window_at_snr(MSG, snr_db=float(snr), f0=f0,
                                       seed=int(rng.integers(1 << 30)))
            wi[t], wq[t] = normalize_minus3db(i, q)
        ours = np.zeros(T, bool)
        for b0 in range(0, T, 128):  # bound device residency
            spots = decode_channels(wi[b0:b0 + 128], wq[b0:b0 + 128],
                                    options, device_batch=32,
                                    transfer_dtype=tdt)
            ours[b0:b0 + 128] = [any(s.call == "K1JT" and s.loc == "FN20"
                                     for s in ch) for ch in spots]
        row = f"{snr:>7} {int(ours.sum()):>5}/{T:<3} " \
              f"{ours.mean():>6.3f}"
        if oracle:
            ref = np.zeros(T, bool)
            for t in range(T):
                rs = oracle.wspr_decode_reference(
                    wi[t], wq[t], dialfreq=14095600, workdir=workdir)
                ref[t] = any(s.call == "K1JT" and s.loc == "FN20"
                             for s in rs)
            row += f" {int(ref.sum()):>5}/{T:<3} {ref.mean():>6.3f}" \
                   f" {int(ours.sum()) - int(ref.sum()):>+8d}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
