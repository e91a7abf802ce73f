"""Oracle-paired sensitivity matrix over drift and time offset.

The SNR sweep (tools/snr_sweep.py) is single-signal, zero-drift,
fixed-DT (VERDICT r3 weak item 5). This tool covers the rest of the
reference's search space on identical windows: a (drift x DT) grid at
fixed SNR — drift spans the decoder's +-4 Hz/2min model
(wsprd/wsprd.c:156, maxdrift) and DT spans +-2 s of the nominal 2 s
start offset (the lag search, wsprd/wsprd.c:585-591) — decoding every
cell through (a) the staged batched path and (b) the compiled
reference oracle, same float samples.

Usage: python tools/sensitivity_matrix.py [trials_per_cell] [snr_db]
(defaults: 50 trials, -27 dB — deep enough that losses show, above the
floor so sampling noise doesn't swamp the comparison)
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

DRIFTS = [-4.0, -2.0, 0.0, 2.0, 4.0]
DTS = [0.0, 1.0, 2.0, 3.0, 4.0]  # t0 seconds (nominal 2.0; +-2 s)
MSG = "K1JT FN20 37"


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    snr = float(sys.argv[2]) if len(sys.argv) > 2 else -27.0

    import tempfile

    import oracle as oracle_mod
    oracle = oracle_mod if oracle_mod.available() else None
    workdir = tempfile.mkdtemp(prefix="sens_matrix_") if oracle else None
    if oracle is None:
        print("(reference oracle unavailable; ours-only matrix)")

    options = DecoderOptions()
    rng = np.random.default_rng(20260820)
    print(f"SNR {snr} dB, {trials} trials/cell; cell = ours/ref "
          f"(drift rows, DT columns)")
    print(f"{'drift':>6} | " + " ".join(f"t0={t:<11}" for t in DTS))
    for drift in DRIFTS:
        cells = []
        for t0 in DTS:
            wi = np.zeros((trials, 45000), np.float32)
            wq = np.zeros((trials, 45000), np.float32)
            for t in range(trials):
                f0 = float(rng.uniform(-100, 100))
                i, q = synth_window_at_snr(
                    MSG, snr_db=snr, f0=f0, t0=t0, drift=drift,
                    seed=int(rng.integers(1 << 30)))
                wi[t], wq[t] = normalize_minus3db(i, q)
            spots = decode_channels(wi, wq, options, device_batch=32)
            ours = sum(any(s.call == "K1JT" and s.loc == "FN20"
                           for s in ch) for ch in spots)
            if oracle:
                ref = 0
                for t in range(trials):
                    rs = oracle.wspr_decode_reference(
                        wi[t], wq[t], dialfreq=14095600, workdir=workdir)
                    ref += any(s.call == "K1JT" and s.loc == "FN20"
                               for s in rs)
                cells.append(f"{ours:>3}/{ref:<3} ({ours - ref:+d})")
            else:
                cells.append(f"{ours:>3}/{trials:<3}")
        print(f"{drift:>6} | " + " ".join(f"{c:<14}" for c in cells),
              flush=True)


if __name__ == "__main__":
    main()
