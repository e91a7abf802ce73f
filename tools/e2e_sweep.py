"""Measure (don't attribute) the device e2e chain's per-scan-step cost.

bench.py's ``e2e_realtime_channels_per_chip_device`` runs each 120 s
window as ``S = 45000 / (N_MID / 80)`` fused front-end steps inside a
lax.scan. On dispatch-bound backends (this container's RPC tunnel pays
one round trip per device-loop iteration) the per-window wall clock is
affine in the step count:

    t(S) = t_chip + S * c_step

Round 3 ATTRIBUTED the gap between the measured e2e number and the
standalone front-end bound to that per-step RPC; this tool MEASURES it
(VERDICT r3 item 4): sweep N_MID (the scan-step quantum), fit the
line, and report c_step plus the S -> 0 chip-only asymptote next to
each measured point.

Usage (real TPU): python tools/e2e_sweep.py [DC] [DWIN]
Prints one JSON line. Results recorded in PARITY.md.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

# N_MID must be a multiple of 80 with N_MID/80 dividing 45000.
# 60k/120k/240k/360k -> 60/30/15/10 steps per window; the raw block is
# N_MID*80 uint8 per channel per plane, so big quanta trade HBM for
# fewer dispatches (360k at C=64: ~3.7 GB raw residency).
N_MIDS = (60_000, 120_000, 240_000, 360_000)


def main() -> None:
    import numpy as np

    from bench import REF_WINDOWS_PER_S, make_batch, measure_e2e_device
    from rtlsdr_wsprd_tpu.config import DecoderOptions

    # defaults match bench.py's shipped e2e config (C=128 since round
    # 4's batch-shape sweep; the 2026-08-20 answer to the question this
    # tool asks — is t(S) affine in step count? — was NO at C=64:
    # slope -5.2 ms/step with 72 ms residuals, i.e. no per-step RPC)
    DC = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    DWIN = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    wi, wq = make_batch(DC)
    options = DecoderOptions()

    points = []
    for n_mid in N_MIDS:
        # raw residency: 2 planes x DC x (n_mid*80) uint8; the tunnel's
        # compiler rejects the biggest quanta at large DC (measured:
        # 360k at DC=128 = 7.4 GB raw -> remote_compile HTTP 500), so
        # skip what cannot fit instead of recording an error point
        raw_gb = 2 * DC * n_mid * 80 / 1e9
        if raw_gb > 6.0:
            print(f"(skipping n_mid={n_mid}: ~{raw_gb:.1f} GB raw "
                  f"residency at DC={DC})")
            continue
        try:
            channels, dt, steps, _d = measure_e2e_device(
                wi, wq, options, DC=DC, DWIN=DWIN, N_MID=n_mid)
        except Exception as exc:  # e.g. HBM OOM at the largest quantum
            points.append({"n_mid": n_mid, "error": str(exc)[:120]})
            continue
        points.append({
            "n_mid": n_mid, "steps_per_window": steps,
            "s_per_window": round(dt / DWIN, 4),
            "realtime_channels_per_chip": round(channels, 1),
        })

    ok = [p for p in points if "error" not in p]
    fit = {}
    if len(ok) >= 2:
        S = np.array([p["steps_per_window"] for p in ok], float)
        T = np.array([p["s_per_window"] for p in ok], float)
        c_step, t_chip = np.polyfit(S, T, 1)
        resid = T - (t_chip + c_step * S)
        chip_only = DC * 120.0 / max(t_chip, 1e-9)
        fit = {
            "per_step_ms": round(1e3 * c_step, 2),
            "chip_only_s_per_window": round(t_chip, 4),
            "chip_only_realtime_channels_per_chip": round(chip_only, 1),
            "fit_max_resid_ms": round(1e3 * float(np.abs(resid).max()), 2),
            "vs_baseline": round(
                chip_only / 120.0 / REF_WINDOWS_PER_S, 3),
        }
    print(json.dumps({
        "metric": "e2e_device_step_overhead", "DC": DC, "DWIN": DWIN,
        "points": points, "fit": fit,
    }))


if __name__ == "__main__":
    main()
