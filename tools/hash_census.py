"""Type-2/type-3 census through the PIPELINED staged path.

The 15-bit callsign hashtable (utils/hashtable.py) is taught by type-1
and type-2 decodes and consulted by type-3 ``<hash>`` spots. The
reference decodes windows strictly sequentially, so a teaching decode
is always visible to the next window (wsprd/wsprd_utils.c:275-300);
the 2-deep pipeline (parallel/multichannel.decode_channels_pipelined)
trades that for overlap — a type-3 whose teacher is in the IMMEDIATELY
preceding batch may resolve as ``<...>`` unless ``strict_hash_order``
serializes batches. This tool measures that trade on a compound-call
heavy stream (VERDICT r3 item 5): pairs of (type-2 teacher, type-3
user) at batch gaps 1 and 2, decoded through the pipelined path with
``usehashtable`` in both modes.

Usage: python tools/hash_census.py [n_pairs]
Prints one JSON line per mode. Results recorded in PARITY.md.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from rtlsdr_wsprd_tpu.config import DecoderOptions  # noqa: E402
from rtlsdr_wsprd_tpu.parallel.multichannel import (  # noqa: E402
    decode_channels_pipelined,
)
from rtlsdr_wsprd_tpu.runtime.iqio import normalize_minus3db  # noqa: E402
from rtlsdr_wsprd_tpu.runtime.synth import synth_window_at_snr  # noqa: E402
from rtlsdr_wsprd_tpu.utils.hashtable import WsprHashTable  # noqa: E402

PREFIXES = ["PJ4", "OH0", "TF3", "ZB2", "EA8", "VP9", "CT3", "5B4"]


def build_stream(n_pairs: int):
    """Batches of (wi, wq) plus the expected type-3 resolutions.

    Pair j: its type-2 teacher ``P/CALL pwr`` decodes in batch t_j; its
    type-3 ``<P/CALL> LOC6 pwr`` sits at batch t_j + gap_j, gap
    alternating 1 (pipeline worst case) and 2 (visible even with the
    2-deep overlap). One pair per batch slot; a type-1 filler rides
    every batch so each batch also teaches ordinary traffic.
    """
    slots: dict[int, list[str]] = {}
    expect = []  # (batch, call string when resolved)
    for j in range(n_pairs):
        prefix = PREFIXES[j % len(PREFIXES)]
        call = f"K{1 + j % 9}AB{chr(ord('A') + j % 26)}"
        compound = f"{prefix}/{call}"
        teach, gap = 2 * j, 1 + j % 2
        slots.setdefault(teach, []).append(f"{compound} 37")
        slots.setdefault(teach + gap, []).append(
            f"<{compound}> FK52UD 37")
        expect.append((teach + gap, f"<{compound}>", gap))
    n_batches = max(slots) + 1
    batches = []
    rng = np.random.default_rng(99)
    for b in range(n_batches):
        msgs = slots.get(b, []) + [f"K9AN EN50 3{b % 10}"]
        wi = np.zeros((len(msgs), 45000), np.float32)
        wq = np.zeros((len(msgs), 45000), np.float32)
        for c, m in enumerate(msgs):
            i, q = synth_window_at_snr(
                m, snr_db=8.0, f0=float(rng.uniform(-80, 80)),
                seed=int(rng.integers(1 << 30)))
            wi[c], wq[c] = normalize_minus3db(i, q)
        batches.append((wi, wq))
    return batches, expect


def run(batches, expect, strict: bool) -> dict:
    opts = DecoderOptions(quickmode=True, usehashtable=True)
    out = list(decode_channels_pipelined(
        iter([(wi.copy(), wq.copy()) for wi, wq in batches]), opts,
        WsprHashTable(), depth=2, device_batch=4,
        strict_hash_order=strict))
    resolved = {1: 0, 2: 0}
    hashed = {1: 0, 2: 0}
    missing = 0
    for b, call, gap in expect:
        calls = {s.call for ch in out[b] for s in ch}
        if call in calls:
            resolved[gap] += 1
        elif "<...>" in calls:
            hashed[gap] += 1
        else:
            missing += 1
    total_spots = sum(len(s) for ch in out for s in ch)
    return {
        "mode": "strict" if strict else "pipelined",
        "type3_resolved_gap1": resolved[1], "type3_hashed_gap1": hashed[1],
        "type3_resolved_gap2": resolved[2], "type3_hashed_gap2": hashed[2],
        "type3_undecoded": missing, "total_spots": total_spots,
    }


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batches, expect = build_stream(n_pairs)
    n1 = sum(1 for _, _, g in expect if g == 1)
    n2 = len(expect) - n1
    for strict in (False, True):
        r = run(batches, expect, strict)
        r["pairs_gap1"] = n1
        r["pairs_gap2"] = n2
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
