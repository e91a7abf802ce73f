"""Generate rtlsdr_wsprd_tpu/utils/metric_tables.py from the reference header.

The WSPR Fano decoder's soft-decision branch metrics are protocol constants:
5 simulated 2-FSK log-likelihood tables for Es/N0 in {0,3,6,9,12} dB
(reference: wsprd/metric_tables.h:8-139). The decoder uses table index 2
with a 0.45 bias (reference: wsprd/wsprd.c:467-473). They must match
bit-for-bit for decode parity, so we extract them mechanically here rather
than retyping them.

Run:  python tools/gen_metric_tables.py
"""
import re
from pathlib import Path

SRC = Path("/root/reference/wsprd/metric_tables.h")
DST = Path(__file__).resolve().parent.parent / "rtlsdr_wsprd_tpu" / "utils" / "metric_tables.py"


def main() -> None:
    text = SRC.read_text()
    # Grab everything inside the initializer braces of metric_tables[5][256].
    m = re.search(r"metric_tables\[5\]\[256\]\s*=\s*\{(.*)\};", text, re.S)
    assert m, "could not locate metric_tables initializer"
    body = m.group(1)
    rows = re.findall(r"\{([^{}]*)\}", body, re.S)
    assert len(rows) == 5, f"expected 5 rows, got {len(rows)}"
    tables = []
    for row in rows:
        vals = [v.strip() for v in row.replace("\n", " ").split(",") if v.strip()]
        assert len(vals) == 256, f"expected 256 values, got {len(vals)}"
        tables.append(vals)

    lines = [
        '"""WSPR Fano-decoder soft-decision metric tables (protocol constants).',
        "",
        "Five simulated 2-FSK LLR tables for Es/N0 = 0, 3, 6, 9, 12 dB, 256 soft",
        "symbol values each. Extracted verbatim (by tools/gen_metric_tables.py)",
        "from the reference decoder (wsprd/metric_tables.h:8-139); the decoder",
        "builds its integer branch-metric table from METRIC_TABLES[2] with a 0.45",
        "bias (wsprd/wsprd.c:467-473). Bit-exact values are required for decode",
        'parity. Generated file: do not edit by hand."""',
        "",
        "METRIC_TABLES = (",
    ]
    for tab in tables:
        lines.append("    (")
        for i in range(0, 256, 8):
            lines.append("        " + ", ".join(tab[i : i + 8]) + ",")
        lines.append("    ),")
    lines.append(")")
    lines.append("")
    DST.write_text("\n".join(lines))
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
