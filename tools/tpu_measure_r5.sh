#!/bin/bash
# Round-5 serialized TPU measurement session. ONE TPU process at a
# time; run with the host core otherwise idle.
#
# Scope (VERDICT r4 item 8): re-measure the headline under the same
# discipline (median-of-5, link conditions quoted), re-run the hash
# census through the race-FIXED pipelined path, the crowded-band
# study with the npasses=2 vs 3 A/B (beyond-reference passes), and
# the staged phase profile. The CPU-only FEC threading evidence
# (tools/fec_scaling.py) runs separately without the TPU.
#
#   bash tools/tpu_measure_r5.sh [/tmp/tpu_r5]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r5}
mkdir -p "$OUT"

echo "== probe =="
timeout 900 python - <<'EOF' || { echo "TPU not healthy; aborting"; exit 1; }
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
x = jnp.ones((128, 128))
print("TPU_OK", float((x @ x).sum()))
EOF

echo "== bench (median of 5, B=512 DB=128) =="
timeout 5400 python bench.py 2>&1 | tee "$OUT/bench.log"

echo "== staged phase profile (B=512 DB=128) =="
timeout 5400 python tools/profile_staged.py 512 128 2>&1 | tee "$OUT/profile_staged.log"

echo "== type-2/3 hash census through the RACE-FIXED pipelined path =="
timeout 3600 python tools/hash_census.py 24 2>&1 | tee "$OUT/hash_census.log"

echo "== crowded band: npasses 2 vs 3 A/B vs the oracle =="
timeout 10800 python tools/crowded_band.py 100 12 2,3 2>&1 | tee "$OUT/crowded_band.log"

echo "== crowded band: Fano budget sweep (10k vs 3x vs 10x, paired) =="
timeout 10800 python tools/crowded_band.py 40 12 2,2@30000,2@100000 2>&1 | tee "$OUT/crowded_budget.log"

echo "== done; logs in $OUT =="
