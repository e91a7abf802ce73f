#!/bin/bash
# Round-4 serialized TPU measurement session: core perf set
# (tpu_measure.sh) plus the sensitivity evidence set. ONE TPU process
# at a time; run with the host core otherwise idle.
#
#   bash tools/tpu_measure_r4.sh [/tmp/tpu_r4]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r4}
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

echo "== roofline (B=128) =="
timeout 5400 python tools/roofline.py 128 2>&1 | tee "$OUT/roofline.log"

echo "== e2e device scan-step sweep =="
timeout 5400 python tools/e2e_sweep.py 2>&1 | tee "$OUT/e2e_sweep.log"

echo "== SNR sweep, 100/point + 300 at the floor =="
timeout 10800 python tools/snr_sweep.py 100 --floor-trials 300 2>&1 | tee "$OUT/snr_sweep.log"

echo "== drift x DT sensitivity matrix (50/cell at -27 dB) =="
timeout 7200 python tools/sensitivity_matrix.py 50 -27 2>&1 | tee "$OUT/sens_matrix.log"

echo "== type-2/3 hash census (pipelined vs strict) =="
timeout 3600 python tools/hash_census.py 24 2>&1 | tee "$OUT/hash_census.log"

echo "== crowded-band precision/recall vs the oracle =="
timeout 7200 python tools/crowded_band.py 2>&1 | tee "$OUT/crowded_band.log"

echo "== done; logs in $OUT =="
