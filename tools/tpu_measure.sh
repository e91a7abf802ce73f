#!/bin/bash
# One serialized TPU measurement pass (run after the tunnel is healthy):
# probes with a tiny op first, then runs the full measurement set one
# process at a time (the axon tunnel serves ONE process reliably;
# concurrent clients contend). Logs land in /tmp/tpu_r3/.
#
#   bash tools/tpu_measure.sh
#
# Produces: bench JSON (decode + front end + e2e ingest->spots),
# roofline/MFU table, staged-path phase timings.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r3}
mkdir -p "$OUT"

echo "== probe =="
timeout 900 python - <<'EOF' || { echo "TPU not healthy; aborting"; exit 1; }
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
x = jnp.ones((128, 128))
print("TPU_OK", float((x @ x).sum()))
EOF

echo "== bench (B=512 DB=128) =="
timeout 5400 python bench.py 2>&1 | tee "$OUT/bench.log"

echo "== roofline (B=128) =="
timeout 5400 python tools/roofline.py 128 2>&1 | tee "$OUT/roofline.log"

echo "== staged phase profile (B=512 DB=128) =="
timeout 5400 python tools/profile_staged.py 512 128 2>&1 | tee "$OUT/profile_staged.log"

echo "== e2e device scan-step sweep =="
timeout 5400 python tools/e2e_sweep.py 2>&1 | tee "$OUT/e2e_sweep.log"

echo "== done; logs in $OUT =="
