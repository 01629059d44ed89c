#!/bin/bash
# tiered-BDT lever, single-plan (loose clamp budget avoids the
# second-engine poison's re-tier path).
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue21.log
echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue21 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"
probe() {
    timeout 300 python - <<'PEOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
PEOF
}
for i in $(seq 1 240); do probe && break; sleep 60; done
echo "--- q21 job: tiered-BDT lever bench evrard-30 (budget 0.2) ($(date -u +%H:%M)) ---" >> "$LOG"
timeout 10800 env SPHEXA_BENCH_PROP=ve-tiered-bdt SPHEXA_BENCH_CASE=evrard \
    SPHEXA_BENCH_SIDE=30 SPHEXA_CAP_MAX_TOP=128 SPHEXA_CLAMP_BUDGET=0.2 SPHEXA_SPLIT_GRAVITY=1 \
    python bench.py >> "$LOG" 2>&1
echo "--- q21 job done rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
echo "=== tpu_queue21 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
