#!/bin/bash
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue19.log
echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue19 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"
probe() {
    timeout 300 python - <<'PEOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
PEOF
}
for MT in 4 3 2 1; do
    for i in $(seq 1 240); do probe && break; sleep 60; done
    echo "--- q19 probe max_tiers=$MT ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout 3600 python scripts/tier_count_probe.py $MT 30 >> "$LOG" 2>&1
    echo "--- q19 probe max_tiers=$MT rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
done
echo "=== tpu_queue19 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
