#!/bin/bash
# Second-engine poison probe: A (repro), B (clear_caches), C (del+gc),
# each in its own process.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue17.log
echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue17 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"
probe() {
    timeout 300 python - <<'PEOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
PEOF
}
for V in A B C; do
    for i in $(seq 1 240); do probe && break; sleep 60; done
    echo "--- q17 probe $V ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout 3600 python scripts/second_engine_probe.py $V >> "$LOG" 2>&1
    echo "--- q17 probe $V rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
done
echo "=== tpu_queue17 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
