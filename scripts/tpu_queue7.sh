#!/bin/bash
# Chains after tpu_queue6: workaround probes for the
# second-combined-program failure, then (if D1 split programs pass)
# the split-gravity evrard benches.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue7.log

while ! grep -q "tpu_queue6 done" artifacts/tpu_queue6.log 2>/dev/null; do
    sleep 60
done
echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue7 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

probe() {
    timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
EOF
}

wait_tpu() {
    for i in $(seq 1 680); do
        if probe; then return 0; fi
        sleep 60
    done
    echo "tpu_queue7: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q7 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    echo "--- q7 job done: $name rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
}

# 1. D1 (split programs) / D2 (explicit args) workaround probes
run_job "fmm split/args probes" 7200 python scripts/fmm_split_probe.py 24

# 2-3. evrard tiered benches under the split-gravity step (reads the
#      probe verdict implicitly: if D1 failed these fail the same way)
run_job "evrard-50 tiered rebuild bench (split gravity)" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_TIERED=rebuild SPHEXA_SPLIT_GRAVITY=1 python bench.py
run_job "evrard-50 tiered resident bench (split gravity)" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_SPLIT_GRAVITY=1 python bench.py

echo "=== tpu_queue7 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
