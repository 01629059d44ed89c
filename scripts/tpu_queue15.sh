#!/bin/bash
# Round-5 follow-up queue: waits for tpu_queue10 to drain, then
# re-runs the Noh gate (its queue10 slot was cut short) with the
# escalating-headroom tiered retry fix.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue15.log

# wait for queue11 to COMPLETE (its log's done marker — the pid-file
# gap between queue10 and queue11 would let both fire at once)
for i in $(seq 1 1440); do
    grep -q "tpu_queue14 done" artifacts/tpu_queue14.log 2>/dev/null && break
    sleep 60
done

echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue15 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

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
    echo "tpu_queue15: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q11 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "--- q11 job done: $name rc=$rc ($(date -u +%H:%M)) ---" >> "$LOG"
    return $rc
}



run_job "evrard-50 tiered resident bench (transient ride-out)" 14400 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_CAP_MAX_TOP=128 python bench.py

echo "=== tpu_queue15 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
