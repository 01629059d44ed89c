#!/bin/bash
# Follow-up TPU jobs: waits for the primary queue (pid in
# /tmp/tpu_queue.pid) to drain, then runs the retry/debug jobs.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue.log

if [ -f /tmp/tpu_queue.pid ]; then
    while kill -0 "$(cat /tmp/tpu_queue.pid)" 2>/dev/null; do
        sleep 30
    done
fi
echo "=== tpu_queue2 start $(date -u) ===" >> "$LOG"

probe() {
    timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
EOF
}

OK=0
for i in $(seq 1 680); do
    if probe; then
        OK=1
        break
    fi
    sleep 60
done
if [ "$OK" != 1 ]; then
    echo "tpu_queue2: TPU never came back" >> "$LOG"
    exit 1
fi

echo "--- q2 job 1: sedov L1 gate rerun (unbind snapshot fix) ---" >> "$LOG"
timeout 5400 python scripts/sedov_gate.py 100 0.02 >> "$LOG" 2>&1

echo "--- q2 job 2: tiered crash debug (eager stepping) ---" >> "$LOG"
timeout 3600 python scripts/tiered_debug.py 50 12 >> "$LOG" 2>&1

echo "--- q2 job 3: BDT evolved-40 bench (side 100) ---" >> "$LOG"
# evolve=80 drove the uniform grid to cap 640 (Sedov shell compression)
# and the Mosaic compile blew the job timeout; at 40 steps the rung
# hierarchy is developed but cap stays tractable
SPHEXA_BENCH_PROP=ve-bdt SPHEXA_BENCH_EVOLVE=40 timeout 3600 \
    python bench.py >> "$LOG" 2>&1

echo "=== tpu_queue2 done $(date -u) ===" >> "$LOG"
