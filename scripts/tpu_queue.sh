#!/bin/bash
# Waits for the tunneled TPU backend to come back, then runs the
# round's pending chip jobs sequentially. Logs to artifacts/tpu_queue.log.
cd "$(dirname "$0")/.."
mkdir -p artifacts
LOG=artifacts/tpu_queue.log
echo "=== tpu_queue start $(date -u) ===" >> "$LOG"

probe() {
    timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
EOF
}

OK=0
for i in $(seq 1 680); do
    if probe; then
        echo "TPU back at $(date -u) (probe $i)" >> "$LOG"
        OK=1
        break
    fi
    sleep 60
done
if [ "$OK" != 1 ]; then
    echo "TPU never came back" >> "$LOG"
    exit 1
fi

# vmem-OOM retries first (these all died on the 16 MiB scoped-vmem
# default before the CompilerParams raise, artifacts 2026-08-19):
echo "--- job 1: sedov L1 gate (side 100) ---" >> "$LOG"
timeout 5400 python scripts/sedov_gate.py 100 0.02 >> "$LOG" 2>&1

echo "--- job 2: evrard-50 tiered bench (resident) ---" >> "$LOG"
SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 timeout 3600 \
    python bench.py >> "$LOG" 2>&1

echo "--- job 3: evrard-50 tiered bench (rebuild, comparison) ---" >> "$LOG"
SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 SPHEXA_BENCH_TIERED=rebuild \
    timeout 3600 python bench.py >> "$LOG" 2>&1

echo "--- job 4: evrard-50 tiered-BDT bench ---" >> "$LOG"
SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 SPHEXA_BENCH_PROP=ve-tiered-bdt \
    timeout 3600 python bench.py >> "$LOG" 2>&1

# re-confirmation at the new HEAD (both already captured 2026-08-19):
echo "--- job 5: sedov bench sanity ---" >> "$LOG"
timeout 2400 python bench.py >> "$LOG" 2>&1

echo "--- job 6: BDT evolved bench ---" >> "$LOG"
SPHEXA_BENCH_PROP=ve-bdt SPHEXA_BENCH_EVOLVE=80 timeout 2400 \
    python bench.py >> "$LOG" 2>&1

echo "--- job 7: xplane trace at HEAD ---" >> "$LOG"
timeout 1800 python scripts/trace_stages.py 100 >> "$LOG" 2>&1

echo "=== tpu_queue done $(date -u) ===" >> "$LOG"
