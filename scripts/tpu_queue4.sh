#!/bin/bash
# Follow-up to tpu_queue3: waits for it to drain, then runs the fixed
# jobs — the tiered-crash isolation ladder first (it decides whether
# the Evrard numbers are trustworthy), then the benches whose geometry
# the aligned()/cap_max fixes changed.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue4.log

if [ -f /tmp/tpu_queue.pid ]; then
    while kill -0 "$(cat /tmp/tpu_queue.pid)" 2>/dev/null; do
        sleep 30
    done
fi
echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue4 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

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
    echo "tpu_queue4: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q4 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    echo "--- q4 job done: $name rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
}

# 1. tiered worker-crash isolation ladder (rungs small -> crashing)
run_job "tiered isolation ladder" 10800 python scripts/tiered_isolate.py

# 2. BDT evolved head-to-head: aligned() now routes the evolved
#    re-grid to cap 384 (vreg-aligned centers, Z=2)
run_job "BDT evolved-40 bench (aligned caps)" 7200 env \
    SPHEXA_BENCH_PROP=ve-bdt SPHEXA_BENCH_EVOLVE=40 python bench.py

# 3. Sedov 100^3 L1 gate with the cap_max=256 tiered phase
run_job "sedov L1 gate 100^3 (cap 256 tiers)" 14400 \
    python scripts/sedov_gate.py 100 0.02

# 4-5. Evrard tiered benches (trust depends on job 1's verdict)
run_job "evrard-50 tiered resident bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 python bench.py
run_job "evrard-50 tiered rebuild bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_TIERED=rebuild python bench.py

# 6. tiered-BDT on Evrard (cap-128 tiers via the adaptive ladder)
run_job "evrard-50 tiered-bdt bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_PROP=ve-tiered-bdt python bench.py

# 7. primitive micro-benchmarks (queue3 output was lost)
run_job "perf_micro primitives" 3600 python scripts/perf_micro.py

echo "=== tpu_queue4 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
