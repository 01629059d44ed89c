#!/bin/bash
# Follow-up to tpu_queue4: validates the FMM shared-kernel-cache fix
# (ffc3478) and re-runs everything the constant-hoisting bug poisoned.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue5.log

if [ -f /tmp/tpu_queue.pid ]; then
    while kill -0 "$(cat /tmp/tpu_queue.pid)" 2>/dev/null; do
        sleep 30
    done
fi
echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue5 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

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
    echo "tpu_queue5: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q5 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    echo "--- q5 job done: $name rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
}

# 1. the minimal two-program FMM repro (pre-fix: prog 2 call 2 dies)
run_job "fmm two-program probe" 7200 python scripts/fmm_crash_probe.py

# 2. full isolation ladder rerun with the fix
run_job "tiered isolation ladder rerun" 10800 python scripts/tiered_isolate.py

# 3-5. the Evrard tiered benches (the round's missing numbers)
run_job "evrard-50 tiered resident bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 python bench.py
run_job "evrard-50 tiered rebuild bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_TIERED=rebuild python bench.py
run_job "evrard-50 tiered-bdt bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_PROP=ve-tiered-bdt python bench.py

# 6. Noh 100^3 physics gate
run_job "noh L1 gate 100^3" 14400 python scripts/noh_gate.py 100 0.05

echo "=== tpu_queue5 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
