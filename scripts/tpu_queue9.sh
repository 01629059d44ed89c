#!/bin/bash
# Round-4c evidence queue: the gates + benches that died on the
# cap>=256 compile wall, now running on the compile-safe fallbacks
# (sedov/noh gates: uniform cap<=128 -> tiered/XLA-gather deep phase;
# evrard tiered benches: SPHEXA_CAP_MAX_TOP=128 pins the headroom
# ladder to the proven cap).
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue9.log

echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue9 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

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
    echo "tpu_queue9: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q9 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "--- q9 job done: $name rc=$rc ($(date -u +%H:%M)) ---" >> "$LOG"
    return $rc
}

# 1. the headline physics artifact: sedov 100^3 L1 gate
#    (uniform engine to cap 128, then the XLA gather deep phase)
run_job "sedov L1 gate 100^3 (xla deep)" 14400 python scripts/sedov_gate.py 100

# 2. evrard-50 tiered rebuild bench: split gravity + headroom ladder
#    pinned to compile-safe caps
run_job "evrard-50 tiered rebuild bench (split, captop 128)" 10800 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_TIERED=rebuild SPHEXA_SPLIT_GRAVITY=1 \
    SPHEXA_CAP_MAX_TOP=128 python bench.py

# 3. BDT evolved head-to-head at production side: evolve depth steps
#    down until the evolved re-grid stays at compile-safe caps
for EV in 40 24 16; do
    if run_job "BDT evolved-$EV bench side-40" 10800 env \
        SPHEXA_BENCH_PROP=ve-bdt SPHEXA_BENCH_SIDE=40 \
        SPHEXA_BENCH_EVOLVE=$EV python bench.py; then
        break
    fi
done

# 4. noh 100^3 L1 gate (tiered deep phase, XLA fallback)
run_job "noh L1 gate 100^3 (tiered deep)" 14400 python scripts/noh_gate.py 100

# 5. evrard-50 tiered resident bench (split gravity, captop 128)
run_job "evrard-50 tiered resident bench (split, captop 128)" 10800 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_CAP_MAX_TOP=128 python bench.py

echo "=== tpu_queue9 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
