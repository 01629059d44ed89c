#!/bin/bash
# Round-4 TPU evidence queue (VERDICT r3 item 1): bench at HEAD, the
# BDT evolved-state head-to-head, the tiered Evrard benches, and the
# Sedov-100^3 L1 gate — ordered by evidence value so an early tunnel
# death still leaves the headline numbers captured. Each job is
# timeout-bounded; the log is the artifact trail.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue.log
echo $$ > /tmp/tpu_queue.pid

echo "=== tpu_queue3 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

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
    echo "tpu_queue3: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q3 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    echo "--- q3 job done: $name rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
}

# 1. headline bench at HEAD (compile-cached; ~10 min)
run_job "sedov bench at HEAD" 3600 python bench.py

# 2. BDT evolved head-to-head: the cap-320 re-grid now compiles with
#    the Z*CAP<=1024 lane budget (was a 108 MiB scoped-VMEM OOM)
run_job "BDT evolved-40 bench" 7200 env SPHEXA_BENCH_PROP=ve-bdt \
    SPHEXA_BENCH_EVOLVE=40 python bench.py

# 3. tiered Evrard bench, resident engine (default)
run_job "evrard-50 tiered resident bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 python bench.py

# 4. Sedov 100^3 L1 gate -> artifacts/SEDOV_L1_100.json (uniform
#    engine to cap 256, then the adaptive tiered phase)
run_job "sedov L1 gate 100^3" 14400 python scripts/sedov_gate.py 100 0.02

# 5. tiered Evrard rebuild variant (per-step relayout comparison)
run_job "evrard-50 tiered rebuild bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_TIERED=rebuild python bench.py

# 6. tiered-BDT on Evrard (BDT x tiers composition)
run_job "evrard-50 tiered-bdt bench" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_PROP=ve-tiered-bdt python bench.py

# 7. primitive micro-benchmarks (reference perf-harness tier)
run_job "perf_micro primitives" 3600 python scripts/perf_micro.py

echo "=== tpu_queue3 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
