#!/bin/bash
# Round-5 evidence queue (VERDICT r4 'next round' items 1-4):
#  1. Sedov 100^3 L1 gate     — crash-resumable, bounded-h deep phase,
#                               stays inside the proven cap-128 envelope
#  2. Noh 100^3 L1 gate       — crash-resumable, tiered deep phase
#                               (budgeted clamps, robust ladder)
#  3. BDT evolved bench @50    — simtime/wallsec vs a correctly-warmed
#                               plain baseline (the r4 number timed a
#                               Mosaic compile in the plain side)
#  4. Evrard-50 tiered bench   — budgeted clamps + robust ladder keep
#                               the tiered path from aborting
#  5. bf16/MXU + gather spikes — the pair-lane-floor decision data
#  6. headline bench           — BENCH_HISTORY row at HEAD
# Each job waits for the TPU probe; the gates additionally self-resume
# from snapshots through gate_loop.sh.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue10.log

echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue10 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

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
    echo "tpu_queue10: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q10 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "--- q10 job done: $name rc=$rc ($(date -u +%H:%M)) ---" >> "$LOG"
    return $rc
}

# 1. the headline physics artifact: sedov 100^3 L1 gate
run_job "sedov L1 gate 100^3 (resumable, hcap deep)" 21600 \
    env GATE_MAX_TRIES=10 GATE_TRY_TIMEOUT=5400 \
    bash scripts/gate_loop.sh python scripts/sedov_gate.py 100

# 2. noh 100^3 L1 gate (tiered deep phase)
run_job "noh L1 gate 100^3 (resumable, tiered deep)" 21600 \
    env GATE_MAX_TRIES=10 GATE_TRY_TIMEOUT=5400 \
    bash scripts/gate_loop.sh python scripts/noh_gate.py 100

# 3. BDT evolved head-to-head at side 50 (fixed plain baseline)
for EV in 40 24; do
    if run_job "BDT evolved-$EV bench side-50" 10800 env \
        SPHEXA_BENCH_PROP=ve-bdt SPHEXA_BENCH_SIDE=50 \
        SPHEXA_BENCH_EVOLVE=$EV python bench.py; then
        break
    fi
done

# 4. evrard-50 tiered resident bench (budgeted clamps, robust ladder)
run_job "evrard-50 tiered resident bench" 10800 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_CAP_MAX_TOP=128 python bench.py

# 5. decision-spike measurements
run_job "bf16 momentum timing spike" 7200 \
    python scripts/bf16_spike.py timing
run_job "xla gather ceiling spike" 3600 \
    python scripts/bf16_spike.py gather
run_job "bf16 momentum accuracy (on-chip)" 3600 \
    python scripts/bf16_spike.py accuracy

# 6. headline bench at HEAD
run_job "sedov 100^3 headline bench" 7200 python bench.py

echo "=== tpu_queue10 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
