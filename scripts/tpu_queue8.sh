#!/bin/bash
# Chains after tpu_queue7: deep-cap i-row blocking validation
# (vmem_probe compile-only), then the three gates that died on the
# cap>=384 VMEM wall (sedov 100^3 L1, BDT evolved-40, noh 100^3 L1).
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue8.log

while ! grep -q "tpu_queue7 done" artifacts/tpu_queue7.log 2>/dev/null; do
    sleep 60
done
echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue8 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

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
    echo "tpu_queue8: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q8 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    echo "--- q8 job done: $name rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
}

# 1. compile-only probe: does i-row blocking hold the Mosaic stack at
#    ~40 MiB for caps 256/384/640 (the unblocked wall was ~0.31 MiB/cap)?
run_job "vmem probe 256/384/640 (iblock 128)" 10800 \
    python scripts/vmem_probe.py 100,20,256 100,16,384 100,12,640

# 2. the sedov gate rides the uniform engine through the evolved-state
#    re-grids (cap 384+) that OOM'd in queue5/6
run_job "sedov L1 gate 100^3 (iblock)" 14400 python scripts/sedov_gate.py 100

# 3. BDT evolved head-to-head at production side (re-grid to cap 384
#    killed it in queue6)
run_job "BDT evolved-40 bench (iblock)" 10800 env \
    SPHEXA_BENCH_PROP=ve-bdt SPHEXA_BENCH_SIDE=40 SPHEXA_BENCH_EVOLVE=40 \
    python bench.py

# 4. noh gate (died at the cap-640 compile-ceiling assert)
run_job "noh L1 gate 100^3 (iblock)" 14400 python scripts/noh_gate.py 100

# 5-6. evrard tiered benches with the top-headroom ladder (cap-384 top
#      tier, re-tier-on-fold): rebuild+split first (the combination
#      that survived the combined-program crash in queue7), then the
#      resident engine
run_job "evrard-50 tiered rebuild bench (split, headroom)" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 \
    SPHEXA_BENCH_TIERED=rebuild SPHEXA_SPLIT_GRAVITY=1 python bench.py
run_job "evrard-50 tiered resident bench (headroom)" 7200 env \
    SPHEXA_BENCH_CASE=evrard SPHEXA_BENCH_SIDE=50 python bench.py

echo "=== tpu_queue8 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
