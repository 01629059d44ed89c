#!/bin/bash
# Chains after tpu_queue5: the VMEM-limit ladder for the BDT
# evolved-state bench (the scoped stack measures ~0.31 MB * CAP,
# independent of Z — so cap 256 predicts ~79 MB and cap 384 ~109 MB;
# raise the per-kernel Mosaic allowance and see where the v5e's total
# 128 MB budget actually lands), then the Sedov 100^3 gate.
cd "$(dirname "$0")/.."
LOG=artifacts/tpu_queue6.log

# serialize on queue5's completion marker (a shared pid file races:
# the predecessor removes it before the successor writes its own)
while ! grep -q "tpu_queue5 done" artifacts/tpu_queue5.log 2>/dev/null; do
    sleep 60
done
echo $$ > /tmp/tpu_queue.pid
echo "=== tpu_queue6 start $(date -u) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

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
    echo "tpu_queue6: TPU never came back" >> "$LOG"
    return 1
}

run_job() {
    local name="$1" tmo="$2"; shift 2
    wait_tpu || exit 1
    echo "--- q6 job: $name ($(date -u +%H:%M)) ---" >> "$LOG"
    timeout "$tmo" "$@" >> "$LOG" 2>&1
    echo "--- q6 job done: $name rc=$? ($(date -u +%H:%M)) ---" >> "$LOG"
}

# 1. the extended crash probe: stage C composes ONE Pallas kernel with
#    the FMM in a single program (the exact dying shape)
run_job "fmm+pallas combined probe" 7200 python scripts/fmm_crash_probe.py 24

# 2. BDT evolved head-to-head with a 116 MB scoped allowance (cap 384
#    kernels measured 108.7 MB; leaves ~19 MB for the block pipeline)
run_job "BDT evolved-40 bench (vmem 116)" 10800 env \
    SPHEXA_VMEM_LIMIT_MB=116 SPHEXA_BENCH_PROP=ve-bdt \
    SPHEXA_BENCH_EVOLVE=40 python bench.py

# 2. Sedov 100^3 L1 gate with the same allowance (uniform engine to
#    cap 384 per CAP_STRUCT; deep caps need the raised limit)
run_job "sedov L1 gate 100^3 (vmem 116)" 21600 env \
    SPHEXA_VMEM_LIMIT_MB=116 python scripts/sedov_gate.py 100 0.02

echo "=== tpu_queue6 done $(date -u) ===" >> "$LOG"
rm -f /tmp/tpu_queue.pid
