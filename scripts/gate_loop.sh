#!/bin/bash
# Crash-resume driver for the TPU physics gates (gate_common.py):
# reruns the given command until it exits 0 (gate passed) or 2 (gate
# completed but failed its threshold); any other exit code is a crash
# (TPU worker death, remote-compile failure, tunnel outage) — wait for
# the TPU to answer a probe, then rerun; the gate script resumes from
# its newest artifacts/ckpt/ snapshot.
#
#   bash scripts/gate_loop.sh python scripts/sedov_gate.py 100
#
# Env: GATE_MAX_TRIES (default 12), GATE_TRY_TIMEOUT seconds per
# attempt (default 7200).
set -u
cd "$(dirname "$0")/.."

MAX_TRIES=${GATE_MAX_TRIES:-12}
TRY_TIMEOUT=${GATE_TRY_TIMEOUT:-7200}

probe() {
    timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
EOF
}

wait_tpu() {
    if [ "${SPHEXA_PLATFORM:-}" = "cpu" ]; then return 0; fi
    for _ in $(seq 1 240); do
        if probe; then return 0; fi
        sleep 60
    done
    echo "gate_loop: TPU never came back" >&2
    return 1
}

for try in $(seq 1 "$MAX_TRIES"); do
    wait_tpu || exit 3
    echo "--- gate_loop attempt $try/$MAX_TRIES: $* ($(date -u +%H:%M)) ---"
    timeout "$TRY_TIMEOUT" "$@"
    rc=$?
    echo "--- gate_loop attempt $try rc=$rc ($(date -u +%H:%M)) ---"
    case $rc in
        0) exit 0 ;;
        2) exit 2 ;;     # completed, failed the gate: no retry
        *) sleep 30 ;;   # crash: resume from snapshot
    esac
done
echo "gate_loop: exhausted $MAX_TRIES attempts" >&2
exit 4
