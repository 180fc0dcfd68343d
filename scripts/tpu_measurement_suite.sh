#!/usr/bin/env bash
# Round-3 TPU measurement sequence — run ONE job at a time (the axon relay
# and the single host core make concurrent measurements lie; see PERF.md
# "honest timing" note). Each step appends to $OUT.
#
#   ./scripts/tpu_measurement_suite.sh [outdir]
#
# Steps:
#   1. MSDA gather formulations incl. the one-hot MXU Pallas kernel
#      (decides the CAPE_MSDA_GATHER default).
#   2. Device-step batch scaling with the winning gather impl.
#   3. Host input pipeline: per-record stage costs + sustained loader-fed
#      train step vs device-resident step (VERDICT item 2).
#   4. bench.py headline (eval episodes/sec + train-step stderr lines).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_suite}
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "exit=$? (log: $OUT/$name.log)"
  tail -3 "$OUT/$name.log"
}

run msda_variants 2400 python scripts/bench_msda_variants.py \
    --variants v0_baseline v9_quad_mxu --k 4 --reps 2

# pick the gather impl from step 1 (fall back to xla on any failure)
GATHER=$(python - "$OUT/msda_variants.log" <<'EOF'
import json, sys
impl = "xla"
try:
    for line in open(sys.argv[1]):
        line = line.strip()
        if line.startswith("{"):
            r = json.loads(line)
            v0 = r.get("v0_baseline", {}).get("fwd_bwd")
            v9 = r.get("v9_quad_mxu", {}).get("fwd_bwd")
            if isinstance(v0, (int, float)) and isinstance(v9, (int, float)) \
               and v9 < v0:
                impl = "mxu"
except Exception:
    pass
print(impl)
EOF
)
echo "chosen gather impl: $GATHER"
export CAPE_MSDA_GATHER=$GATHER

run device_step_b4 2400 python scripts/bench_device_step.py --batch 4
run device_step_b8 2400 python scripts/bench_device_step.py --batch 8
run host_pipeline 3600 python scripts/bench_host_pipeline.py
run bench 3600 python bench.py

# Mosaic lowering smoke: every shipped Pallas kernel compiled + run
# NON-interpreted on the chip, checked against the XLA core — catches
# toolchain regressions deliberately instead of via a bench anomaly.
run mosaic_lowering 1800 env CAPE_TPU_TESTS=1 \
    python -m pytest tests/test_tpu_lowering.py -m tpu -q -rs

echo "=== suite done; gather impl was $GATHER ==="
