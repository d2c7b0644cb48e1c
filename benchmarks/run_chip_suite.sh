#!/bin/sh
# Serial chip-measurement suite: run every benchmark that feeds the
# committed JSON artifacts, one process at a time (the benchmarks share
# one TPU chip and one host core; parallel runs contend and time
# compiles instead of steady state).  Each step appends to
# benchmarks/chip_suite.log; rerunning is idempotent (every script
# rewrites its own artifact).
#
# Usage: sh benchmarks/run_chip_suite.sh [quick]
set -x
cd "$(dirname "$0")/.."
LOG=benchmarks/chip_suite.log
: > "$LOG"

probe() {
    # refuse to burn hours if the backend is down (it hangs, not errors)
    timeout 120 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.0))))" >> "$LOG" 2>&1
}
probe || { echo "TPU backend unreachable -- aborting suite" | tee -a "$LOG"; exit 1; }

timeout 3600 python benchmarks/scl_sweep.py --skip-reference \
    --out benchmarks/scl_sweep_serving.json >> "$LOG" 2>&1
timeout 5400 python benchmarks/impaired_bench.py --batch 1024 \
    --out benchmarks/impaired_1k.json >> "$LOG" 2>&1
timeout 3600 python benchmarks/timescale_attrib.py --batch 1024 \
    --out benchmarks/timescale_attrib.json >> "$LOG" 2>&1
timeout 5400 python benchmarks/ladder_profile.py \
    --out benchmarks/ladder_profile.json >> "$LOG" 2>&1
timeout 2400 python benchmarks/serving_latency.py >> "$LOG" 2>&1
timeout 7200 python benchmarks/codec_envelope.py >> "$LOG" 2>&1
timeout 4800 python bench.py >> "$LOG" 2>&1
echo SUITE_DONE | tee -a "$LOG"
