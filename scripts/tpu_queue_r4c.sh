#!/bin/bash
# Round-4 queue, part c — serving experiments, run UNCONTENDED after part b
# drains (part a's numbers shared the chip with a live training run).
#
#   1. cost analysis (XLA-reported FLOPs/bytes roofline) at the candidate
#      serving default — compile-only, cheap, tells us compute- vs
#      bandwidth-bound before we pick the next lever
#   2. per-stage profile at the candidate default (g_fp16=7, depth 64)
#   3. batch sweep at the candidate default: depth-64 slab/color tensors
#      are 2/3 the size, so the old batch-48 OOM may have cleared
#   4. per-device batch-4 with XLA's space-to-batch pass disabled (the
#      round-2 SIGABRT forced batch>=8 — removing it would kill the one
#      recipe deviation from the reference's batch-4 afhq_seg.sh)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/queue_r4c.log
step() {  # step NAME TIMEOUT_S CMD...
    local name="$1" to="$2"; shift 2
    echo "=== [$(date +%H:%M:%S)] $name ===" >> "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "=== [$(date +%H:%M:%S)] $name rc=$?" >> "$LOG"
}

# 0. wait for queue_r4b (pid recorded at launch)
QB_PID="${QB_PID:-9500}"
while kill -0 "$QB_PID" 2>/dev/null; do sleep 30; done
sleep 60

step cost_analysis 2400 env PIX2PIX3D_PROF_GFP16=7 PIX2PIX3D_PROF_DEPTH=64 \
    python scripts/cost_analysis.py 32
step profile_gfp16_d64 2400 env PIX2PIX3D_PROF_GFP16=7 PIX2PIX3D_PROF_DEPTH=64 \
    python scripts/profile_serving_r3.py 32
step bench_b48 2400 python bench.py --g-fp16 7 --depth 64 --batch 48 \
    --skip-parity
step bench_b64 2400 python bench.py --g-fp16 7 --depth 64 --batch 64 \
    --skip-parity

# 4. space-to-batch SIGABRT retest (NOTES_PERF round 2; PLAN_ROUND4 item 7):
#    a sub-kimg batch-4 train run with the pass disabled.  rc=0 means the
#    batch>=8 recipe deviation can go.
step s2b_batch4 5400 env KIMG=0.064 \
    XLA_FLAGS=--xla_disable_hlo_passes=space-to-batch-converter \
    bash scripts/run_seg2cat128_sanity.sh --batch 4 --mbstd-group 4 \
    --tick 0.032 --snap 100

echo "=== [$(date +%H:%M:%S)] queue_r4c DONE ===" >> "$LOG"
