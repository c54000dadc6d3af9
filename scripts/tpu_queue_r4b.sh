#!/bin/bash
# Round-4 queue, part b — the items part a skipped: part a's wait step read
# a stale /tmp/train128.pid (the first launch died with its session), so the
# benches ran concurrently with training and every checkpoint-dependent step
# found no checkpoint; the two launcher scripts also lacked +x.  This queue
# waits on the LIVE training pid, then runs the remaining VERDICT items
# serially (one TPU client at a time, per CLAUDE.md).
#
# Order (evidence value per chip-minute):
#   1. TPU-numerics quality gates n=64 on the 8-kimg ckpt (VERDICT item 4)
#   2. same gates under the pending serving default (g_fp16=7 + depth 64)
#   3. uncontended re-bench of that config (part a's numbers shared the chip
#      with the training run)
#   4. edge pipeline on-device, KIMG=2 + sample PNGs (VERDICT item 5)
#   5. gather fine-tune 0.25 kimg + gather-trained frustum gate (item 4's
#      hard case: weights NOT trained through the frustum sampler)
#   6. 512^2 reference-shape recipe with ticks (VERDICT item 3)
#   7. app artifacts from the round-4 checkpoint
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/queue_r4b.log
step() {  # step NAME TIMEOUT_S CMD...
    local name="$1" to="$2"; shift 2
    echo "=== [$(date +%H:%M:%S)] $name ===" >> "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "=== [$(date +%H:%M:%S)] $name rc=$?" >> "$LOG"
}

# 0. wait for the LIVE 128^2 training run (pid recorded at launch time)
TRAIN_PID="${TRAIN_PID:-2951}"
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 30; done
sleep 60  # let the chip settle after the client exits (CLAUDE.md)
CKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
echo "queue_r4b: trained ckpt = $CKPT" >> "$LOG"

if [ -n "$CKPT" ]; then
    step quality_default 3600 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
            docs/frustum_quality_r4_tpu.json
    step quality_gfp16_d64 3600 env PIX2PIX3D_EVAL_GFP16=7 \
            PIX2PIX3D_EVAL_DEPTH=64 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
            docs/frustum_quality_r4_tpu_gfp16_d64.json
fi

# 3. uncontended re-bench of the candidate default
step bench_gfp16_d64_clean 2400 python bench.py --g-fp16 7 --depth 64 \
    --skip-parity

# 4. edge pipeline on-device
step edge_train 7200 env KIMG=2 bash scripts/run_edge_sanity.sh
ECKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
if [ "$ECKPT" != "$CKPT" ] && [ -n "$ECKPT" ]; then
    EDGE_IN=$(ls .data/synth_edge/edges/*.png | head -1)
    step edge_samples 1800 python -m pix2pix3d_tpu.apps.generate_samples \
        --network "$ECKPT" --cfg edge2car --input "$EDGE_IN" \
        --outdir docs/samples/trained_apps_r4_edge --random_seed 1 7
fi

# 5. gather fine-tune (weights move under gather-sampler gradients) + the
#    gather-trained quality gate
if [ -n "$CKPT" ]; then
    step gather_ft 7200 bash scripts/run_seg2cat128_sanity.sh \
        --resume "$CKPT" --sampler gather --point_chunk 16384 \
        --kimg 0.25 --tick 0.125 --snap 2
    GCKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
    if [ "$GCKPT" != "$CKPT" ] && [ "$GCKPT" != "$ECKPT" ] && [ -n "$GCKPT" ]; then
        step quality_gather_trained 3600 \
            python scripts/eval_frustum_quality.py "$GCKPT" 64 \
                docs/frustum_quality_r4_gather_trained.json
    fi
fi

# 6. 512^2 reference-shape recipe (>=8 ticks)
step train512 10800 env KIMG=2 bash scripts/run_seg2cat512_sanity.sh \
    --tick 0.25

# 7. app artifacts from the round-4 trained checkpoint
if [ -n "$CKPT" ]; then
    SEG_IN=$(ls .data/synth/masks/*.png | head -1)
    step apps_samples 1800 python -m pix2pix3d_tpu.apps.generate_samples \
        --network "$CKPT" --cfg seg2cat --input "$SEG_IN" \
        --outdir docs/samples/trained_apps_r4 --random_seed 1 7
fi

echo "=== [$(date +%H:%M:%S)] queue_r4b DONE ===" >> "$LOG"
