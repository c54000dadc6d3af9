#!/bin/bash
# Round-4 unattended TPU work queue (VERDICT round-3 items 2-5).
#
# The single v5e chip is the scarce resource and sessions can die under
# it (round 3 lost half its chip time to an outage; round 4's first
# training launch died with its controlling session) — so every chip item
# runs from THIS detached sequential queue: one job on the chip at a time
# (CLAUDE.md: two concurrent TPU clients / a killed client wedge the
# chip), each bounded by `timeout`, each logged, failures logged but
# non-fatal to the rest of the queue.
#
# Order (by evidence value per chip-minute):
#   0. wait for the live 128^2 seg2cat run (8 kimg) to finish
#   1. TPU-numerics quality gates n=64 on its checkpoint (VERDICT item 4)
#   2. same gates under --g-fp16 7 (the pending serving default flip)
#   3. per-stage serving profile at the bench config (VERDICT item 2)
#   4. bench A/Bs: g-fp16, depth 64, combined (VERDICT item 2)
#   5. edge pipeline on-device, KIMG=2 + committed PNGs (VERDICT item 5)
#   6. 512^2 reference-shape recipe, KIMG>=2 with ticks (VERDICT item 3)
#   7. gather fine-tune 0.25 kimg + gather-trained quality gate
#      (VERDICT item 4's hard case: a checkpoint whose weights were NOT
#      trained through the frustum sampler)
#   8. app artifacts (samples/video/mesh) from the round-4 checkpoint
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/queue_r4.log
step() {  # step NAME TIMEOUT_S CMD...
    local name="$1" to="$2"; shift 2
    echo "=== [$(date +%H:%M:%S)] $name ===" >> "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "=== [$(date +%H:%M:%S)] $name rc=$?" >> "$LOG"
}

# 0. wait for the 128^2 training run
if [ -f /tmp/train128.pid ]; then
    while kill -0 "$(cat /tmp/train128.pid)" 2>/dev/null; do sleep 30; done
fi
CKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
echo "queue_r4: trained ckpt = $CKPT" >> "$LOG"

if [ -n "$CKPT" ]; then
    step quality_default 3600 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
            docs/frustum_quality_r4_tpu.json
    step quality_gfp16 3600 env PIX2PIX3D_EVAL_GFP16=7 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
            docs/frustum_quality_r4_tpu_gfp16.json
fi

step profile32 2400 python scripts/profile_serving_r3.py 32
step bench_gfp16 2400 python bench.py --g-fp16 7 --skip-parity
step bench_depth64 2400 python bench.py --depth 64 --skip-parity
step bench_gfp16_d64 2400 python bench.py --g-fp16 7 --depth 64 --skip-parity

# 5. edge pipeline on-device (frustum sampler: exact full contraction at
#    the shapenet geometry; the gather sampler's 46 s/step would cost 3 h)
step edge_train 7200 env KIMG=2 scripts/run_edge_sanity.sh \
    --sampler frustum --remat True
ECKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
if [ "$ECKPT" != "$CKPT" ] && [ -n "$ECKPT" ]; then
    EDGE_IN=$(ls .data/synth_edge/edges/*.png | head -1)
    step edge_samples 1800 python -m pix2pix3d_tpu.apps.generate_samples \
        --network "$ECKPT" --cfg edge2car --input "$EDGE_IN" \
        --outdir docs/samples/trained_apps_r4_edge --random_seed 1 7
fi

# 6. 512^2 reference-shape recipe (kimg 2, tick 0.25 -> >=8 ticks)
step train512 10800 env KIMG=2 scripts/run_seg2cat512_sanity.sh --tick 0.25

# 7. gather fine-tune (weights move under gather-sampler gradients) + the
#    gather-trained frustum gate
if [ -n "$CKPT" ]; then
    step gather_ft 7200 scripts/run_seg2cat128_sanity.sh \
        --resume "$CKPT" --sampler gather --point_chunk 16384 \
        --kimg 0.25 --tick 0.125 --snap 2
    GCKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
    if [ "$GCKPT" != "$CKPT" ] && [ -n "$GCKPT" ]; then
        step quality_gather_trained 3600 \
            python scripts/eval_frustum_quality.py "$GCKPT" 64 \
                docs/frustum_quality_r4_gather_trained.json
    fi
fi

# 8. app artifacts from the round-4 trained checkpoint
if [ -n "$CKPT" ]; then
    SEG_IN=$(ls .data/synth/masks/*.png | head -1)
    step apps_samples 1800 python -m pix2pix3d_tpu.apps.generate_samples \
        --network "$CKPT" --cfg seg2cat --input "$SEG_IN" \
        --outdir docs/samples/trained_apps_r4 --random_seed 1 7
fi

echo "=== [$(date +%H:%M:%S)] queue_r4 DONE ===" >> "$LOG"
