#!/bin/bash
# Round-4 queue, part d — full re-run after the host VM rebooted and wiped
# /tmp (queue a/b/c logs), .data/ (synth datasets), .runs/ (the 8-kimg
# round-4 checkpoint and every training artifact) and the local JAX compile
# cache.  Everything chip-side from VERDICT round-3 items 2-5 re-runs here,
# and every durable result is written straight into docs/ (tracked) so a
# second loss can't erase it.
#
# One TPU client at a time (CLAUDE.md), each step bounded by `timeout`,
# failures logged but non-fatal.  Touch /tmp/queue_stop to end the queue
# after the current step.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/queue_r4d.log
step() {  # step NAME TIMEOUT_S CMD...
    local name="$1" to="$2"; shift 2
    [ -f /tmp/queue_stop ] && { echo "=== STOPPED before $name ===" >> "$LOG"; exit 0; }
    echo "=== [$(date +%H:%M:%S)] $name ===" >> "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "=== [$(date +%H:%M:%S)] $name rc=$?" >> "$LOG"
}

mkdir -p docs/runs_r4

# 0. synthetic datasets (CPU; reboot wiped .data/)
[ -d .data/synth/imgs ] || step mk_synth 1800 \
    python scripts/make_synth_dataset.py .data/synth 128 4 128
[ -d .data/synth_edge/imgs ] || step mk_synth_edge 1800 \
    python scripts/make_synth_dataset.py .data/synth_edge 128 4 128 \
        --edge --cfg shapenet
[ -d .data/synth512/imgs ] || step mk_synth512 3600 \
    python scripts/make_synth_dataset.py .data/synth512 64 4 512

# 1. recreate the trained checkpoint (the round-3 16-kimg ckpt died with
#    .runs/): 8 kimg at the seg2cat recipe shape, ~30 min at the round-3a
#    rate plus compiles
step train128 6000 env KIMG=8 bash scripts/run_seg2cat128_sanity.sh
CKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
RUN128=$(dirname "$CKPT" 2>/dev/null)
echo "queue_r4d: trained ckpt = $CKPT" >> "$LOG"
if [ -n "$RUN128" ]; then
    cp "$RUN128/stats.jsonl" docs/runs_r4/train128_stats.jsonl 2>/dev/null
    step plot128 600 python scripts/plot_training_sanity.py "$RUN128" \
        docs/runs_r4/train128_curves.png
fi

# 2. TPU-numerics quality gates n=64 (VERDICT item 4): serving default,
#    then the candidate default (bf16-tensor backbone + 64 depth slabs)
if [ -n "$CKPT" ]; then
    step quality_default 2700 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
            docs/frustum_quality_r4_tpu.json
    step quality_gfp16_d64 2700 env PIX2PIX3D_EVAL_GFP16=7 \
            PIX2PIX3D_EVAL_DEPTH=64 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
            docs/frustum_quality_r4_tpu_gfp16_d64.json
fi

# 3. uncontended candidate bench + per-stage profile (VERDICT item 2)
step bench_gfp16_d64 2400 python bench.py --g-fp16 7 --depth 64 --skip-parity
step profile_gfp16_d64 2400 env PIX2PIX3D_PROF_GFP16=7 PIX2PIX3D_PROF_DEPTH=64 \
    python scripts/profile_serving_r3.py 32
step bench_b64 2400 python bench.py --g-fp16 7 --depth 64 --batch 64 \
    --skip-parity

# 4. edge pipeline on-device + sample PNGs (VERDICT item 5).  Frustum
#    sampler (exact full-contraction fallback at the shapenet geometry);
#    the gather sampler's ~46 s/step would cost 3 h for the same kimg.
step edge_train 5400 env KIMG=2 bash scripts/run_edge_sanity.sh \
    --sampler frustum --remat True
ECKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
if [ "$ECKPT" != "$CKPT" ] && [ -n "$ECKPT" ]; then
    cp "$(dirname "$ECKPT")/stats.jsonl" docs/runs_r4/edge_stats.jsonl 2>/dev/null
    EDGE_IN=$(ls .data/synth_edge/edges/*.png | head -1)
    step edge_samples 1800 python -m pix2pix3d_tpu.apps.generate_samples \
        --network "$ECKPT" --cfg edge2car --input "$EDGE_IN" \
        --outdir docs/samples/trained_apps_r4_edge --random_seed 1 7
fi

# 5. gather fine-tune (weights move under gather-sampler gradients) + the
#    gather-trained frustum gate (VERDICT item 4's hard case)
if [ -n "$CKPT" ]; then
    step gather_ft 4500 bash scripts/run_seg2cat128_sanity.sh \
        --resume "$CKPT" --sampler gather --point_chunk 16384 \
        --kimg 0.25 --tick 0.125 --snap 2
    GCKPT=$(ls -t .runs/*/network-final.ckpt 2>/dev/null | head -1)
    if [ "$GCKPT" != "$CKPT" ] && [ "$GCKPT" != "${ECKPT:-}" ] && [ -n "$GCKPT" ]; then
        step quality_gather_trained 2700 \
            python scripts/eval_frustum_quality.py "$GCKPT" 64 \
                docs/frustum_quality_r4_gather_trained.json
    fi
fi

# 6. app artifacts from the round-4 checkpoint
if [ -n "$CKPT" ]; then
    SEG_IN=$(ls .data/synth/masks/*.png | head -1)
    step apps_samples 1800 python -m pix2pix3d_tpu.apps.generate_samples \
        --network "$CKPT" --cfg seg2cat --input "$SEG_IN" \
        --outdir docs/samples/trained_apps_r4 --random_seed 1 7
fi

# 7. 512^2 reference-shape recipe (VERDICT item 3): KIMG=2, tick 0.125 ->
#    >=1 full tick recorded even if the timeout cuts the run short
step train512 5400 env KIMG=2 bash scripts/run_seg2cat512_sanity.sh \
    --tick 0.125
RUN512=$(ls -td .runs/*/ 2>/dev/null | head -1)
if [ -n "$RUN512" ] && [ -f "$RUN512/stats.jsonl" ]; then
    cp "$RUN512/stats.jsonl" docs/runs_r4/train512_stats.jsonl 2>/dev/null
    ls "$RUN512" >> "$LOG"
fi

echo "=== [$(date +%H:%M:%S)] queue_r4d DONE ===" >> "$LOG"
