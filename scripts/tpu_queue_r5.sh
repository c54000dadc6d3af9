#!/bin/bash
# Round-5 chip queue (PLAN_ROUND5.md items 3-9) — launched AFTER the 512^2
# reference-shape run (item 1, launched separately at round start) frees
# the chip.  One v5e + one host core: everything here serializes.
#
#   A. durable EMA exports of every trained checkpoint -> docs/ckpts_r5/
#      (VERDICT #5: gate inputs must survive a host wipe)
#   B. serving-gate precision-attribution matrix on the round-4 seg2cat
#      checkpoint, TPU n=64, gather renders cached once (VERDICT #1):
#      bf16 baseline / SEM_SR_F32 candidate fix / SERVE_F32 control /
#      FRUSTUM_F32 attribution
#   C. chunk-grid A/B bench at batch 32 + cost_analysis roofline
#      (VERDICT #2)
#   D. gather fine-tune + gather-trained gate (VERDICT #4) — run dir
#      captured deterministically (ADVICE r4 #3: never `ls -td | head -1`)
#   E. edge fine-tune via --resume_partial (VERDICT #6: the reference edge
#      recipe is an EG3D fine-tune, `train_scripts/shapenet_edge.sh`) +
#      sample PNGs
#   F. final bench at the gate-chosen default + warm_dryrun
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/queue_r5.log
step() {  # step NAME TIMEOUT_S CMD...
    local name="$1" to="$2"; shift 2
    [ -f /tmp/queue_stop ] && { echo "=== STOPPED before $name ===" >> "$LOG"; exit 0; }
    echo "=== [$(date +%H:%M:%S)] $name ===" >> "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "=== [$(date +%H:%M:%S)] $name rc=$?" >> "$LOG"
}
# newest checkpoint of a run dir, preferring network-final over snapshots
last_ckpt() { ls -t "$1"/network-final.ckpt "$1"/network-snapshot-*.ckpt \
              2>/dev/null | head -1; }
new_run_dir() {  # the run dir created since the marker file, or empty
    find .runs -maxdepth 1 -mindepth 1 -type d -newer "$1" | sort | head -1
}

mkdir -p docs/runs_r5 docs/ckpts_r5
CKPT=$(last_ckpt .runs/00000-afhq-imgs-batch8-gamma5)
ECKPT=$(last_ckpt .runs/00001-shapenet-imgs-batch8-gamma0.3)
RUN512=$(ls -td .runs/0000[2-9]-afhq-imgs-batch[48]-gamma5 2>/dev/null | head -1)
CKPT512=""; [ -n "$RUN512" ] && CKPT512=$(last_ckpt "$RUN512")
echo "queue_r5: seg=$CKPT edge=$ECKPT run512=$RUN512 ckpt512=$CKPT512" >> "$LOG"

# ---- A. durable artifacts (CPU-only, cheap) -------------------------------
if [ -n "$RUN512" ]; then
    cp "$RUN512/stats.jsonl" docs/runs_r5/train512_stats.jsonl 2>/dev/null
    cp "$RUN512/quality.jsonl" docs/runs_r5/train512_quality.jsonl 2>/dev/null
    for f in "$RUN512"/fakes*.png; do
        [ -f "$f" ] && cp "$f" "docs/runs_r5/train512_$(basename "$f")"
    done
fi
[ -n "$CKPT" ] && step export_seg 900 python scripts/export_ema.py \
    "$CKPT" docs/ckpts_r5/seg2cat128_r4_ema.ckpt
[ -n "$ECKPT" ] && step export_edge 900 python scripts/export_ema.py \
    "$ECKPT" docs/ckpts_r5/edge2car_r4_ema.ckpt
[ -n "$CKPT512" ] && step export_512 900 python scripts/export_ema.py \
    "$CKPT512" docs/ckpts_r5/seg2cat512_r5_ema.ckpt

# ---- C. chunk-grid A/B + roofline (VERDICT #2) ----------------------------
# (runs BEFORE the gate matrix: the A/B result may need kernel iteration,
#  so get the data early in the round)
step bench_slab 2700 python bench.py --skip-parity
step bench_chunk 2700 python bench.py --skip-parity --chunk-grid
step bench_semsrf32 2700 python bench.py --skip-parity --sem-sr-f32
step bench_gfp16_semsrf32 2700 python bench.py --skip-parity --sem-sr-f32 \
    --g-fp16 7
step bench_combo 2700 python bench.py --skip-parity --sem-sr-f32 \
    --g-fp16 7 --chunk-grid
step cost_analysis 2700 bash -c \
    "python scripts/cost_analysis.py | tee docs/cost_analysis_r5.txt"

# ---- B. serving-gate precision-attribution matrix (VERDICT #1) ------------
GCACHE=/tmp/gather_cache_r5.npz
if [ -n "$CKPT" ]; then
    step gate_bf16 5400 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
        docs/frustum_quality_r5_tpu_bf16.json
    step gate_semsrf32 3600 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        PIX2PIX3D_EVAL_SEM_SR_F32=1 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
        docs/frustum_quality_r5_tpu_semsrf32.json
    step gate_servef32 3600 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        PIX2PIX3D_EVAL_SERVE_F32=1 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
        docs/frustum_quality_r5_tpu_servef32.json
    step gate_frustumf32 3600 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        PIX2PIX3D_EVAL_FRUSTUM_F32=1 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
        docs/frustum_quality_r5_tpu_frustumf32.json
    # r4 showed g_fp16 7 is +6% but red on the SAME mIoU gate as the bf16
    # baseline (0.883 vs 0.881) — i.e. the failure lives in the semantic
    # path, not the backbone.  If sem-SR-f32 fixes the baseline, this
    # combo is the fastest config that could also pass.
    step gate_gfp16_semsrf32 3600 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        PIX2PIX3D_EVAL_GFP16=7 PIX2PIX3D_EVAL_SEM_SR_F32=1 \
        python scripts/eval_frustum_quality.py "$CKPT" 64 \
        docs/frustum_quality_r5_tpu_gfp16_semsrf32.json
fi

# ---- D. gather fine-tune + gather-trained gate (VERDICT #4) ---------------
if [ -n "$CKPT" ]; then
    MARK=$(mktemp); touch "$MARK"
    step gather_ft 4500 bash scripts/run_seg2cat128_sanity.sh \
        --resume "$CKPT" --sampler gather --point_chunk 16384 \
        --kimg 0.125 --tick 0.0625 --snap 2
    GRUN=$(new_run_dir "$MARK")
    GCKPT=""; [ -n "$GRUN" ] && GCKPT=$(last_ckpt "$GRUN")
    echo "gather_ft run dir: '$GRUN' ckpt: '$GCKPT'" >> "$LOG"
    if [ -n "$GCKPT" ]; then
        step export_gather 900 python scripts/export_ema.py \
            "$GCKPT" docs/ckpts_r5/seg2cat128_gather_ft_ema.ckpt
        step quality_gather_trained 5400 \
            python scripts/eval_frustum_quality.py "$GCKPT" 32 \
            docs/frustum_quality_r5_gather_trained.json
    fi
fi

# ---- E. edge fine-tune (reference recipe: resume a pretrained model) ------
if [ -n "$CKPT" ]; then
    MARK2=$(mktemp); touch "$MARK2"
    step edge_ft 7200 bash scripts/run_edge_sanity.sh \
        --resume "$CKPT" --resume_partial True --kimg 2 --tick 0.25 --snap 4
    ERUN=$(new_run_dir "$MARK2")
    ECKPT2=""; [ -n "$ERUN" ] && ECKPT2=$(last_ckpt "$ERUN")
    echo "edge_ft run dir: '$ERUN' ckpt: '$ECKPT2'" >> "$LOG"
    if [ -n "$ERUN" ]; then
        cp "$ERUN/stats.jsonl" docs/runs_r5/edge_ft_stats.jsonl 2>/dev/null
        cp "$ERUN/quality.jsonl" docs/runs_r5/edge_ft_quality.jsonl 2>/dev/null
    fi
    if [ -n "$ECKPT2" ]; then
        step export_edge_ft 900 python scripts/export_ema.py \
            "$ECKPT2" docs/ckpts_r5/edge2car_ft_r5_ema.ckpt
        EDGE_IN=$(ls .data/synth_edge/edges/*.png | head -1)
        step edge_samples 2400 python -m pix2pix3d_tpu.apps.generate_samples \
            --network "$ECKPT2" --cfg edge2car --input "$EDGE_IN" \
            --outdir docs/samples/trained_apps_r5_edge --random_seed 1 7
    fi
fi

echo "=== [$(date +%H:%M:%S)] queue_r5 DONE ===" >> "$LOG"
