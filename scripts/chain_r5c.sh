#!/bin/bash
# Round-5 session-4 chain, take 2 (supersedes chain_r5b.sh — same steps,
# reordered): the bench A/B suite moves FIRST because it needs no dataset
# or checkpoint and its result may require kernel iteration — that data has
# to land early enough in the round to act on.  Trainings follow, then the
# checkpoint-dependent gates and fine-tunes.  Artifacts are committed the
# moment they land (VERDICT #5: the host wipe pattern).
#
#   1. chunk-grid A/B bench suite + cost_analysis roofline (VERDICT #2)
#   2. synthetic datasets (CPU, ~30 s each)
#   3. 512^2 reference-shape run (VERDICT #3) -> stats/EMA -> commit
#   4. 128^2 seg2cat 8-kimg retrain -> stats/curves/EMA -> commit
#   5. serving-gate precision-attribution matrix, TPU n=64 (VERDICT #1)
#   6. gather fine-tune + gather-trained gate (VERDICT #4)
#   7. edge fine-tune via --resume_partial + sample PNGs (VERDICT #6)
set -u
cd "$(dirname "$0")/.."
mkdir -p .logs docs/runs_r5 docs/ckpts_r5
LOG=.logs/chain_r5c.log
step() {  # step NAME TIMEOUT_S CMD...
    local name="$1" to="$2"; shift 2
    [ -f /tmp/queue_stop ] && { echo "=== STOPPED before $name ===" >> "$LOG"; exit 0; }
    echo "=== [$(date +%H:%M:%S)] $name ===" >> "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "=== [$(date +%H:%M:%S)] $name rc=$?" >> "$LOG"
}
ckpt_commit() {  # ckpt_commit MSG PATH...
    local msg="$1"; shift
    git add -f "$@" >> "$LOG" 2>&1
    git commit -m "$msg" -m "No-Verification-Needed: committed artifacts only (checkpoints/stats/plots), no source change" >> "$LOG" 2>&1
}
last_ckpt() { ls -t "$1"/network-final.ckpt "$1"/network-snapshot-*.ckpt \
              2>/dev/null | head -1; }
new_run_dir() { find .runs -maxdepth 1 -mindepth 1 -type d -newer "$1" | sort | head -1; }

# a bench_slab from the superseded chain may still hold the chip — wait
if [ -n "${WAIT_PID:-}" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi

# ---- 1. chunk-grid A/B + roofline (VERDICT #2) ----------------------------
[ -s docs/runs_r5/bench_slab.json ] || step bench_slab 3600 bash -c \
    "python bench.py --skip-parity | tee docs/runs_r5/bench_slab.json"
step bench_chunk 3600 bash -c "python bench.py --skip-parity --chunk-grid | tee docs/runs_r5/bench_chunk.json"
step bench_semsrf32 3600 bash -c "python bench.py --skip-parity --sem-sr-f32 | tee docs/runs_r5/bench_semsrf32.json"
step bench_gfp16_semsrf32 3600 bash -c "python bench.py --skip-parity --sem-sr-f32 --g-fp16 7 | tee docs/runs_r5/bench_gfp16_semsrf32.json"
step bench_combo 3600 bash -c "python bench.py --skip-parity --sem-sr-f32 --g-fp16 7 --chunk-grid | tee docs/runs_r5/bench_combo.json"
step cost_analysis 3600 bash -c \
    "python scripts/cost_analysis.py | tee docs/cost_analysis_r5.txt"
ckpt_commit "round 5 bench A/B (slab vs chunk-grid, sem-SR-f32, g_fp16) + roofline" \
    docs/runs_r5 docs/cost_analysis_r5.txt

# ---- 2. datasets (CPU; wiped) ---------------------------------------------
[ -d .data/synth/imgs ] || step mk_synth 1800 \
    python scripts/make_synth_dataset.py .data/synth 128 4 128
[ -d .data/synth512/imgs ] || step mk_synth512 3600 \
    python scripts/make_synth_dataset.py .data/synth512 64 4 512
[ -d .data/synth_edge/imgs ] || step mk_synth_edge 1800 \
    python scripts/make_synth_dataset.py .data/synth_edge 128 4 128 \
        --edge --cfg shapenet

# ---- 3. 512^2 reference-shape run (VERDICT #3) ----------------------------
# r5h config (reached tick 0 healthy before the session died): batch 4 /
# batch-gpu 2 / jit_phases, space-to-batch pass disabled (the known XLA
# SIGABRT at per-device batch 4, NOTES_PERF round 2; batch-gpu 4 OOMs HBM).
MARK512=$(mktemp); touch "$MARK512"
step train512 16000 env XLA_FLAGS=--xla_disable_hlo_passes=space-to-batch-converter \
    KIMG=1 bash scripts/run_seg2cat512_sanity.sh \
    --batch 4 --batch-gpu 2 --jit_phases True --tick 0.125 --snap 4
RUN512=$(new_run_dir "$MARK512")
CKPT512=""; [ -n "$RUN512" ] && CKPT512=$(last_ckpt "$RUN512")
echo "chain_r5c: run512=$RUN512 ckpt512=$CKPT512" >> "$LOG"
if [ -n "$RUN512" ]; then
    cp "$RUN512/stats.jsonl" docs/runs_r5/train512_stats.jsonl 2>/dev/null
    cp "$RUN512/quality.jsonl" docs/runs_r5/train512_quality.jsonl 2>/dev/null
    for f in "$RUN512"/fakes*.png; do
        [ -f "$f" ] && cp "$f" "docs/runs_r5/train512_$(basename "$f")"
    done
fi
[ -n "$CKPT512" ] && step export_512 900 python scripts/export_ema.py \
    "$CKPT512" docs/ckpts_r5/seg2cat512_r5_ema.ckpt
ckpt_commit "512^2 reference-shape run: stats, snapshots, durable EMA checkpoint" \
    docs/runs_r5 docs/ckpts_r5

# ---- 4. 128^2 seg2cat retrain (gate-input checkpoint; r4's was wiped) -----
MARK128=$(mktemp); touch "$MARK128"
step train128 9000 env KIMG=8 bash scripts/run_seg2cat128_sanity.sh
RUN128=$(new_run_dir "$MARK128")
CKPT=""; [ -n "$RUN128" ] && CKPT=$(last_ckpt "$RUN128")
echo "chain_r5c: run128=$RUN128 ckpt=$CKPT" >> "$LOG"
if [ -n "$RUN128" ]; then
    cp "$RUN128/stats.jsonl" docs/runs_r5/train128_stats.jsonl 2>/dev/null
    cp "$RUN128/quality.jsonl" docs/runs_r5/train128_quality.jsonl 2>/dev/null
    for f in "$RUN128"/fakes*.png; do
        [ -f "$f" ] && cp "$f" "docs/runs_r5/train128_$(basename "$f")"
    done
    step plot128 600 python scripts/plot_training_sanity.py "$RUN128" \
        docs/runs_r5/train128_curves.png
fi
[ -n "$CKPT" ] && step export_seg 900 python scripts/export_ema.py \
    "$CKPT" docs/ckpts_r5/seg2cat128_r5_ema.ckpt
ckpt_commit "128^2 seg2cat retrain (8 kimg): stats, fd trend, durable EMA checkpoint" \
    docs/runs_r5 docs/ckpts_r5

# ---- 5. serving-gate precision-attribution matrix (VERDICT #1) ------------
# Gates run on the DURABLE exported EMA checkpoint so every gate JSON names
# an artifact that survives a host wipe (VERDICT r4 weak #6).
GCACHE=/tmp/gather_cache_r5.npz
GATECKPT=docs/ckpts_r5/seg2cat128_r5_ema.ckpt
[ -f "$GATECKPT" ] || GATECKPT="$CKPT"
if [ -n "$GATECKPT" ]; then
    step gate_bf16 7200 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        python scripts/eval_frustum_quality.py "$GATECKPT" 64 \
        docs/frustum_quality_r5_tpu_bf16.json
    step gate_semsrf32 3600 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        PIX2PIX3D_EVAL_SEM_SR_F32=1 \
        python scripts/eval_frustum_quality.py "$GATECKPT" 64 \
        docs/frustum_quality_r5_tpu_semsrf32.json
    step gate_servef32 3600 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        PIX2PIX3D_EVAL_SERVE_F32=1 \
        python scripts/eval_frustum_quality.py "$GATECKPT" 64 \
        docs/frustum_quality_r5_tpu_servef32.json
    step gate_gfp16_semsrf32 3600 env PIX2PIX3D_EVAL_GATHER_CACHE=$GCACHE \
        PIX2PIX3D_EVAL_GFP16=7 PIX2PIX3D_EVAL_SEM_SR_F32=1 \
        python scripts/eval_frustum_quality.py "$GATECKPT" 64 \
        docs/frustum_quality_r5_tpu_gfp16_semsrf32.json
    ckpt_commit "round 5 TPU serving quality gates: bf16 baseline vs sem-SR-f32 fix vs f32 controls" \
        docs/frustum_quality_r5_tpu_bf16.json \
        docs/frustum_quality_r5_tpu_semsrf32.json \
        docs/frustum_quality_r5_tpu_servef32.json \
        docs/frustum_quality_r5_tpu_gfp16_semsrf32.json
fi

# ---- 6. gather fine-tune + gather-trained gate (VERDICT #4) ---------------
if [ -n "$CKPT" ]; then
    MARKG=$(mktemp); touch "$MARKG"
    step gather_ft 5400 bash scripts/run_seg2cat128_sanity.sh \
        --resume "$CKPT" --sampler gather --point_chunk 16384 \
        --kimg 0.125 --tick 0.0625 --snap 2
    GRUN=$(new_run_dir "$MARKG")
    GCKPT=""; [ -n "$GRUN" ] && GCKPT=$(last_ckpt "$GRUN")
    echo "chain_r5c: gather_ft run=$GRUN ckpt=$GCKPT" >> "$LOG"
    if [ -n "$GCKPT" ]; then
        step export_gather 900 python scripts/export_ema.py \
            "$GCKPT" docs/ckpts_r5/seg2cat128_gather_ft_ema.ckpt
        GFTCKPT=docs/ckpts_r5/seg2cat128_gather_ft_ema.ckpt
        [ -f "$GFTCKPT" ] || GFTCKPT="$GCKPT"
        step quality_gather_trained 7200 \
            python scripts/eval_frustum_quality.py "$GFTCKPT" 32 \
            docs/frustum_quality_r5_gather_trained.json
        ckpt_commit "gather-trained frustum gate (VERDICT #4) + gather-ft EMA checkpoint" \
            docs/frustum_quality_r5_gather_trained.json docs/ckpts_r5
    fi
fi

# ---- 7. edge fine-tune (reference recipe: resume a pretrained model) ------
if [ -n "$CKPT" ]; then
    MARKE=$(mktemp); touch "$MARKE"
    step edge_ft 9000 bash scripts/run_edge_sanity.sh \
        --resume "$CKPT" --resume_partial True --kimg 1 --tick 0.125 --snap 4
    ERUN=$(new_run_dir "$MARKE")
    ECKPT2=""; [ -n "$ERUN" ] && ECKPT2=$(last_ckpt "$ERUN")
    echo "chain_r5c: edge_ft run=$ERUN ckpt=$ECKPT2" >> "$LOG"
    if [ -n "$ERUN" ]; then
        cp "$ERUN/stats.jsonl" docs/runs_r5/edge_ft_stats.jsonl 2>/dev/null
        cp "$ERUN/quality.jsonl" docs/runs_r5/edge_ft_quality.jsonl 2>/dev/null
        for f in "$ERUN"/fakes*.png; do
            [ -f "$f" ] && cp "$f" "docs/runs_r5/edge_ft_$(basename "$f")"
        done
    fi
    if [ -n "$ECKPT2" ]; then
        step export_edge_ft 900 python scripts/export_ema.py \
            "$ECKPT2" docs/ckpts_r5/edge2car_ft_r5_ema.ckpt
        EDGE_IN=$(ls .data/synth_edge/edges/*.png 2>/dev/null | head -1)
        step edge_samples 3600 python -m pix2pix3d_tpu.apps.generate_samples \
            --network "$ECKPT2" --cfg edge2car --input "$EDGE_IN" \
            --outdir docs/samples/trained_apps_r5_edge --random_seed 1 7
    fi
    ckpt_commit "edge2car fine-tune (resume_partial, VERDICT #6): stats, samples, EMA checkpoint" \
        docs/runs_r5 docs/ckpts_r5 docs/samples/trained_apps_r5_edge
fi

echo "=== [$(date +%H:%M:%S)] chain_r5c DONE ===" >> "$LOG"
