#!/bin/bash
# Round-5 stretch chain: the gather-trained frustum gate (VERDICT #4,
# promised since round 3).  Runs AFTER chain_r5f's driver-facing steps;
# launch only when the chip is free.
#
# The wipe deleted every full training checkpoint, so the fine-tune seeds
# from the durable EMA export via scripts/make_ft_seed.py: G and G_ema
# from the export, D fresh (documented in the gate JSON's provenance
# field).  The fine-tune trains through the GATHER sampler (per-phase jit
# — the monolithic gather train program kernel-faults the v5e worker,
# chain_r5e notes), producing weights NOT co-adapted to the frustum
# sampler; the gate then measures how the frustum serving path agrees
# with the gather parity path on exactly such weights — the situation a
# converted reference pkl presents.
set -u
cd "$(dirname "$0")/.."
mkdir -p .logs docs/runs_r5 docs/ckpts_r5
LOG=.logs/chain_r5g.log
step() {
    local name="$1" to="$2"; shift 2
    [ -f /tmp/queue_stop_g ] && { echo "=== STOPPED before $name ===" >> "$LOG"; exit 0; }
    echo "=== [$(date +%H:%M:%S)] $name ===" >> "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "=== [$(date +%H:%M:%S)] $name rc=$?" >> "$LOG"
}
ckpt_commit() {
    local msg="$1"; shift
    git add -f "$@" >> "$LOG" 2>&1
    git commit -m "$msg" -m "No-Verification-Needed: committed artifacts only (checkpoints/stats/plots), no source change" >> "$LOG" 2>&1
}
last_ckpt() { ls -t "$1"/network-final.ckpt "$1"/network-snapshot-*.ckpt \
              2>/dev/null | head -1; }
new_run_dir() { find .runs -maxdepth 1 -mindepth 1 -type d -newer "$1" | sort | head -1; }

SEED=/tmp/ft_seed_r5.ckpt
EMA=docs/ckpts_r5/seg2cat128_r5_ema.ckpt
if [ ! -f docs/frustum_quality_r5_gather_trained.json ] && [ -f "$EMA" ]; then
    [ -f "$SEED" ] || step make_seed 600 python scripts/make_ft_seed.py "$EMA" "$SEED"
    MARKG=$(mktemp); touch "$MARKG"
    step gather_ft 4500 bash scripts/run_seg2cat128_sanity.sh \
        --resume "$SEED" --resume_partial True --sampler gather \
        --point_chunk 16384 --jit_phases True \
        --kimg 0.125 --tick 0.0625 --snap 2
    GRUN=$(new_run_dir "$MARKG")
    GCKPT=""; [ -n "$GRUN" ] && GCKPT=$(last_ckpt "$GRUN")
    echo "chain_r5g: gather_ft run=$GRUN ckpt=$GCKPT" >> "$LOG"
    if [ -n "$GCKPT" ]; then
        step export_gather 900 python scripts/export_ema.py \
            "$GCKPT" docs/ckpts_r5/seg2cat128_gather_ft_ema.ckpt
        GFT=docs/ckpts_r5/seg2cat128_gather_ft_ema.ckpt
        [ -f "$GFT" ] || GFT="$GCKPT"
        # gate at the SHIPPED serving default (maxcfg arm,
        # docs/serving_default.json): g_fp16 7, depth 64, carry-f32
        step quality_gather_trained 5400 env \
            PIX2PIX3D_EVAL_GFP16=7 PIX2PIX3D_EVAL_DEPTH=64 \
            PIX2PIX3D_EVAL_CARRY_F32=1 PIX2PIX3D_EVAL_SEM_SR_PREC=default \
            PIX2PIX3D_EVAL_PROVENANCE="gather-sampler fine-tune (0.125 kimg) seeded G/G_ema from docs/ckpts_r5/seg2cat128_r5_ema.ckpt, D fresh (wipe destroyed full ckpts); gated at the shipped maxcfg serving default" \
            python scripts/eval_frustum_quality.py "$GFT" 32 \
            docs/frustum_quality_r5_gather_trained.json
        [ -f docs/frustum_quality_r5_gather_trained.json ] && ckpt_commit \
            "gather-trained frustum gate (VERDICT #4) + gather-ft EMA checkpoint" \
            docs/frustum_quality_r5_gather_trained.json docs/ckpts_r5
    fi
fi
# ---- 2. 512^2 finalize retry (VERDICT #3 snapshot grid + durable ckpt) -----
# The chain_r5f run landed one healthy tick of STATS but its 1h budget
# expired inside the tick-0 fakes-render compile, so no snapshot grid or
# checkpoint survived.  This boot's train-step programs are all cached, so
# an identical re-run spends ~3 min on the 32 steps and gives the fakes
# compile the rest of a 55-min budget.  Guard on the EMA export, NOT on
# stats (stats already exist and must not gate this).
if [ ! -f docs/ckpts_r5/seg2cat512_r5_ema.ckpt ] && [ -d .data/synth512/imgs ]; then
    MARK512=$(mktemp); touch "$MARK512"
    step train512_final 3300 env XLA_FLAGS=--xla_disable_hlo_passes=space-to-batch-converter \
        KIMG=0.125 bash scripts/run_seg2cat512_sanity.sh \
        --batch 4 --batch-gpu 2 --mbstd-group 2 --jit_phases True \
        --tick 0.125 --snap 1
    RUN512=$(new_run_dir "$MARK512")
    CKPT512=""; [ -n "$RUN512" ] && CKPT512=$(last_ckpt "$RUN512")
    echo "chain_r5g: run512=$RUN512 ckpt512=$CKPT512" >> "$LOG"
    if [ -n "$RUN512" ]; then
        # overwrite only with non-empty stats (same recipe, fuller run)
        [ -s "$RUN512/stats.jsonl" ] && cp "$RUN512/stats.jsonl" docs/runs_r5/train512_stats.jsonl
        cp "$RUN512/quality.jsonl" docs/runs_r5/train512_quality.jsonl 2>/dev/null
        for f in "$RUN512"/fakes*.png; do
            [ -f "$f" ] && cp "$f" "docs/runs_r5/train512_$(basename "$f")"
        done
    fi
    [ -n "$CKPT512" ] && step export_512 900 python scripts/export_ema.py \
        "$CKPT512" docs/ckpts_r5/seg2cat512_r5_ema.ckpt
    if ls docs/runs_r5/train512_fakes*.png > /dev/null 2>&1 || [ -f docs/ckpts_r5/seg2cat512_r5_ema.ckpt ]; then
        ckpt_commit "512^2 finalize retry: snapshot grid and/or durable EMA checkpoint" \
            docs/runs_r5 docs/ckpts_r5
    else
        echo "chain_r5g: 512^2 finalize produced neither fakes nor ckpt; NOT committing" >> "$LOG"
    fi
fi

# ---- 3. edge fine-tune + sample PNGs (VERDICT #6) ---------------------------
# Reference-faithful shape: the ref edge recipe is a fine-tune
# (shapenet_edge.sh resumes EG3D shapenetcars), so this resumes
# cross-architecture (--resume_partial) from the best durable checkpoint.
EMASRC=docs/ckpts_r5/seg2cat128_r5_ema.ckpt
ESEED=/tmp/edge_seed_r5.ckpt
if [ ! -f /tmp/skip_edge ] && [ ! -s docs/runs_r5/edge_ft_stats.jsonl ] && [ -f "$EMASRC" ]; then
    [ -d .data/synth_edge/imgs ] || step mk_synth_edge 1800 \
        python scripts/make_synth_dataset.py .data/synth_edge 128 4 128 \
            --edge --cfg shapenet
    [ -f "$ESEED" ] || step make_edge_seed 600 python scripts/make_ft_seed.py "$EMASRC" "$ESEED"
    MARKE=$(mktemp); touch "$MARKE"
    step edge_ft 5400 bash scripts/run_edge_sanity.sh \
        --resume "$ESEED" --resume_partial True --jit_phases True \
        --kimg 0.25 --tick 0.125 --snap 1
    ERUN=$(new_run_dir "$MARKE")
    ECKPT=""; [ -n "$ERUN" ] && ECKPT=$(last_ckpt "$ERUN")
    echo "chain_r5g: edge_ft run=$ERUN ckpt=$ECKPT" >> "$LOG"
    if [ -n "$ERUN" ]; then
        cp "$ERUN/stats.jsonl" docs/runs_r5/edge_ft_stats.jsonl 2>/dev/null
        cp "$ERUN/quality.jsonl" docs/runs_r5/edge_ft_quality.jsonl 2>/dev/null
        for f in "$ERUN"/fakes*.png; do
            [ -f "$f" ] && cp "$f" "docs/runs_r5/edge_ft_$(basename "$f")"
        done
    fi
    if [ -n "$ECKPT" ]; then
        step export_edge_ft 900 python scripts/export_ema.py \
            "$ECKPT" docs/ckpts_r5/edge2car_ft_r5_ema.ckpt
        EDGE_IN=$(ls .data/synth_edge/edges/*.png 2>/dev/null | head -1)
        step edge_samples 3600 python -m pix2pix3d_tpu.apps.generate_samples \
            --network "$ECKPT" --cfg edge2car --input "$EDGE_IN" \
            --outdir docs/samples/trained_apps_r5_edge --random_seed 1 7
    fi
    if [ -s docs/runs_r5/edge_ft_stats.jsonl ]; then
        ckpt_commit "edge fine-tune (reference-faithful resume shape) + sample PNGs" \
            docs/runs_r5 docs/ckpts_r5 docs/samples/trained_apps_r5_edge
    fi
fi

echo "=== [$(date +%H:%M:%S)] chain_r5g DONE ===" >> "$LOG"
