#!/bin/bash
# Round-5 gather-gate retry chain.  Runs AFTER chain_r5g (watcher waits for
# its DONE marker).
#
# Evidence so far: the seg2cat gather-sampler fine-tune kernel-faults the
# v5e worker ("TPU worker process crashed", .logs/chain_r5g.log 03:38)
# BOTH as a monolithic program (chain_r5c) and per-phase (chain_r5g) —
# but both faulting attempts used point_chunk=16384 (the chunked
# lax.scan render path), while the round-4 edge run trained through the
# SAME gather sampler on-device for 2 kimg WITHOUT point_chunk.  So:
# attempt 1 drops point_chunk entirely (memory bounded via batch_gpu=4 +
# the space-to-batch workaround for per-device batch 4); attempt 2 (only
# if 1 leaves no checkpoint) halves the chunk instead.  Whatever lands,
# the gate evaluates the SHIPPED maxcfg serving default on the
# gather-trained weights (VERDICT #4).  Edge fine-tune (preempted in
# chain_r5g via /tmp/skip_edge to give the gate the chip first) runs last.
set -u
cd "$(dirname "$0")/.."
mkdir -p .logs docs/runs_r5 docs/ckpts_r5
LOG=.logs/chain_r5h.log
step() {
    local name="$1" to="$2"; shift 2
    [ -f /tmp/queue_stop_h ] && { echo "=== STOPPED before $name ===" >> "$LOG"; exit 0; }
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
GFTEMA=docs/ckpts_r5/seg2cat128_gather_ft_ema.ckpt

gather_attempt() {  # gather_attempt NAME EXTRA_ARGS...
    local name="$1"; shift
    local mark; mark=$(mktemp); touch "$mark"
    step "$name" 4200 env XLA_FLAGS=--xla_disable_hlo_passes=space-to-batch-converter \
        bash scripts/run_seg2cat128_sanity.sh \
        --resume "$SEED" --resume_partial True --sampler gather \
        --jit_phases True --kimg 0.125 --tick 0.0625 --snap 2 "$@"
    GRUN=$(new_run_dir "$mark")
    GCKPT=""; [ -n "$GRUN" ] && GCKPT=$(last_ckpt "$GRUN")
    echo "chain_r5h: $name run=$GRUN ckpt=$GCKPT" >> "$LOG"
}

if [ ! -f docs/frustum_quality_r5_gather_trained.json ] && [ -f "$EMA" ]; then
    [ -f "$SEED" ] || step make_seed 600 python scripts/make_ft_seed.py "$EMA" "$SEED"
    GCKPT=""
    gather_attempt gather_ft_nochunk --batch 8 --batch-gpu 4
    [ -n "$GCKPT" ] || gather_attempt gather_ft_chunk8k --point_chunk 8192 --batch 8 --batch-gpu 2 --mbstd-group 2
    if [ -n "$GCKPT" ]; then
        step export_gather 900 python scripts/export_ema.py "$GCKPT" "$GFTEMA"
        GFT="$GFTEMA"; [ -f "$GFT" ] || GFT="$GCKPT"
        # gate at the SHIPPED serving default (maxcfg arm)
        step quality_gather_trained 5400 env \
            PIX2PIX3D_EVAL_GFP16=7 PIX2PIX3D_EVAL_DEPTH=64 \
            PIX2PIX3D_EVAL_CARRY_F32=1 PIX2PIX3D_EVAL_SEM_SR_PREC=default \
            PIX2PIX3D_EVAL_PROVENANCE="gather-sampler fine-tune (0.125 kimg, no point_chunk) seeded G/G_ema from docs/ckpts_r5/seg2cat128_r5_ema.ckpt, D fresh (wipe destroyed full ckpts); gated at the shipped maxcfg serving default" \
            python scripts/eval_frustum_quality.py "$GFT" 32 \
            docs/frustum_quality_r5_gather_trained.json
        [ -f docs/frustum_quality_r5_gather_trained.json ] && ckpt_commit \
            "gather-trained frustum gate (VERDICT #4) + gather-ft EMA checkpoint" \
            docs/frustum_quality_r5_gather_trained.json docs/ckpts_r5
    fi
fi

# ---- edge fine-tune + sample PNGs (VERDICT #6; preempted from chain_r5g) ----
ESEED=/tmp/edge_seed_r5.ckpt
if [ ! -s docs/runs_r5/edge_ft_stats.jsonl ] && [ -f "$EMA" ]; then
    [ -d .data/synth_edge/imgs ] || step mk_synth_edge 1800 \
        python scripts/make_synth_dataset.py .data/synth_edge 128 4 128 \
            --edge --cfg shapenet
    [ -f "$ESEED" ] || step make_edge_seed 600 python scripts/make_ft_seed.py "$EMA" "$ESEED"
    MARKE=$(mktemp); touch "$MARKE"
    step edge_ft 5400 bash scripts/run_edge_sanity.sh \
        --resume "$ESEED" --resume_partial True --jit_phases True \
        --kimg 0.25 --tick 0.125 --snap 1
    ERUN=$(new_run_dir "$MARKE")
    ECKPT=""; [ -n "$ERUN" ] && ECKPT=$(last_ckpt "$ERUN")
    echo "chain_r5h: edge_ft run=$ERUN ckpt=$ECKPT" >> "$LOG"
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

echo "=== [$(date +%H:%M:%S)] chain_r5h DONE ===" >> "$LOG"
