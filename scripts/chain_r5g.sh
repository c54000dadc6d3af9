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
        step quality_gather_trained 5400 env \
            PIX2PIX3D_EVAL_PROVENANCE="gather-sampler fine-tune (0.125 kimg) seeded G/G_ema from docs/ckpts_r5/seg2cat128_r5_ema.ckpt, D fresh (wipe destroyed full ckpts)" \
            python scripts/eval_frustum_quality.py "$GFT" 32 \
            docs/frustum_quality_r5_gather_trained.json
        [ -f docs/frustum_quality_r5_gather_trained.json ] && ckpt_commit \
            "gather-trained frustum gate (VERDICT #4) + gather-ft EMA checkpoint" \
            docs/frustum_quality_r5_gather_trained.json docs/ckpts_r5
    fi
fi
echo "=== [$(date +%H:%M:%S)] chain_r5g DONE ===" >> "$LOG"
