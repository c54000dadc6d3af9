#!/bin/bash
# Round-4 queue, part e — continuation after part d was stopped post
# edge-train for the manual chunk-grid bench window.  Order for the time
# remaining in the session: the 512^2 reference-shape run first (VERDICT
# item 3 — failed empty last round; its stats are poll-copied from the
# main session while it runs), then the gather fine-tune + its frustum
# gate (item 4's hard case, 0.125 kimg / n=32 to fit), then sample PNGs
# from the edge checkpoint part d trained and the seg2cat checkpoint.
# Durable results go straight into docs/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/queue_r4e.log
step() {  # step NAME TIMEOUT_S CMD...
    local name="$1" to="$2"; shift 2
    [ -f /tmp/queue_stop ] && { echo "=== STOPPED before $name ===" >> "$LOG"; exit 0; }
    echo "=== [$(date +%H:%M:%S)] $name ===" >> "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "=== [$(date +%H:%M:%S)] $name rc=$?" >> "$LOG"
}

mkdir -p docs/runs_r4
# newest checkpoint of a run dir, preferring network-final over snapshots
# (the part-d edge run hung in its END-OF-RUN save — the 1.3-kimg snapshot
# is the best artifact it left; see loop.py watchdog note)
last_ckpt() { ls -t "$1"/network-final.ckpt "$1"/network-snapshot-*.ckpt \
              2>/dev/null | head -1; }
CKPT=$(last_ckpt .runs/00000-afhq-imgs-batch8-gamma5)
ECKPT=$(last_ckpt .runs/00001-shapenet-imgs-batch8-gamma0.3)
echo "queue_r4e: seg ckpt = $CKPT; edge ckpt = $ECKPT" >> "$LOG"

# 1. 512^2 reference-shape recipe (>=1 full tick is the bar; tick 0.125
#    so the first tick lands within minutes of the first step)
step train512 3300 env KIMG=1 bash scripts/run_seg2cat512_sanity.sh \
    --tick 0.125 --snap 4
RUN512=$(ls -td .runs/*/ 2>/dev/null | head -1)
if [ -n "$RUN512" ] && [ -f "$RUN512/stats.jsonl" ]; then
    cp "$RUN512/stats.jsonl" docs/runs_r4/train512_stats.jsonl
fi

# 2. gather fine-tune (weights move under gather-sampler gradients) + the
#    gather-trained frustum gate at n=32
if [ -n "$CKPT" ]; then
    step gather_ft 3000 bash scripts/run_seg2cat128_sanity.sh \
        --resume "$CKPT" --sampler gather --point_chunk 16384 \
        --kimg 0.125 --tick 0.0625 --snap 2
    GRUN=$(ls -td .runs/*/ 2>/dev/null | head -1)
    GCKPT=$(last_ckpt "${GRUN%/}")
    if [ "$GCKPT" != "$CKPT" ] && [ "$GCKPT" != "$ECKPT" ] && [ -n "$GCKPT" ]; then
        step quality_gather_trained 2700 \
            python scripts/eval_frustum_quality.py "$GCKPT" 32 \
                docs/frustum_quality_r4_gather_trained.json
    fi
fi

# 3. sample PNGs from the edge checkpoint part d trained
if [ -n "$ECKPT" ]; then
    cp "$(dirname "$ECKPT")/stats.jsonl" docs/runs_r4/edge_stats.jsonl 2>/dev/null
    EDGE_IN=$(ls .data/synth_edge/edges/*.png | head -1)
    step edge_samples 1800 python -m pix2pix3d_tpu.apps.generate_samples \
        --network "$ECKPT" --cfg edge2car --input "$EDGE_IN" \
        --outdir docs/samples/trained_apps_r4_edge --random_seed 1 7
fi

# 4. app artifacts from the round-4 seg2cat checkpoint
if [ -n "$CKPT" ]; then
    SEG_IN=$(ls .data/synth/masks/*.png | head -1)
    step apps_samples 1800 python -m pix2pix3d_tpu.apps.generate_samples \
        --network "$CKPT" --cfg seg2cat --input "$SEG_IN" \
        --outdir docs/samples/trained_apps_r4 --random_seed 1 7
fi

echo "=== [$(date +%H:%M:%S)] queue_r4e DONE ===" >> "$LOG"
