#!/bin/bash
# Round-5 serialized chip+host chain, run under tmux so it survives the
# builder session.  Order: (1) the 512^2 reference-shape run (VERDICT #3,
# three rounds overdue — r5h config that reached tick 0 healthy),
# (2) the slow-tier train tests (gets the 19-min CPU-mesh compile into the
# persistent cache while the chip cools), (3) the round-5 chip queue
# (gates / benches / gather+edge fine-tunes, scripts/tpu_queue_r5.sh).
set -u
cd "$(dirname "$0")/.."
mkdir -p .logs docs/runs_r5

echo "=== [$(date +%H:%M:%S)] chain_r5: 512^2 run ===" | tee -a .logs/chain_r5.log
XLA_FLAGS=--xla_disable_hlo_passes=space-to-batch-converter KIMG=1 \
    timeout 16000 bash scripts/run_seg2cat512_sanity.sh \
    --batch 4 --batch-gpu 2 --jit_phases True --tick 0.125 --snap 4 \
    > .logs/train512_r5i.log 2>&1
echo "=== [$(date +%H:%M:%S)] 512^2 rc=$? ===" | tee -a .logs/chain_r5.log

# copy 512^2 artifacts out of the gitignored .runs immediately
RUN512=$(ls -td .runs/*afhq-imgs-batch4-gamma5 2>/dev/null | head -1)
if [ -n "$RUN512" ]; then
    cp "$RUN512/stats.jsonl" docs/runs_r5/train512_stats.jsonl 2>/dev/null
    cp "$RUN512/quality.jsonl" docs/runs_r5/train512_quality.jsonl 2>/dev/null
    for f in "$RUN512"/fakes*.png; do
        [ -f "$f" ] && cp "$f" "docs/runs_r5/train512_$(basename "$f")"
    done
fi

echo "=== [$(date +%H:%M:%S)] slow-tier tests ===" | tee -a .logs/chain_r5.log
timeout 3600 python -m pytest tests/test_train_loop.py tests/test_train_step.py -q \
    > .logs/slowtier_r5.log 2>&1
echo "=== [$(date +%H:%M:%S)] slow tier rc=$? ===" | tee -a .logs/chain_r5.log

echo "=== [$(date +%H:%M:%S)] queue_r5 ===" | tee -a .logs/chain_r5.log
bash scripts/tpu_queue_r5.sh
echo "=== [$(date +%H:%M:%S)] chain_r5 DONE ===" | tee -a .logs/chain_r5.log
