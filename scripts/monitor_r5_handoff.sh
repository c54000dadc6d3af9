#!/bin/bash
# Round-5 handoff monitor (session-surviving): watches the running
# chain_r5c (pid $1), stops it at the gather_ft boundary once its serving
# quality-gate matrix has finished (the tail chain re-runs the failed 512^2
# job FIRST, per VERDICT #3's "first in the queue" directive), then launches
# chain_r5e.  If r5c skipped its gate block and went straight to gather_ft,
# it is left alone to finish; chain_r5e's idempotence guards skip whatever
# already landed.
set -u
cd "$(dirname "$0")/.."
R5C_PID="${1:?usage: monitor_r5_handoff.sh R5C_PID}"
MLOG=.logs/monitor_r5.log
echo "[$(date +%H:%M:%S)] monitor up, watching pid $R5C_PID" >> "$MLOG"
while kill -0 "$R5C_PID" 2>/dev/null; do
    if grep -q "gate_gfp16_semsrf32 rc=" .logs/chain_r5c.log 2>/dev/null; then
        if [ ! -f /tmp/queue_stop ]; then
            touch /tmp/queue_stop
            echo "[$(date +%H:%M:%S)] gates done -> queue_stop set" >> "$MLOG"
        fi
    elif grep -q "] gather_ft ===" .logs/chain_r5c.log 2>/dev/null; then
        echo "[$(date +%H:%M:%S)] r5c entered gather_ft without stop; letting it finish" >> "$MLOG"
        break
    fi
    sleep 30
done
while kill -0 "$R5C_PID" 2>/dev/null; do sleep 30; done
rm -f /tmp/queue_stop /tmp/queue_stop_e
echo "[$(date +%H:%M:%S)] r5c exited; launching chain_r5e" >> "$MLOG"
setsid bash scripts/chain_r5e.sh < /dev/null >> .logs/chain_r5e_stdout.log 2>&1 &
echo $! > /tmp/chain_r5e.pid
echo "[$(date +%H:%M:%S)] chain_r5e pid $(cat /tmp/chain_r5e.pid)" >> "$MLOG"
