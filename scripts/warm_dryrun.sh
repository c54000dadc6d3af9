#!/bin/bash
# Warm the persistent compile cache for the DRIVER's exact dryrun invocation.
#
# The driver validates the multi-chip path by running
#   XLA_FLAGS=--xla_force_host_platform_device_count=8 __graft_entry__.py dryrun 8
# on virtual CPU devices.  Its cold compile exceeds the driver's budget on
# this 1-core host (rounds 1 and 3 both died rc=124 compiling cold after a
# code change re-traced the step program), so the invocation MUST find its
# programs in /root/.cache/jax_test_cache.  Running this script reproduces
# the driver's env byte-for-byte (no pytest conftest, no extra flags) and
# leaves the exact program hashes in the cache.
#
# RUN THIS AFTER THE LAST CODE CHANGE OF EVERY ROUND — any edit that
# re-traces the train step (trainer, loss, models, nn, ops, render) makes
# the cache stale and the driver's dryrun red.
set -e
cd "$(dirname "$0")/.."
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    timeout "${TIMEOUT:-2400}" python __graft_entry__.py dryrun 8
