"""Tracing / profiling helpers.

Replaces the reference's `torch.autograd.profiler.record_function` regions
and CUDA-event phase timers (`misc.py:102-107`, `training_loop.py:375-379`)
with `jax.profiler` trace annotations plus simple host-side phase timers.
Under a `jax.profiler.trace(logdir)` capture, annotated regions show up in
TensorBoard/XProf exactly like the reference's profiler regions.
"""

from __future__ import annotations

import contextlib
import time

import jax


def annotate(name):
    """Trace annotation context (no-op overhead when not tracing)."""
    return jax.profiler.TraceAnnotation(name)


def profiled_function(fn):
    """Decorator version (ref `misc.profiled_function`, `misc.py:102-107`)."""
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(getattr(fn, "__name__", "fn")):
            return fn(*args, **kwargs)
    wrapper.__name__ = getattr(fn, "__name__", "fn")
    return wrapper


@contextlib.contextmanager
def trace(logdir):
    """Capture a device trace to `logdir` (view with TensorBoard)."""
    with jax.profiler.trace(str(logdir)):
        yield


class PhaseTimer:
    """Host-side per-phase wall timers (the reference's CUDA-event analog;
    call `tick(name)` around device work with block_until_ready)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def tick(self, name, block_on=None):
        start = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - start
        self.counts[name] = self.counts.get(name, 0) + 1

    def means_ms(self):
        return {k: 1e3 * self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}
