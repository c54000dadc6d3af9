"""Cross-device training statistics.

TPU-native redesign of the reference `torch_utils/training_stats.py`: the
reference accumulates [count, sum, sum-of-squares] moments per metric in
per-device buffers and all_reduces them once per tick (`training_stats.py
:58-101,236-258`).  Here the moments are computed *inside* the jitted train
step (pure function of the phase outputs), psum'd over the mesh's data axis
by the same collective that reduces gradients, and returned to the host as a
small dict — no mutable global registry, no separate sync pass.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp
import numpy as np


def moments(value):
    """[count, sum, sum_sq] of an array (float32), shape [3]."""
    v = jnp.asarray(value, jnp.float32)
    return jnp.stack([jnp.asarray(v.size, jnp.float32), jnp.sum(v),
                      jnp.sum(jnp.square(v))])


class StatsAccumulator:
    """Collects name -> moments inside a traced step function."""

    def __init__(self):
        self._stats = {}

    def report(self, name, value):
        m = moments(value)
        if name in self._stats:
            self._stats[name] = self._stats[name] + m
        else:
            self._stats[name] = m

    def report0(self, name, value, is_main):
        """Record only on the main replica (ref `report0`, `:105`)."""
        m = moments(value) * jnp.asarray(is_main, jnp.float32)
        self._stats[name] = self._stats.get(name, 0) + m

    def asdict(self):
        return dict(self._stats)

    def psum(self, axis_name):
        """Reduce all moments over a mesh axis (inside shard_map/pmap)."""
        self._stats = {k: jax.lax.psum(v, axis_name) for k, v in self._stats.items()}
        return self


class Collector:
    """Host-side running aggregation across steps (ref `Collector`, `:115-163`)."""

    def __init__(self):
        self._totals = collections.defaultdict(lambda: np.zeros(3, np.float64))

    def update(self, stats_dict):
        for k, v in stats_dict.items():
            self._totals[k] += np.asarray(v, np.float64)

    def mean(self, name):
        c, s, _ = self._totals.get(name, np.zeros(3))
        return float(s / c) if c > 0 else float("nan")

    def std(self, name):
        c, s, ss = self._totals.get(name, np.zeros(3))
        if c <= 0:
            return float("nan")
        m = s / c
        return float(np.sqrt(max(ss / c - m * m, 0)))

    def as_means(self):
        return {k: self.mean(k) for k in self._totals}

    def reset(self):
        self._totals.clear()
