"""Global matmul/conv precision policy.

f32 parameters run at `Precision.HIGHEST` by default so outputs match the
reference bit-close (TPU f32 matmuls otherwise round through bf16 passes).
Inference/serving can trade that for ~3x MXU throughput on the conv stacks
with `fast_f32(True)` — bf16-compute/f32-accumulate, the same numerics class
as the reference's fp16 blocks.
"""

from __future__ import annotations

import jax

_FAST_F32 = False


def fast_f32(enable=True):
    """Enable/disable bf16-compute for f32 convs/matmuls (global)."""
    global _FAST_F32
    _FAST_F32 = bool(enable)


def conv_precision(dtype):
    if dtype == jax.numpy.float32 and not _FAST_F32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT
