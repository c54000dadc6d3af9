"""Global matmul/conv precision policy.

f32 parameters run at `Precision.HIGHEST` by default so outputs match the
reference bit-close (TPU f32 matmuls otherwise round through bf16 passes).
Inference/serving can trade that for ~3x MXU throughput on the conv stacks
with `fast_f32(True)` — bf16-compute/f32-accumulate, the same numerics class
as the reference's fp16 blocks.
"""

from __future__ import annotations

import contextlib

import jax

_FAST_F32 = False


def fast_f32(enable=True):
    """Enable/disable bf16-compute for f32 convs/matmuls (global)."""
    global _FAST_F32
    _FAST_F32 = bool(enable)


@contextlib.contextmanager
def precise_scope(enable=True):
    """Trace-time scope that suspends `fast_f32` so the convs/matmuls
    traced inside run at `Precision.HIGHEST` even when the global serving
    policy is bf16-compute.  Used to pin precision-critical submodules
    (e.g. the semantic SR stack, whose argmax the mIoU quality gate reads)
    while the rest of the program keeps the fast policy.  No-op when
    `enable` is False."""
    global _FAST_F32
    old = _FAST_F32
    if enable:
        _FAST_F32 = False
    try:
        yield
    finally:
        _FAST_F32 = old


def conv_precision(dtype):
    if dtype == jax.numpy.float32 and not _FAST_F32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def acc_type(dtype):
    """`preferred_element_type` for a conv/dot with inputs of `dtype`.

    f32 inputs accumulate (and emit) f32.  bf16 inputs must emit bf16
    (None): requesting an f32 output from bf16 operands makes the primitive
    non-transposable under jax.grad (the f32 cotangent cannot pair with the
    bf16 operands: "conv_general_dilated requires arguments to have the
    same dtypes").  The MXU accumulates bf16 products in f32 internally
    either way; only the stored output dtype changes — the same numerics
    class as the reference's fp16 blocks (fp16 out, fp32 accumulate).
    """
    return jax.numpy.float32 if dtype == jax.numpy.float32 else None
