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
# trace-time override for f32 matmul/conv precision inside precise_scope:
# None means "no override" (HIGHEST unless fast_f32)
_F32_OVERRIDE = None

# graded f32 precision levels (TPU MXU decompositions of an f32 matmul):
#   "default": 1 bf16 pass  (fast; the same compute class as fast_f32, but
#              the scope's force_fp32 keeps ACTIVATIONS stored in f32)
#   "high":    3 bf16 passes (~bf16x3, near-f32 products at half the
#              HIGHEST cost)
#   "highest": 6 bf16 passes (bit-close to true f32)
_LEVELS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": None,  # no override; conv_precision falls through to HIGHEST
}


def fast_f32(enable=True):
    """Enable/disable bf16-compute for f32 convs/matmuls (global)."""
    global _FAST_F32
    _FAST_F32 = bool(enable)


@contextlib.contextmanager
def precise_scope(enable=True, level="highest"):
    """Trace-time scope that suspends `fast_f32` so the convs/matmuls
    traced inside run at a pinned f32 precision even when the global
    serving policy is bf16-compute.  Used to pin precision-critical
    submodules (e.g. the semantic SR stack, whose argmax the mIoU quality
    gate reads) while the rest of the program keeps the fast policy.

    `level` grades the cost/accuracy tradeoff for the f32 matmuls inside
    the scope — see `_LEVELS`.  No-op when `enable` is False."""
    global _FAST_F32, _F32_OVERRIDE
    old_fast, old_override = _FAST_F32, _F32_OVERRIDE
    if enable:
        _FAST_F32 = False
        _F32_OVERRIDE = _LEVELS[level]
    try:
        yield
    finally:
        _FAST_F32 = old_fast
        _F32_OVERRIDE = old_override


def conv_precision(dtype):
    if dtype == jax.numpy.float32:
        if _F32_OVERRIDE is not None:
            return _F32_OVERRIDE
        if not _FAST_F32:
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
