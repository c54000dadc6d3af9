"""Fused Pallas TPU kernel for the lateSeparate OSG decoder (serving).

The decoder (`models/triplane.py:OSGDecoderSemanticLateSeparate`, ref
`triplane_cond.py:926-970`) is two parallel 2-layer MLPs over the same
32-dim plane features.  Run layer-by-layer in XLA it is pure HBM traffic:
per render chunk the hidden activations and output concat materialize
~1.2 GB against ~0.3 GFLOP of matmuls.  This kernel keeps everything in
VMEM: one feats tile in, colors + sigma out.

Fusion layout (prepared once per call from the unmodified param pytree):
  W1 [32, 128]  = [Wa0*ga0 | Wb0*gb0]         (both hidden layers, merged)
  W2 [128, 128] = block-diagonal, column-packed:
                  rows 0:64  (net a hidden), cols 0:32  = Wa1*ga1 [:, 1:]
                  rows 64:128 (net b hidden), cols 32:64 = Wb1*gb1 [:, 1:]
                  rows 64:128,               col 64      = Wb1*gb1 [:, 0]
                  everything else 0
so the kernel is two MXU matmuls + softplus + sigmoid-clamp epilogue,
matching the reference math (equalized-lr gains folded into the weights;
f32 accumulation; softplus in f32).

Serving-only: no custom VJP (the gather/parity path trains the decoder).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # feats rows per grid step (bf16 sublane multiple)


def _make_kernel(rgb_sigmoid, sem_sigmoid, compute_dtype):
    # HIGHEST when validating in f32 (the TPU default decomposes f32 MXU
    # operands into bf16 passes, ~1e-2 error); Mosaic rejects fp32 contract
    # precision on bf16 operands, so serving (bf16) uses DEFAULT
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
        x = x_ref[:]                                         # [T, 32]
        h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
        h = jax.nn.softplus(h + b1_ref[:])                   # f32 [T, 128]
        o = jnp.dot(h.astype(x.dtype), w2_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=prec) + b2_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, o.shape, 1)
        if rgb_sigmoid or sem_sigmoid:
            clamped = jax.nn.sigmoid(o) * (1 + 2 * 0.001) - 0.001
            # static column mask (selecting between two bool scalars lowers
            # to an i8->i1 trunci that Mosaic rejects); col 64 is raw sigma
            if rgb_sigmoid and sem_sigmoid:
                use = col < 64
            elif rgb_sigmoid:
                use = col < 32
            else:
                use = (col >= 32) & (col < 64)
            act = jnp.where(use, clamped, o)
        else:
            act = o
        # ONE [T, 128] output: cols 0:64 activated colors, col 64 raw sigma.
        # Separate [T, 64]/[T, 1] outputs lane-pad to 128 in HBM (2x / 128x
        # write amplification); the combined buffer is the minimal layout.
        out_ref[:] = act.astype(out_ref.dtype)

    return kernel


def fuse_late_separate_params(params, lr_mul):
    """Merge the two _MLP2 param trees into the kernel's (W1, b1, W2, b2).

    Gains follow `nn.layers.FullyConnected`: weight * lr_mul/sqrt(in),
    bias * lr_mul."""

    # The packing below hard-codes n_features=32, hidden=64 and
    # decoder_output_dim=32 (the shipped lateSeparate topology); clamped
    # numpy-style slicing would silently truncate wider decoders, so fail
    # loudly on any other shape.
    for net in ("net", "net_semantic"):
        assert params[net]["fc0"]["weight"].shape == (32, 64), \
            f"{net}.fc0 weight {params[net]['fc0']['weight'].shape} != (32, 64)"
        assert params[net]["fc1"]["weight"].shape == (64, 33), \
            f"{net}.fc1 weight {params[net]['fc1']['weight'].shape} != (64, 33)"

    def g(net, layer, fan_in):
        w = params[net][layer]["weight"] * (lr_mul / jnp.sqrt(fan_in))
        b = params[net][layer]["bias"] * lr_mul
        return w, b

    wa0, ba0 = g("net", "fc0", 32.0)
    wb0, bb0 = g("net_semantic", "fc0", 32.0)
    wa1, ba1 = g("net", "fc1", 64.0)
    wb1, bb1 = g("net_semantic", "fc1", 64.0)
    w1 = jnp.concatenate([wa0, wb0], axis=1)                 # [32, 128]
    b1 = jnp.concatenate([ba0, bb0])[None, :]                # [1, 128]
    w2 = jnp.zeros((128, 128), jnp.float32)
    w2 = w2.at[:64, 0:32].set(wa1[:, 1:33])
    w2 = w2.at[64:, 32:64].set(wb1[:, 1:33])
    w2 = w2.at[64:, 64].set(wb1[:, 0])
    b2 = jnp.zeros((128,), jnp.float32)
    b2 = b2.at[0:32].set(ba1[1:33])
    b2 = b2.at[32:64].set(bb1[1:33])
    b2 = b2.at[64].set(bb1[0])
    return w1, b1, w2, b2[None, :]


@functools.partial(jax.jit, static_argnames=("rgb_sigmoid", "sem_sigmoid",
                                             "compute_dtype", "interpret"))
def late_separate_decode(feats, w1, b1, w2, b2, rgb_sigmoid=True,
                         sem_sigmoid=False, compute_dtype=jnp.bfloat16,
                         interpret=False):
    """feats [M, 32] -> (colors [M, 64] compute_dtype, sigma [M, 1] f32).

    M is padded to a TILE multiple internally.  `interpret=True` runs the
    Pallas interpreter (CPU correctness tests)."""
    m = feats.shape[0]
    m_pad = -(-m // TILE) * TILE
    x = feats.astype(compute_dtype)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        _make_kernel(bool(rgb_sigmoid), bool(sem_sigmoid), compute_dtype),
        grid=(m_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 128), compute_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * (32 * 128 + 128 * 128),
            bytes_accessed=m_pad * (32 + 128) * x.dtype.itemsize,
            transcendentals=m_pad * 256,
        ),
        interpret=interpret,
    )(x, w1.astype(compute_dtype), b1.astype(jnp.float32),
      w2.astype(compute_dtype), b2.astype(jnp.float32))
    # the slices fuse into consumers; sigma is compute_dtype in serving
    # (bf16 raw density, ~0.4% rel. rounding) and f32 when validating
    return out[:m, :64], out[:m, 64:65].astype(jnp.float32)
