"""bf16 (fp16-res) blocks must be differentiable.

Regression for the training CLI failure: a conv/dot with bf16 operands and
`preferred_element_type=f32` is non-transposable under jax.grad (the f32
cotangent can't pair with bf16 operands).  The reference trains its D and
SR stacks in fp16 (`train.py:231-233`), so every bf16 path here must carry
gradients.  See `ops/precision.py:acc_type`.
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_dual_discriminator_fp16_grad():
    from pix2pix3d_tpu.nn.discriminator import DualDiscriminator
    D = DualDiscriminator(img_channels=3, c_dim=25, img_resolution=64,
                          channel_base=2048, channel_max=32, num_fp16_res=4,
                          conv_clamp=256,
                          epilogue_kwargs=dict(mbstd_group_size=2))
    p = D.init(jax.random.PRNGKey(0))
    img = {"image": jnp.ones((2, 64, 64, 3)) * 0.1,
           "image_raw": jnp.ones((2, 32, 32, 3)) * 0.1}
    c = jnp.ones((2, 25)) * 0.05
    g = jax.grad(lambda p: D(p, img, c).sum())(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_superresolution_fp16_grad():
    from pix2pix3d_tpu.nn.superresolution import build_superresolution
    sr = build_superresolution("SuperresolutionHybrid2X", channels=32,
                               img_resolution=128, sr_num_fp16_res=4,
                               sr_antialias=True, channel_base=2048,
                               channel_max=64, fused_modconv_default
                               ="inference_only")
    p = sr.init(jax.random.PRNGKey(0))
    rgb = jnp.ones((2, 64, 64, 3)) * 0.1
    feat = jnp.ones((2, 64, 64, 32)) * 0.1
    ws = jnp.ones((2, 14, 512)) * 0.01

    def loss(p):
        return sr(p, rgb, feat, ws, noise_mode="none").sum()

    g = jax.grad(loss)(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
