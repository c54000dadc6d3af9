"""Tri-plane generators and neural-field decoders.

Ref `training/triplane.py` and `training/triplane_cond.py`.  The flagship
model (every shipped pix2pix3D config) is
:class:`TriPlaneSemanticEntangleGenerator` (`triplane_cond.py:976-1079`): one
conditional StyleGAN2 backbone emits 3x32-channel planes, a late-separate
two-MLP decoder yields rgb-features + (sigma, semantic logits), a two-pass
importance renderer composites a 64-channel feature image that is split into
an rgb half and a semantic half, each super-resolved separately.

All images NHWC; planes `[N, 3, H, W, C]` feature-last.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..nn.layers import FullyConnected
from ..nn.synthesis import SynthesisNetwork, Generator as StyleGAN2Backbone
from ..nn.cond_mapping import (
    MaskMappingNetwork,
    MaskMappingNetworkDisentangle,
    EdgeMappingNetwork,
    EdgeMappingNetworkDisentangle,
)
from ..nn.superresolution import (build_superresolution, dual_sr_compatible,
                                  dual_superresolution)
from ..ops.grid_sample import grid_sample_2d
from ..render.ray_sampler import sample_rays
from ..render.renderer import ImportanceRenderer


MAPPING_REGISTRY = {
    "MaskMappingNetwork": MaskMappingNetwork,
    "MaskMappingNetwork_disentangle": MaskMappingNetworkDisentangle,
    "EdgeMappingNetwork": EdgeMappingNetwork,
    "EdgeMappingNetwork_disentangle": EdgeMappingNetworkDisentangle,
}


def _sigmoid_clamp(x):
    """MipNeRF sigmoid clamping (ref `triplane.py:133`)."""
    return jax.nn.sigmoid(x) * (1 + 2 * 0.001) - 0.001


class _MLP2:
    """FullyConnected -> softplus -> FullyConnected (the OSG decoder body)."""

    def __init__(self, n_in, n_hidden, n_out, lr_mul):
        self.fc0 = FullyConnected(n_in, n_hidden, lr_multiplier=lr_mul)
        self.fc1 = FullyConnected(n_hidden, n_out, lr_multiplier=lr_mul)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        return {"fc0": self.fc0.init(k0), "fc1": self.fc1.init(k1)}

    def __call__(self, params, x):
        x = self.fc0(params["fc0"], x)
        x = jax.nn.softplus(x)
        return self.fc1(params["fc1"], x)


class OSGDecoder:
    """Tri-plane MLP decoder: mean over planes -> 2-layer MLP -> (sigma, rgb)
    (ref `triplane.py:112-135`)."""

    def __init__(self, n_features, options):
        self.hidden_dim = 64
        self.net = _MLP2(n_features, self.hidden_dim,
                         1 + options["decoder_output_dim"], options["decoder_lr_mul"])

    def init(self, key):
        return {"net": self.net.init(key)}

    def __call__(self, params, sampled_features, ray_directions):
        x = jnp.mean(sampled_features, axis=1)  # [N, M, C]
        x = self.net(params["net"], x)
        rgb = _sigmoid_clamp(x[..., 1:])
        sigma = x[..., 0:1]
        return {"rgb": rgb, "sigma": sigma}


class OSGDecoderSemantic(OSGDecoder):
    """Semantic branch decoder with optional final sigmoid
    (ref `triplane_cond.py:859-887`)."""

    def __init__(self, n_features, options):
        super().__init__(n_features, options)
        self.final_sigmoid = options["sigmoid"]

    def __call__(self, params, sampled_features, ray_directions):
        x = jnp.mean(sampled_features, axis=1)
        x = self.net(params["net"], x)
        rgb = _sigmoid_clamp(x[..., 1:]) if self.final_sigmoid else x[..., 1:]
        sigma = x[..., 0:1]
        return {"rgb": rgb, "sigma": sigma}


class OSGDecoderSemanticEntangle:
    """Single MLP emitting rgb+semantic+features with selective sigmoid
    (ref `triplane_cond.py:891-924`)."""

    def __init__(self, n_features, options):
        self.hidden_dim = 64
        self.net = _MLP2(n_features, self.hidden_dim,
                         1 + options["decoder_output_dim"], options["decoder_lr_mul"])
        self.feature_sigmoid = options["sigmoid"]
        self.semantic_channels = options["semantic_channels"]

    def init(self, key):
        return {"net": self.net.init(key)}

    def __call__(self, params, sampled_features, ray_directions):
        x = jnp.mean(sampled_features, axis=1)
        x = self.net(params["net"], x)
        if self.feature_sigmoid:
            feature = _sigmoid_clamp(x[..., 1:])
        else:
            s = self.semantic_channels
            rgb = _sigmoid_clamp(x[..., 1:4])
            semantic = x[..., 4:4 + s]
            rest = _sigmoid_clamp(x[..., 4 + s:])
            feature = jnp.concatenate([rgb, semantic, rest], axis=-1)
        sigma = x[..., 0:1]
        return {"rgb": feature, "sigma": sigma}


class OSGDecoderSemanticLateSeparate:
    """Two parallel 2-layer MLPs over the same plane features; sigma from the
    semantic head (ref `triplane_cond.py:926-970`).  Used by every shipped
    config."""

    def __init__(self, n_features, options):
        self.hidden_dim = 64
        out = 1 + options["decoder_output_dim"]
        lr = options["decoder_lr_mul"]
        self.net = _MLP2(n_features, self.hidden_dim, out, lr)
        self.net_semantic = _MLP2(n_features, self.hidden_dim, out, lr)
        self.semantic_sigmoid = options["sigmoid"]
        self.lr_mul = lr

    def init(self, key):
        k0, k1 = jax.random.split(key)
        return {"net": self.net.init(k0), "net_semantic": self.net_semantic.init(k1)}

    def __call__(self, params, sampled_features, ray_directions, impl="ref"):
        x = jnp.mean(sampled_features, axis=1)  # [N, M, C]
        if impl == "pallas":
            # fused TPU kernel (ops/decoder_pallas.py): both MLPs + epilogue
            # in one VMEM-resident pass; bit-matching math, serving-only
            from ..ops.decoder_pallas import (fuse_late_separate_params,
                                              late_separate_decode)
            n, m, c = x.shape
            w1, b1, w2, b2 = fuse_late_separate_params(params, self.lr_mul)
            colors, sigma = late_separate_decode(
                x.reshape(n * m, c), w1, b1, w2, b2, rgb_sigmoid=True,
                sem_sigmoid=self.semantic_sigmoid, compute_dtype=x.dtype)
            return {"rgb": colors.reshape(n, m, -1),
                    "sigma": sigma.reshape(n, m, 1)}
        rgb = self.net(params["net"], x)
        semantic = self.net_semantic(params["net_semantic"], x)
        sigma = semantic[..., 0:1]
        rgb = _sigmoid_clamp(rgb[..., 1:])
        semantic = (_sigmoid_clamp(semantic[..., 1:]) if self.semantic_sigmoid
                    else semantic[..., 1:])
        feature = jnp.concatenate([rgb, semantic], axis=-1)
        return {"rgb": feature, "sigma": sigma}


class GeneratorCond:
    """SynthesisNetwork + pluggable conditional mapping
    (ref `Generator_cond`, `triplane_cond.py:597-621`)."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 mapping_kwargs=None, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.synthesis = SynthesisNetwork(w_dim=w_dim, img_resolution=img_resolution,
                                          img_channels=img_channels, **synthesis_kwargs)
        self.num_ws = self.synthesis.num_ws
        mk = dict(mapping_kwargs or {})
        class_name = mk.pop("class_name", "MaskMappingNetwork_disentangle")
        cls = MAPPING_REGISTRY[class_name.split(".")[-1]]
        self.mapping = cls(z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
                           num_ws=self.num_ws, **mk)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        return {"mapping": self.mapping.init(k0), "synthesis": self.synthesis.init(k1)}


def _reshape_planes(planes_img, n_planes=3, c=32):
    """Backbone NHWC image `[N, H, W, n_planes*c]` -> `[N, n_planes, H, W, c]`.

    Channel index `plane*c + feat` matches the reference
    `planes.view(N, 3, 32, H, W)` split (`triplane_cond.py:1042`)."""
    n, h, w, _ = planes_img.shape
    return planes_img.reshape(n, h, w, n_planes, c).transpose(0, 3, 1, 2, 4)


def _parse_pose(c):
    cam2world = c[:, :16].reshape(-1, 4, 4)
    intrinsics = c[:, 16:25].reshape(-1, 3, 3)
    return cam2world, intrinsics


class _TriPlaneBase:
    """Shared synthesis plumbing for the generator family."""

    def _render_planes(self, params, planes, c, neural_rendering_resolution,
                       rng=None, det=False):
        cam2world, intrinsics = _parse_pose(c)
        ray_origins, ray_directions = sample_rays(cam2world, intrinsics,
                                                  neural_rendering_resolution)
        decoder = lambda f, d: self.decoder(params["decoder"], f, d)
        if self.rendering_kwargs.get("sampler") == "frustum":
            # gather-free serving fast path (render/frustum.py): regular
            # z-depth slabs resampled with banded MXU matmuls; documented
            # approximation of the two-pass importance renderer
            from ..render.frustum import frustum_render
            fused_decoder = None
            if self.rendering_kwargs.get("decoder_impl") == "pallas":
                if isinstance(self.decoder, OSGDecoderSemanticLateSeparate):
                    # fully fused decode+composite (ops/render_pallas.py):
                    # colors/sigma never round-trip HBM
                    from ..ops.render_pallas import (
                        fuse_late_separate_params_t)
                    fused_decoder = (
                        *fuse_late_separate_params_t(params["decoder"],
                                                     self.decoder.lr_mul),
                        True, self.decoder.semantic_sigmoid)
                else:
                    raise ValueError(
                        "rendering_kwargs['decoder_impl']='pallas' requires "
                        "the OSGDecoderSemanticLateSeparate decoder (the "
                        f"fused kernel hard-codes its topology); got "
                        f"{type(self.decoder).__name__}. Drop decoder_impl "
                        "or use the lateSeparate generator configs.")
            feature_samples, depth_samples, weights_samples = frustum_render(
                planes, decoder, cam2world, intrinsics, self.rendering_kwargs,
                neural_rendering_resolution,
                depth_steps=self.rendering_kwargs.get("frustum_depth_steps"),
                chunk=self.rendering_kwargs.get("frustum_chunk"),
                window=self.rendering_kwargs.get("frustum_window"),
                tiles=self.rendering_kwargs.get("frustum_tiles"),
                compute_dtype=jnp.bfloat16
                if self.rendering_kwargs.get("frustum_bf16", True)
                else jnp.float32,
                fused_decoder=fused_decoder)
        else:
            feature_samples, depth_samples, weights_samples = self.renderer(
                planes, decoder, ray_origins, ray_directions,
                self.rendering_kwargs, rng=rng, det=det)
        return feature_samples, depth_samples, weights_samples, ray_origins, ray_directions

    @staticmethod
    def _to_image(samples, resolution):
        """[N, M, C] row-major samples -> NHWC image."""
        n, m, c = samples.shape
        return samples.reshape(n, resolution, resolution, c)


class TriPlaneGenerator(_TriPlaneBase):
    """Conditional EG3D pipeline without the semantic branch
    (ref `triplane_cond.py:627-715`)."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 sr_num_fp16_res=0, mapping_kwargs=None, rendering_kwargs=None,
                 sr_kwargs=None, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.renderer = ImportanceRenderer()
        self.backbone = GeneratorCond(z_dim, c_dim, w_dim, img_resolution=256,
                                      img_channels=32 * 3,
                                      mapping_kwargs=mapping_kwargs, **synthesis_kwargs)
        rendering_kwargs = rendering_kwargs or {}
        self.superresolution = build_superresolution(
            rendering_kwargs["superresolution_module"], channels=32,
            img_resolution=img_resolution, sr_num_fp16_res=sr_num_fp16_res,
            sr_antialias=rendering_kwargs["sr_antialias"], **(sr_kwargs or {}))
        self.decoder = OSGDecoder(
            32, {"decoder_lr_mul": rendering_kwargs.get("decoder_lr_mul", 1),
                 "decoder_output_dim": 32})
        self.neural_rendering_resolution = 64
        self.rendering_kwargs = rendering_kwargs

    def init(self, key):
        k0, k1, k2 = jax.random.split(key, 3)
        return {"backbone": self.backbone.init(k0),
                "superresolution": self.superresolution.init(k1),
                "decoder": self.decoder.init(k2)}

    def mapping(self, params, z, c, batch, truncation_psi=1.0, truncation_cutoff=None):
        if self.rendering_kwargs["c_gen_conditioning_zero"]:
            c = jnp.zeros_like(c)
        return self.backbone.mapping(
            params["backbone"]["mapping"], z,
            c * self.rendering_kwargs.get("c_scale", 0), batch=batch,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff)

    def synthesis(self, params, ws, c, neural_rendering_resolution=None, rng=None,
                  noise_mode="random", force_fp32=False, det=False, planes=None):
        nrr = neural_rendering_resolution or self.neural_rendering_resolution
        rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
        if planes is None:
            planes_img = self.backbone.synthesis(
                params["backbone"]["synthesis"], ws, noise_mode=noise_mode,
                rng=rngs[0], force_fp32=force_fp32)
            planes = _reshape_planes(planes_img)

        feats, depths, _, _, _ = self._render_planes(params, planes, c, nrr,
                                                     rng=rngs[1], det=det)
        feature_image = self._to_image(feats, nrr)
        depth_image = self._to_image(depths, nrr)

        rgb_image = feature_image[..., :3]
        sr_image = self.superresolution(
            params["superresolution"], rgb_image, feature_image, ws,
            noise_mode=self.rendering_kwargs["superresolution_noise_mode"],
            rng=rngs[2], force_fp32=force_fp32)
        return {"image": sr_image, "image_raw": rgb_image, "image_depth": depth_image,
                "planes": planes}

    def sample_mixed(self, params, coordinates, directions, ws, noise_mode="const",
                     rng=None, force_fp32=False):
        planes_img = self.backbone.synthesis(params["backbone"]["synthesis"], ws,
                                             noise_mode=noise_mode, rng=rng,
                                             force_fp32=force_fp32)
        planes = _reshape_planes(planes_img)
        return self.renderer.run_model(
            planes, lambda f, d: self.decoder(params["decoder"], f, d),
            coordinates, directions, self.rendering_kwargs)

    def __call__(self, params, z, c, batch, truncation_psi=1.0, truncation_cutoff=None,
                 neural_rendering_resolution=None, **synthesis_kwargs):
        ws = self.mapping(params, z, batch["pose"], batch,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params, ws, c,
                              neural_rendering_resolution=neural_rendering_resolution,
                              **synthesis_kwargs)


class TriPlaneSemanticEntangleGenerator(_TriPlaneBase):
    """THE shipped pix2pix3D model (ref `triplane_cond.py:976-1079`).

    Single conditional backbone -> 3x32 planes -> late-separate decoder ->
    64-ch feature image split into rgb/semantic halves -> two SR modules.
    Outputs {image, image_raw, image_depth, semantic, semantic_raw}.
    """

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 semantic_channels, sr_num_fp16_res=0, mapping_kwargs=None,
                 rendering_kwargs=None, sr_kwargs=None, data_type=None,
                 **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.semantic_channels = semantic_channels
        self.data_type = data_type
        self.renderer = ImportanceRenderer()
        self.backbone = GeneratorCond(z_dim, c_dim, w_dim, img_resolution=256,
                                      img_channels=32 * 3,
                                      mapping_kwargs=mapping_kwargs, **synthesis_kwargs)
        rendering_kwargs = rendering_kwargs or {}
        sr_kwargs = sr_kwargs or {}
        self.superresolution = build_superresolution(
            rendering_kwargs["superresolution_module"], channels=32,
            img_resolution=img_resolution, sr_num_fp16_res=sr_num_fp16_res,
            sr_antialias=rendering_kwargs["sr_antialias"], **sr_kwargs)
        self.superresolution_semantic = build_superresolution(
            rendering_kwargs["superresolution_module_semantic"], channels=32,
            img_resolution=img_resolution, sr_num_fp16_res=sr_num_fp16_res,
            sr_antialias=rendering_kwargs["sr_antialias"],
            semantic_channels=semantic_channels, **sr_kwargs)
        self.decoder = OSGDecoderSemanticLateSeparate(
            32, {"decoder_lr_mul": rendering_kwargs.get("decoder_lr_mul", 1),
                 "decoder_output_dim": 32,
                 "sigmoid": semantic_channels == 1,
                 "semantic_channels": semantic_channels})
        self.neural_rendering_resolution = 64
        self.rendering_kwargs = rendering_kwargs

    def init(self, key):
        keys = jax.random.split(key, 4)
        return {"backbone": self.backbone.init(keys[0]),
                "superresolution": self.superresolution.init(keys[1]),
                "superresolution_semantic": self.superresolution_semantic.init(keys[2]),
                "decoder": self.decoder.init(keys[3])}

    def mapping(self, params, z, c, batch, truncation_psi=1.0, truncation_cutoff=None):
        if self.rendering_kwargs["c_gen_conditioning_zero"]:
            c = jnp.zeros_like(c)
        return self.backbone.mapping(
            params["backbone"]["mapping"], z,
            c * self.rendering_kwargs.get("c_scale", 0), batch=batch,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff)

    def synthesis(self, params, ws, c, neural_rendering_resolution=None, rng=None,
                  noise_mode="random", force_fp32=False, det=False, planes=None):
        nrr = neural_rendering_resolution or self.neural_rendering_resolution
        rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
        if planes is None:
            planes_img = self.backbone.synthesis(
                params["backbone"]["synthesis"], ws, noise_mode=noise_mode,
                rng=rngs[0], force_fp32=force_fp32)
            planes = _reshape_planes(planes_img)

        feats, depths, _, _, _ = self._render_planes(params, planes, c, nrr,
                                                     rng=rngs[1], det=det)
        feature_image = self._to_image(feats, nrr)  # [N, h, w, 64]
        depth_image = self._to_image(depths, nrr)

        half = feature_image.shape[-1] // 2
        rgb_feature_image = feature_image[..., :half]
        semantic_feature_image = feature_image[..., half:]

        rgb_image = rgb_feature_image[..., :3]
        semantic_image = semantic_feature_image[..., :self.semantic_channels]
        sr_noise_mode = self.rendering_kwargs["superresolution_noise_mode"]
        # rendering_kwargs['sr_sem_f32'] / ['sr_sem_precision']: run ONLY
        # the semantic SR stack at f32 TENSORS while the rest of the
        # serving program keeps the fast bf16 policy — the mIoU quality
        # gate reads this stack's argmax, where bf16 rounding can flip
        # near-tie class boundaries (docs/SERVING.md round-4 attribution).
        # 'sr_sem_precision' grades the f32 matmul cost (ops/precision
        # ._LEVELS): 'default' (1 bf16 pass — removes only the bf16
        # ACTIVATION storage), 'high' (bf16x3), 'highest' (bit-close f32;
        # == the legacy sr_sem_f32 flag, measured -37% on the r5 bench).
        # Incompatible with the dual-SR grouped-conv fast path (the two
        # stacks must run at different precisions), so it takes priority
        # over dual_sr.
        sem_prec = self.rendering_kwargs.get("sr_sem_precision")
        if sem_prec is None and self.rendering_kwargs.get("sr_sem_f32"):
            sem_prec = "highest"
        sem_f32 = sem_prec is not None
        if (not sem_f32 and self.rendering_kwargs.get("dual_sr")
                and dual_sr_compatible(
                    self.superresolution, self.superresolution_semantic)):
            # serving fast path: both SR stacks in one vmapped program
            # (grouped convs) — see nn/superresolution.dual_superresolution
            sr_image, sr_semantic = dual_superresolution(
                self.superresolution, self.superresolution_semantic,
                params["superresolution"], params["superresolution_semantic"],
                rgb_image, rgb_feature_image,
                semantic_image, semantic_feature_image, ws,
                noise_mode=sr_noise_mode, rngs=(rngs[2], rngs[3]),
                force_fp32=force_fp32)
        else:
            sr_image = self.superresolution(
                params["superresolution"], rgb_image, rgb_feature_image, ws,
                noise_mode=sr_noise_mode, rng=rngs[2], force_fp32=force_fp32)
            from ..ops import precision as _precision
            with _precision.precise_scope(sem_f32, level=sem_prec or "highest"):
                sr_semantic = self.superresolution_semantic(
                    params["superresolution_semantic"], semantic_image,
                    semantic_feature_image, ws,
                    noise_mode=sr_noise_mode, rng=rngs[3],
                    force_fp32=force_fp32 or sem_f32)

        return {"image": sr_image, "image_raw": rgb_image,
                "image_depth": depth_image, "semantic": sr_semantic,
                "semantic_raw": semantic_image, "planes": planes}

    def sample(self, params, coordinates, directions, z, c, batch,
               truncation_psi=1.0, truncation_cutoff=None, **synthesis_kwargs):
        """Field evaluation from (z, mask) inputs (ref `triplane_cond.py
        :1063-1068`): mapping then point evaluation."""
        ws = self.mapping(params, z, batch["pose"], batch,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.sample_mixed(params, coordinates, directions, ws,
                                 **synthesis_kwargs)

    def sample_mixed(self, params, coordinates, directions, ws, noise_mode="const",
                     rng=None, force_fp32=False):
        """Evaluate the neural field at arbitrary 3D coords
        (ref `triplane_cond.py:1070-1074`; used for mesh extraction)."""
        planes_img = self.backbone.synthesis(params["backbone"]["synthesis"], ws,
                                             noise_mode=noise_mode, rng=rng,
                                             force_fp32=force_fp32)
        planes = _reshape_planes(planes_img)
        return self.run_model_planes(params, planes, coordinates, directions)

    def run_model_planes(self, params, planes, coordinates, directions):
        return self.renderer.run_model(
            planes, lambda f, d: self.decoder(params["decoder"], f, d),
            coordinates, directions, self.rendering_kwargs)

    def __call__(self, params, z, c, batch, truncation_psi=1.0, truncation_cutoff=None,
                 neural_rendering_resolution=None, **synthesis_kwargs):
        ws = self.mapping(params, z, batch["pose"], batch,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params, ws, c,
                              neural_rendering_resolution=neural_rendering_resolution,
                              **synthesis_kwargs)


class TriPlaneSemanticGenerator(_TriPlaneBase):
    """Two-backbone variant: separate texture + semantic planes
    (ref `triplane_cond.py:723-854`; not used by shipped configs)."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 semantic_channels, sr_num_fp16_res=0, mapping_kwargs=None,
                 rendering_kwargs=None, sr_kwargs=None, data_type=None,
                 **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.semantic_channels = semantic_channels
        self.renderer = ImportanceRenderer()
        self.backbone = StyleGAN2Backbone(z_dim, c_dim, w_dim, img_resolution=256,
                                          img_channels=32 * 3,
                                          mapping_kwargs={}, **synthesis_kwargs)
        self.backbone_semantic = GeneratorCond(0, c_dim, w_dim, img_resolution=256,
                                               img_channels=32 * 3,
                                               mapping_kwargs=mapping_kwargs,
                                               **synthesis_kwargs)
        rendering_kwargs = rendering_kwargs or {}
        sr_kwargs = sr_kwargs or {}
        self.superresolution = build_superresolution(
            rendering_kwargs["superresolution_module"], channels=32,
            img_resolution=img_resolution, sr_num_fp16_res=sr_num_fp16_res,
            sr_antialias=rendering_kwargs["sr_antialias"], **sr_kwargs)
        self.superresolution_semantic = build_superresolution(
            rendering_kwargs["superresolution_module_semantic"], channels=32,
            img_resolution=img_resolution, sr_num_fp16_res=sr_num_fp16_res,
            sr_antialias=rendering_kwargs["sr_antialias"],
            semantic_channels=semantic_channels, **sr_kwargs)
        lr_mul = rendering_kwargs.get("decoder_lr_mul", 1)
        self.decoder = OSGDecoder(
            64, {"decoder_lr_mul": lr_mul, "decoder_output_dim": 32})
        self.decoder_semantic = OSGDecoderSemantic(
            32, {"decoder_lr_mul": lr_mul, "decoder_output_dim": 32,
                 "sigmoid": semantic_channels == 1})
        self.neural_rendering_resolution = 64
        self.rendering_kwargs = rendering_kwargs

    def init(self, key):
        keys = jax.random.split(key, 6)
        return {"backbone": self.backbone.init(keys[0]),
                "backbone_semantic": self.backbone_semantic.init(keys[1]),
                "superresolution": self.superresolution.init(keys[2]),
                "superresolution_semantic": self.superresolution_semantic.init(keys[3]),
                "decoder": self.decoder.init(keys[4]),
                "decoder_semantic": self.decoder_semantic.init(keys[5])}

    def mapping(self, params, z, c, batch, truncation_psi=1.0, truncation_cutoff=None):
        if self.rendering_kwargs["c_gen_conditioning_zero"]:
            c = jnp.zeros_like(c)
        c_scaled = c * self.rendering_kwargs.get("c_scale", 0)
        ws_texture = self.backbone.mapping(
            params["backbone"]["mapping"], z, c_scaled,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff)
        ws_semantic = self.backbone_semantic.mapping(
            params["backbone_semantic"]["mapping"], None, c_scaled, batch=batch,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff)
        return jnp.concatenate([ws_texture, ws_semantic], axis=-1)

    def _run_model(self, params, planes_texture, planes_semantic, coords, dirs):
        """Ref `ImportanceSemanticRenderer.run_model` (`renderer.py:324-333`)."""
        from ..render.renderer import sample_from_planes
        bw = self.rendering_kwargs["box_warp"]
        feats_t = sample_from_planes(planes_texture, coords, box_warp=bw)
        feats_s = sample_from_planes(planes_semantic, coords, box_warp=bw)
        out_s = self.decoder_semantic(params["decoder_semantic"], feats_s, dirs)
        out_t = self.decoder(params["decoder"],
                             jnp.concatenate([feats_t, feats_s], axis=-1), dirs)
        return {"sigma": out_s["sigma"],
                "rgb": jnp.concatenate([out_t["rgb"], out_s["rgb"]], axis=-1)}

    def synthesis(self, params, ws, c, neural_rendering_resolution=None, rng=None,
                  noise_mode="random", force_fp32=False, det=False):
        nrr = neural_rendering_resolution or self.neural_rendering_resolution
        rngs = jax.random.split(rng, 5) if rng is not None else [None] * 5
        assert ws.shape[-1] == self.w_dim * 2
        ws_texture, ws_semantic = ws[..., :self.w_dim], ws[..., self.w_dim:]
        planes_t = _reshape_planes(self.backbone.synthesis(
            params["backbone"]["synthesis"], ws_texture, noise_mode=noise_mode,
            rng=rngs[0], force_fp32=force_fp32))
        planes_s = _reshape_planes(self.backbone_semantic.synthesis(
            params["backbone_semantic"]["synthesis"], ws_semantic,
            noise_mode=noise_mode, rng=rngs[1], force_fp32=force_fp32))

        cam2world, intrinsics = _parse_pose(c)
        ray_origins, ray_directions = sample_rays(cam2world, intrinsics, nrr)

        # Coarse/fine passes via the shared render_rays core with a closure
        # over the two plane sets (semantic renderer semantics,
        # ref `renderer.py:256-333`).
        from ..render.renderer import render_rays
        run = lambda coords, dirs: self._run_model(params, planes_t, planes_s,
                                                   coords, dirs)
        feats, depths, _ = render_rays(run, ray_origins, ray_directions,
                                       self.rendering_kwargs, rng=rngs[2],
                                       det=det)

        feature_image = self._to_image(feats, nrr)
        depth_image = self._to_image(depths, nrr)
        half = feature_image.shape[-1] // 2
        rgb_feature_image = feature_image[..., :half]
        semantic_feature_image = feature_image[..., half:]

        rgb_image = rgb_feature_image[..., :3]
        sr_image = self.superresolution(
            params["superresolution"], rgb_image, rgb_feature_image, ws_texture,
            noise_mode=self.rendering_kwargs["superresolution_noise_mode"],
            rng=rngs[3], force_fp32=force_fp32)
        semantic_image = semantic_feature_image[..., :self.semantic_channels]
        sr_semantic = self.superresolution_semantic(
            params["superresolution_semantic"], semantic_image,
            semantic_feature_image, ws_semantic,
            noise_mode=self.rendering_kwargs["superresolution_noise_mode"],
            rng=rngs[4], force_fp32=force_fp32)
        return {"image": sr_image, "image_raw": rgb_image,
                "image_depth": depth_image, "semantic": sr_semantic,
                "semantic_raw": semantic_image}

    def __call__(self, params, z, c, batch, truncation_psi=1.0, truncation_cutoff=None,
                 neural_rendering_resolution=None, **synthesis_kwargs):
        ws = self.mapping(params, z, batch["pose"], batch,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params, ws, c,
                              neural_rendering_resolution=neural_rendering_resolution,
                              **synthesis_kwargs)


class TriPlaneSemanticEntangleGeneratorWithBG(TriPlaneSemanticEntangleGenerator):
    """Adds an equirectangular background plane generator
    (ref `triplane_cond.py:1085-1246`): a second StyleGAN2 backbone renders a
    64-channel 256^2 plane sampled by spherical ray direction, composited
    `fg + bg*(1-weights)`; also outputs the `weight` silhouette image."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 semantic_channels, sr_num_fp16_res=0, mapping_kwargs=None,
                 rendering_kwargs=None, sr_kwargs=None, data_type=None,
                 **synthesis_kwargs):
        super().__init__(z_dim, c_dim, w_dim, img_resolution, img_channels,
                         semantic_channels, sr_num_fp16_res=sr_num_fp16_res,
                         mapping_kwargs=mapping_kwargs,
                         rendering_kwargs=rendering_kwargs, sr_kwargs=sr_kwargs,
                         data_type=data_type, **synthesis_kwargs)
        self.backbone_bg = StyleGAN2Backbone(z_dim, 0, w_dim, img_resolution=256,
                                             img_channels=32 * 2, mapping_kwargs={},
                                             **synthesis_kwargs)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        params = super().init(k0)
        params["backbone_bg"] = self.backbone_bg.init(k1)
        return params

    def synthesis(self, params, ws, c, neural_rendering_resolution=None, rng=None,
                  noise_mode="random", force_fp32=False, det=False, planes=None):
        nrr = neural_rendering_resolution or self.neural_rendering_resolution
        rngs = jax.random.split(rng, 5) if rng is not None else [None] * 5
        if planes is None:
            planes_img = self.backbone.synthesis(
                params["backbone"]["synthesis"], ws, noise_mode=noise_mode,
                rng=rngs[0], force_fp32=force_fp32)
            planes = _reshape_planes(planes_img)

        feats, depths, weights, ray_origins, ray_directions = self._render_planes(
            params, planes, c, nrr, rng=rngs[1], det=det)

        # Background plane from the last w broadcast (ref :1160-1162).
        ws_bg = jnp.tile(ws[:, -1:, :], (1, self.backbone_bg.num_ws, 1))
        planes_bg = self.backbone_bg.synthesis(
            params["backbone_bg"]["synthesis"], ws_bg, noise_mode=noise_mode,
            rng=rngs[2], force_fp32=force_fp32)  # [N, 256, 256, 64]

        feats, depths = self._combine_fg_bg(feats, depths, weights, planes_bg,
                                            ray_directions)

        feature_image = self._to_image(feats, nrr)
        depth_image = self._to_image(depths, nrr)
        weight_image = self._to_image(weights, nrr)

        half = feature_image.shape[-1] // 2
        rgb_feature_image = feature_image[..., :half]
        semantic_feature_image = feature_image[..., half:]

        rgb_image = rgb_feature_image[..., :3]
        sr_image = self.superresolution(
            params["superresolution"], rgb_image, rgb_feature_image, ws,
            noise_mode=self.rendering_kwargs["superresolution_noise_mode"],
            rng=rngs[3], force_fp32=force_fp32)
        semantic_image = semantic_feature_image[..., :self.semantic_channels]
        sr_semantic = self.superresolution_semantic(
            params["superresolution_semantic"], semantic_image,
            semantic_feature_image, ws,
            noise_mode=self.rendering_kwargs["superresolution_noise_mode"],
            rng=rngs[4], force_fp32=force_fp32)

        return {"image": sr_image, "image_raw": rgb_image,
                "image_depth": depth_image, "semantic": sr_semantic,
                "semantic_raw": semantic_image, "weight": weight_image,
                "planes": planes}

    def _combine_fg_bg(self, feature_samples, depth_samples, weights_samples,
                       planes_bg, ray_directions):
        """Ref `triplane_cond.py:1202-1246`."""
        d = ray_directions / jnp.linalg.norm(ray_directions, axis=-1, keepdims=True)
        theta = jnp.arctan2(d[:, :, 1], d[:, :, 0])
        phi = jnp.arccos(d[:, :, 2])
        x = theta * 2 / math.pi
        y = phi * 2 / math.pi - 1
        coords = jnp.stack([x, y], axis=-1)  # [N, M, 2]

        bg = grid_sample_2d(planes_bg, coords, padding_mode="border")  # [N, M, 64]
        bg = jax.nn.sigmoid(bg) * (1 + 2 * 0.001) - 0.001
        bg = bg * 2 - 1

        rgb_part = bg[:, :, :32]
        sem_part = bg[:, :, 32:] * 10
        if self.semantic_channels > 1:
            # Hardcode bg semantic class 0 (ref :1233-1236).
            s = self.semantic_channels
            sem_part = jnp.concatenate(
                [jnp.full_like(sem_part[:, :, :1], 20.0),
                 jnp.zeros_like(sem_part[:, :, 1:s]),
                 sem_part[:, :, s:]], axis=-1)
        bg = jnp.concatenate([rgb_part, sem_part], axis=-1)

        feature_samples = feature_samples + bg * (1 - weights_samples)
        depth_bg = jnp.full_like(depth_samples, self.rendering_kwargs["ray_end"])
        depth_samples = depth_samples + depth_bg * (1 - weights_samples)
        return feature_samples, depth_samples


GENERATOR_REGISTRY = {
    "TriPlaneGenerator": TriPlaneGenerator,
    "TriPlaneSemanticGenerator": TriPlaneSemanticGenerator,
    "TriPlaneSemanticEntangleGenerator": TriPlaneSemanticEntangleGenerator,
    "TriPlaneSemanticEntangleGenerator_withBG": TriPlaneSemanticEntangleGeneratorWithBG,
}


def build_generator(class_name, **kwargs):
    """Construct a generator by (reference-compatible) class name."""
    return GENERATOR_REGISTRY[class_name.split(".")[-1]](**kwargs)
