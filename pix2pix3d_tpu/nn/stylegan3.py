"""StyleGAN3 alias-free synthesis stack (ref `training/networks_stylegan3.py`).

pix2pix3D imports this family (`superresolution.py:22`) but no shipped
config instantiates it; provided for capability completeness.  NHWC; the
modulated conv uses the input-scaling formulation (see `nn/layers.py`) with
StyleGAN3's extra pre-normalization and input_gain (ref `:27-67`); the
Kaiser/jinc filter design is identical (scipy at construction time).
"""

from __future__ import annotations

import math

import numpy as np
import scipy.signal
import scipy.special
import jax
import jax.numpy as jnp

from ..ops.bias_act import bias_act
from ..ops.conv2d_resample import _conv2d
from ..ops.filtered_lrelu import filtered_lrelu
from .layers import FullyConnected
from .mapping import MappingNetwork


def modulated_conv2d_s3(x, weight, styles, demodulate=True, padding=0,
                        input_gain=None):
    """StyleGAN3 modconv (ref `networks_stylegan3.py:27-67`), NHWC
    input-scaling formulation.

    x `[N, H, W, I]`, weight `[kh, kw, I, O]`, styles `[N, I]`."""
    n = x.shape[0]
    kh, kw, in_ch, out_ch = weight.shape

    w32 = weight.astype(jnp.float32)
    s32 = styles.astype(jnp.float32)
    if demodulate:
        # pre-normalize (ref :43-45)
        w32 = w32 * jax.lax.rsqrt(
            jnp.mean(jnp.square(w32), axis=(0, 1, 2), keepdims=True))
        s32 = s32 * jax.lax.rsqrt(jnp.mean(jnp.square(s32)))

    dcoefs = None
    if demodulate:
        w_sq = jnp.sum(jnp.square(w32), axis=(0, 1))  # [I, O]
        denom = jnp.dot(jnp.square(s32), w_sq,
                        precision=jax.lax.Precision.HIGHEST) + 1e-8
        dcoefs = jax.lax.rsqrt(denom)  # [N, O]

    scale = s32
    if input_gain is not None:
        scale = scale * jnp.broadcast_to(
            jnp.asarray(input_gain, jnp.float32).reshape(-1, 1)
            if jnp.ndim(input_gain) <= 1 else input_gain, s32.shape)

    x = x * scale.astype(x.dtype)[:, None, None, :]
    x = _conv2d(x, w32, padding=((padding, padding), (padding, padding)))
    if demodulate:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    return x


def design_lowpass_filter(numtaps, cutoff, width, fs, radial=False):
    """Kaiser / radial jinc low-pass design (ref `:380-400`)."""
    assert numtaps >= 1
    if numtaps == 1:
        return None
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return jnp.asarray(f, dtype=jnp.float32)
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[np.isnan(f)] = cutoff * 2 * cutoff  # limit at r=0
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    wnd = np.kaiser(numtaps, beta)
    f *= np.outer(wnd, wnd)
    f /= np.sum(f)
    return jnp.asarray(f, dtype=jnp.float32)


class SynthesisInput:
    """Transformed Fourier-feature input (ref `:171-250`)."""

    def __init__(self, w_dim, channels, size, sampling_rate, bandwidth):
        self.w_dim = w_dim
        self.channels = channels
        self.size = np.broadcast_to(np.asarray(size), [2])
        self.sampling_rate = sampling_rate
        self.bandwidth = bandwidth
        self.affine = FullyConnected(w_dim, 4, bias_init=0)  # custom init below

    def init(self, key):
        k_f, k_p, k_w, k_a = jax.random.split(key, 4)
        freqs = jax.random.normal(k_f, (self.channels, 2))
        radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
        freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
        freqs = freqs * self.bandwidth
        phases = jax.random.uniform(k_p, (self.channels,)) - 0.5
        affine = self.affine.init(k_a)
        # ref: weight_init=0, bias_init=[1,0,0,0]
        affine["weight"] = jnp.zeros_like(affine["weight"])
        affine["bias"] = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        return {
            "weight": jax.random.normal(k_w, (self.channels, self.channels)),
            "affine": affine,
            "transform": jnp.eye(3, dtype=jnp.float32),
            "freqs": freqs,
            "phases": phases,
        }

    def __call__(self, params, w):
        n = w.shape[0]
        t = self.affine(params["affine"], w)
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        zeros = jnp.zeros((n,))
        ones = jnp.ones((n,))
        m_r = jnp.stack([
            jnp.stack([t[:, 0], -t[:, 1], zeros], -1),
            jnp.stack([t[:, 1], t[:, 0], zeros], -1),
            jnp.stack([zeros, zeros, ones], -1)], -2)
        m_t = jnp.stack([
            jnp.stack([ones, zeros, -t[:, 2]], -1),
            jnp.stack([zeros, ones, -t[:, 3]], -1),
            jnp.stack([zeros, zeros, ones], -1)], -2)
        transforms = m_r @ m_t @ params["transform"][None]

        freqs = params["freqs"][None]  # [1, C, 2]
        phases = params["phases"][None] + (freqs @ transforms[:, :2, 2:])[..., 0]
        freqs = freqs @ transforms[:, :2, :2]

        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(freqs, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth), 0, 1)

        # sampling grid (align_corners=False affine_grid semantics)
        wpix, hpix = int(self.size[0]), int(self.size[1])
        sx = 0.5 * wpix / self.sampling_rate
        sy = 0.5 * hpix / self.sampling_rate
        gx = (jnp.arange(wpix) + 0.5) / wpix * 2 - 1
        gy = (jnp.arange(hpix) + 0.5) / hpix * 2 - 1
        gyy, gxx = jnp.meshgrid(gy * sy, gx * sx, indexing="ij")
        grid = jnp.stack([gxx, gyy], -1)  # [H, W, 2]

        x = jnp.einsum("hwk,nck->nhwc", grid, freqs)
        x = x + phases[:, None, None, :]
        x = jnp.sin(x * (2 * math.pi))
        x = x * amplitudes[:, None, None, :]

        weight = params["weight"] / math.sqrt(self.channels)
        return x @ weight.T  # [N, H, W, C]


class SynthesisLayerS3:
    """Alias-free layer: modconv + filtered lrelu resampling (ref `:255-378`)."""

    def __init__(self, w_dim, is_torgb, is_critically_sampled, use_fp16,
                 in_channels, out_channels, in_size, out_size,
                 in_sampling_rate, out_sampling_rate, in_cutoff, out_cutoff,
                 in_half_width, out_half_width, conv_kernel=3, filter_size=6,
                 lrelu_upsampling=2, use_radial_filters=False, conv_clamp=256,
                 magnitude_ema_beta=0.999):
        self.w_dim = w_dim
        self.is_torgb = is_torgb
        self.use_fp16 = use_fp16
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.in_size = np.broadcast_to(np.asarray(in_size), [2])
        self.out_size = np.broadcast_to(np.asarray(out_size), [2])
        self.conv_kernel = 1 if is_torgb else conv_kernel
        self.conv_clamp = conv_clamp
        self.magnitude_ema_beta = magnitude_ema_beta
        tmp = max(in_sampling_rate, out_sampling_rate) * (1 if is_torgb else lrelu_upsampling)

        self.up_factor = int(np.rint(tmp / in_sampling_rate))
        self.up_taps = filter_size * self.up_factor \
            if self.up_factor > 1 and not is_torgb else 1
        self.up_filter = design_lowpass_filter(
            self.up_taps, in_cutoff, in_half_width * 2, tmp)

        self.down_factor = int(np.rint(tmp / out_sampling_rate))
        self.down_taps = filter_size * self.down_factor \
            if self.down_factor > 1 and not is_torgb else 1
        self.down_filter = design_lowpass_filter(
            self.down_taps, out_cutoff, out_half_width * 2, tmp,
            radial=use_radial_filters and not is_critically_sampled)

        pad_total = (self.out_size - 1) * self.down_factor + 1
        pad_total = pad_total - (self.in_size + self.conv_kernel - 1) * self.up_factor
        pad_total = pad_total + self.up_taps + self.down_taps - 2
        pad_lo = (pad_total + self.up_factor) // 2
        pad_hi = pad_total - pad_lo
        self.padding = [int(pad_lo[0]), int(pad_hi[0]),
                        int(pad_lo[1]), int(pad_hi[1])]
        self.affine = FullyConnected(w_dim, in_channels, bias_init=1)

    def init(self, key):
        k_a, k_w = jax.random.split(key)
        k = self.conv_kernel
        return {
            "affine": self.affine.init(k_a),
            "weight": jax.random.normal(
                k_w, (k, k, self.in_channels, self.out_channels), jnp.float32),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
            "magnitude_ema": jnp.ones((), jnp.float32),
        }

    def __call__(self, params, x, w, force_fp32=False):
        input_gain = jax.lax.rsqrt(params["magnitude_ema"])
        styles = self.affine(params["affine"], w)
        if self.is_torgb:
            styles = styles / math.sqrt(self.in_channels * self.conv_kernel ** 2)

        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        x = modulated_conv2d_s3(
            x.astype(dtype), params["weight"], styles,
            demodulate=not self.is_torgb, padding=self.conv_kernel - 1,
            input_gain=jnp.broadcast_to(input_gain, (x.shape[0],)))

        gain = 1 if self.is_torgb else math.sqrt(2)
        slope = 1 if self.is_torgb else 0.2
        x = filtered_lrelu(x, fu=self.up_filter, fd=self.down_filter,
                           b=params["bias"].astype(x.dtype),
                           up=self.up_factor, down=self.down_factor,
                           padding=self.padding, gain=gain, slope=slope,
                           clamp=self.conv_clamp)
        return x

    def updated_magnitude_ema(self, params, x):
        cur = jnp.mean(jnp.square(jax.lax.stop_gradient(x).astype(jnp.float32)))
        return cur + self.magnitude_ema_beta * (params["magnitude_ema"] - cur)


class SynthesisNetworkS3:
    """Alias-free synthesis network (ref `:405-489`)."""

    def __init__(self, w_dim, img_resolution, img_channels, channel_base=32768,
                 channel_max=512, num_layers=14, num_critical=2, first_cutoff=2,
                 first_stopband=2 ** 2.1, last_stopband_rel=2 ** 0.3,
                 margin_size=10, output_scale=0.25, num_fp16_res=4,
                 **layer_kwargs):
        self.w_dim = w_dim
        self.num_ws = num_layers + 2
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.num_layers = num_layers
        self.output_scale = output_scale

        last_cutoff = img_resolution / 2
        last_stopband = last_cutoff * last_stopband_rel
        exponents = np.minimum(
            np.arange(num_layers + 1) / (num_layers - num_critical), 1)
        cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
        stopbands = first_stopband * (last_stopband / first_stopband) ** exponents
        sampling_rates = np.exp2(np.ceil(np.log2(
            np.minimum(stopbands * 2, img_resolution))))
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = sampling_rates + margin_size * 2
        sizes[-2:] = img_resolution
        channels = np.rint(np.minimum((channel_base / 2) / cutoffs, channel_max))
        channels[-1] = img_channels

        self.input = SynthesisInput(
            w_dim=w_dim, channels=int(channels[0]), size=int(sizes[0]),
            sampling_rate=sampling_rates[0], bandwidth=cutoffs[0])
        self.layers = []
        self.layer_names = []  # reference-compatible L{idx}_{size}_{ch} names
        for idx in range(num_layers + 1):
            prev = max(idx - 1, 0)
            self.layer_names.append(
                f"L{idx}_{int(sizes[idx])}_{int(channels[idx])}")
            self.layers.append(SynthesisLayerS3(
                w_dim=w_dim, is_torgb=idx == num_layers,
                is_critically_sampled=idx >= num_layers - num_critical,
                use_fp16=sampling_rates[idx] * (2 ** num_fp16_res) > img_resolution,
                in_channels=int(channels[prev]), out_channels=int(channels[idx]),
                in_size=int(sizes[prev]), out_size=int(sizes[idx]),
                in_sampling_rate=int(sampling_rates[prev]),
                out_sampling_rate=int(sampling_rates[idx]),
                in_cutoff=cutoffs[prev], out_cutoff=cutoffs[idx],
                in_half_width=half_widths[prev],
                out_half_width=half_widths[idx], **layer_kwargs))

    def init(self, key):
        keys = jax.random.split(key, len(self.layers) + 1)
        params = {"input": self.input.init(keys[0])}
        for name, layer, k in zip(self.layer_names, self.layers, keys[1:]):
            params[name] = layer.init(k)
        return params

    def __call__(self, params, ws, force_fp32=False, **unused_kwargs):
        assert ws.shape[1] == self.num_ws
        ws = ws.astype(jnp.float32)
        x = self.input(params["input"], ws[:, 0])
        for i, (name, layer) in enumerate(zip(self.layer_names, self.layers)):
            x = layer(params[name], x, ws[:, i + 1], force_fp32=force_fp32)
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


class GeneratorS3:
    """Alias-free generator (ref `:492-517`)."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 mapping_kwargs=None, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.synthesis = SynthesisNetworkS3(w_dim=w_dim,
                                            img_resolution=img_resolution,
                                            img_channels=img_channels,
                                            **synthesis_kwargs)
        self.num_ws = self.synthesis.num_ws
        self.mapping = MappingNetwork(z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
                                      num_ws=self.num_ws,
                                      **(mapping_kwargs or {}))

    def init(self, key):
        k0, k1 = jax.random.split(key)
        return {"mapping": self.mapping.init(k0),
                "synthesis": self.synthesis.init(k1)}

    def __call__(self, params, z, c, truncation_psi=1.0, truncation_cutoff=None,
                 **synthesis_kwargs):
        ws = self.mapping(params["mapping"], z, c,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params["synthesis"], ws, **synthesis_kwargs)
