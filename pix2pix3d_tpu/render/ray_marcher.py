"""Volume-rendering quadrature (ref
`training/volumetric_rendering/ray_marcher.py:20-63`, MipNeRF-style midpoint
rule with softplus(x-1) density activation)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def march_rays(colors, densities, depths, rendering_options):
    """Composite samples along rays.

    Args:
        colors: `[N, R, S, C]`.
        densities: `[N, R, S, 1]`.
        depths: `[N, R, S, 1]`, sorted ascending along S.
        rendering_options: dict; uses 'clamp_mode' ('softplus') and
            optional 'white_back'.

    Returns:
        (composite `[N, R, C]`, depth `[N, R, 1]`, weights `[N, R, S-1, 1]`).
    """
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2

    assert rendering_options["clamp_mode"] == "softplus", \
        "only clamp_mode='softplus' is supported (matches the reference)"
    # activation bias of -1 makes things initialize better (ref :33)
    densities_mid = jax.nn.softplus(densities_mid - 1)

    density_delta = densities_mid * deltas
    alpha = 1 - jnp.exp(-density_delta)

    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], axis=-2)
    transmittance = jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]
    weights = alpha * transmittance

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total

    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if rendering_options.get("white_back", False):
        composite_rgb = composite_rgb + 1 - weight_total

    composite_rgb = composite_rgb * 2 - 1  # scale to (-1, 1)
    return composite_rgb, composite_depth, weights
