"""MipNeRF-style ray marching (alpha compositing over depth samples).

Rebuild of ref training/volumetric_rendering/ray_marcher.py:20-107. The seg
variant additionally composites semantic-mask logits with the same weights —
this is what makes the rendered segmentation 3D-consistent.

TPU lowering note: the transmittance cumprod is computed in log space as an
exclusive cumsum (T = exp(cumsum(log(1−α+1e-10)) − log(...))): XLA lowers
jnp.cumprod on this layout to a sequential while loop (~1.4 ms/frame at the
serving shapes) but lowers cumsum to an efficient parallel prefix (at the
measurement noise floor; both variants + a triangular-matmul alternative
measured in scripts/bench_march_variants.py). Agreement with the cumprod
form is ≤ 1.2e-7 maxabs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _composite(colors, densities, depths, segs=None, *, clamp_mode: str = "softplus",
               white_back: bool = False):
    """colors (B,R,S,C), densities (B,R,S,1), depths (B,R,S,1),
    segs optional (B,R,S,K). Midpoint quadrature (ref: ray_marcher.py:26-29)."""
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2
    segs_mid = None if segs is None else (segs[:, :, :-1] + segs[:, :, 1:]) / 2

    assert clamp_mode == "softplus", "only clamp_mode='softplus' is supported (ref ray_marcher.py:32-35)"
    # Activation bias of −1 improves initialization (ref: ray_marcher.py:33).
    densities_mid = jax.nn.softplus(densities_mid - 1)

    density_delta = densities_mid * deltas
    alpha = 1 - jnp.exp(-density_delta)

    # Transmittance T[s] = Π_{j<s} (1−α_j+1e-10) as exp of an EXCLUSIVE
    # log-cumsum (see module docstring).
    logs = jnp.log(1.0 - alpha + 1e-10)[..., 0]          # (B, R, S-1)
    csum = jnp.cumsum(logs, axis=-1) - logs              # exclusive
    weights = alpha * jnp.exp(csum)[..., None]

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total

    # NaN (zero-weight rays) → +inf, then clamp into the global depth range
    # (ref: ray_marcher.py:49-50).
    composite_depth = jnp.where(jnp.isnan(composite_depth), jnp.inf, composite_depth)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    composite_seg = None if segs_mid is None else jnp.sum(weights * segs_mid, axis=-2)

    if white_back:
        composite_rgb = composite_rgb + 1 - weight_total
    composite_rgb = composite_rgb * 2 - 1  # scale to (-1, 1)

    return composite_rgb, composite_seg, composite_depth, weights


def march_weights(densities, depths, *, clamp_mode: str = "softplus") -> jax.Array:
    """Marcher weights ONLY — the importance-sampling driver.

    The coarse pass of the hierarchical render needs nothing but the
    per-segment weights α·T to draw fine depths (ref renderer.py:320-323
    discards the coarse composite when N_importance > 0); compositing
    rgb/seg/depth there wastes the payload contractions. Identical weights
    to `_composite` (same softplus(σ−1), midpoint quadrature, exclusive
    log-cumsum transmittance). densities/depths (B,R,S,1) → (B,R,S-1,1)."""
    assert clamp_mode == "softplus"
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    densities_mid = jax.nn.softplus(densities_mid - 1)
    alpha = 1 - jnp.exp(-densities_mid * deltas)
    logs = jnp.log(1.0 - alpha + 1e-10)[..., 0]
    csum = jnp.cumsum(logs, axis=-1) - logs              # exclusive
    return alpha * jnp.exp(csum)[..., None]


def mip_ray_marcher(colors, densities, depths, *, clamp_mode: str = "softplus",
                    white_back: bool = False):
    """ref MipRayMarcher2 (ray_marcher.py:20-63)."""
    rgb, _, depth, weights = _composite(
        colors, densities, depths, None, clamp_mode=clamp_mode, white_back=white_back
    )
    return rgb, depth, weights


def seg_mip_ray_marcher(colors, segs, densities, depths, *, clamp_mode: str = "softplus",
                        white_back: bool = False):
    """ref SegMipRayMarcher2 (ray_marcher.py:65-107)."""
    rgb, seg, depth, weights = _composite(
        colors, densities, depths, segs, clamp_mode=clamp_mode, white_back=white_back
    )
    return rgb, seg, depth, weights
