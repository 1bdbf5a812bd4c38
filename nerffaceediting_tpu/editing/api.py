"""The editing API: encode → manipulate planes/statistics → decode.

Rebuild of ref utils.py:146-199 (the demo.ipynb surface). Appearance editing
swaps plane statistics; geometry editing replaces/optimizes the normalized
planes. `decode` is a thin alias of models.triplane.render_planes — planes
are *inputs*, which makes the whole edit→frame path one fused device
program (the BASELINE north-star requirement).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GeneratorConfig
from ..models import triplane
from ..models.triplane import (  # re-exported: standalone copies in ref utils.py:146-158
    compute_mean_var,
    denormalize_plane,
    normalize_plane,
)
from ..render.cameras import camera_params, fov_to_intrinsics, lookat_pose


def encode(params, ws, cfg: GeneratorConfig, *, noise_mode: str = "const",
           rng: Optional[jax.Array] = None) -> jax.Array:
    """ws → tri-planes (B, 3, 32, 256, 256) (ref: utils.py:160-163)."""
    planes = triplane.synthesize_planes(params, ws, cfg, noise_mode=noise_mode, rng=rng)
    return triplane.split_planes(planes, cfg)


def decode(params, ws, cam, norm_planes, denorm_planes, cfg: GeneratorConfig,
           **kwargs) -> Dict[str, jax.Array]:
    """Planes + camera → {image, image_raw, image_depth, image_seg}
    (ref: utils.py:165-199)."""
    return triplane.render_planes(params, norm_planes, denorm_planes, cam, cfg,
                                  ws_sr=ws, **kwargs)


def swap_appearance(planes_src: jax.Array, planes_style: jax.Array):
    """Appearance transfer: geometry of `planes_src` wearing the tri-plane
    statistics of `planes_style` (SURVEY §3.3 appearance edit).

    Both (B, 3, 32, H, W); returns (norm_planes_src, denorm_with_style_stats).
    """
    norm_src, _, _ = normalize_plane(planes_src)
    _, mean_sty, var_sty = normalize_plane(planes_style)
    return norm_src, denormalize_plane(norm_src, mean_sty, var_sty)


def swap_appearance_stats(planes_src: jax.Array, planes_style: jax.Array):
    """Like swap_appearance, but returns (norm_planes, (mean, var)) with the
    stats shaped (B, 3, C) for the renderer's σ/μ-rematerialization fast path
    (sample ONLY the normalized planes — half the tri-plane sampling work).
    Pass to decode as plane_stats with denorm_planes=None."""
    B, n_planes, C = planes_src.shape[:3]
    norm_src, _, _ = normalize_plane(planes_src)
    _, mean_sty, var_sty = normalize_plane(planes_style)
    stats = (mean_sty.reshape(B, n_planes, C), var_sty.reshape(B, n_planes, C))
    return norm_src, stats


def get_camera_samples(cfg: GeneratorConfig, fov_deg: float = 18.837):
    """3×3 pitch/yaw grid of 25-float camera labels (ref: utils.py:130-144)."""
    import numpy as np

    intrinsics = fov_to_intrinsics(fov_deg)
    pivot = cfg.rendering.avg_camera_pivot
    radius = cfg.rendering.avg_camera_radius
    angles = [5 * np.pi / 12, 6 * np.pi / 12, 7 * np.pi / 12]
    cams = []
    for pitch in angles:
        for yaw in angles:
            pose = lookat_pose(pitch, yaw, pivot, radius=radius)
            cams.append(camera_params(pose, intrinsics))
    return cams
