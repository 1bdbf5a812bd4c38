"""TriPlaneGenerator — the flagship model.

Rebuild of ref training/triplane.py:19-162 as pure functions over a pytree:

  mapping()            z, c → ws                (pose-conditioned)
  synthesize_planes()  ws → raw tri-planes      (StyleGAN2 backbone)
  plane statistics     normalize/denormalize    (appearance code)
  render_planes()      planes + camera → frame  (the fused device program)
  synthesis()          ws, c → frame            (composition of the above)

The reference's `_last_planes` cache (triplane.py:55,88-110) is replaced by
the explicit split: callers keep the planes array and re-enter at
`render_planes`, which is also exactly the editing API's `decode`
(ref utils.py:165-199).

Appearance-statistics overrides: `planes_stats=(mean, var)` re-denormalizes
the planes with foreign statistics; `stats_from_index=i` uses sample i's
statistics for the whole batch (ref triplane.py:98-103 int special case,
used by the histogram loss at loss.py:284).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GeneratorConfig
from ..ops import setup_filter
from ..render.ray_sampler import sample_rays
from ..render.renderer import render_rays, run_model
from .decoders import (
    disentangled_osg_decoder,
    init_disentangled_osg_decoder,
    init_segmentation_osg_decoder,
    segmentation_osg_decoder,
)
from .stylegan2 import (
    init_mapping,
    init_synthesis_network,
    mapping_apply,
    num_synthesis_ws,
    synthesis_network,
)
from .superresolution import init_superresolution, superresolution


# ---------------------------------------------------------------------------
# Plane statistics — the appearance code (ref: triplane.py:56-68)

def compute_mean_var(planes: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(sample, channel) spatial mean and std of the tri-plane. The
    reference names the std 'var' (it is sqrt(var)); we keep the names for
    checkpoint/API parity. planes: (..., C, H, W) → two (..., C, 1, 1)."""
    mean = jnp.mean(planes, axis=(-1, -2), keepdims=True)
    var = jnp.sqrt(jnp.var(planes, axis=(-1, -2), keepdims=True))
    return mean, var


def normalize_plane(planes: jax.Array):
    mean, var = compute_mean_var(planes)
    return (planes - mean) / (var + 1e-8), mean, var


def denormalize_plane(planes: jax.Array, mean: jax.Array, var: jax.Array):
    return planes * var + mean


# ---------------------------------------------------------------------------
# Init

def init_generator(key, cfg: GeneratorConfig) -> Dict:
    k_map, k_syn, k_dec, k_sr = jax.random.split(key, 4)
    num_ws = num_synthesis_ws(cfg.backbone_resolution)
    params = {
        "mapping": init_mapping(
            k_map, cfg.z_dim, cfg.c_dim, cfg.w_dim, num_ws,
            num_layers=cfg.mapping_layers, lr_multiplier=cfg.mapping_lr_multiplier,
        ),
        "synthesis": init_synthesis_network(
            k_syn, cfg.w_dim, cfg.backbone_resolution, cfg.backbone_img_channels,
            channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        ),
        "superresolution": init_superresolution(
            k_sr, cfg.rendering.superresolution_module, channels=cfg.plane_channels,
            w_dim=cfg.w_dim,
        ),
    }
    if not cfg.disable_alignment:
        params["decoder"] = init_disentangled_osg_decoder(
            k_dec, cfg.plane_channels, cfg.rendering.decoder_output_dim,
            cfg.rendering.decoder_seg_dim,
        )
    else:
        params["decoder"] = init_segmentation_osg_decoder(
            k_dec, cfg.plane_channels, cfg.rendering.decoder_output_dim,
            cfg.rendering.decoder_seg_dim,
        )
    return params


# ---------------------------------------------------------------------------
# Forward pieces

def mapping(params, z, c, cfg: GeneratorConfig, *, truncation_psi: float = 1.0,
            truncation_cutoff: Optional[int] = None):
    """Pose-conditioned mapping (ref: triplane.py:69-72): zero the label if
    c_gen_conditioning_zero, scale by c_scale."""
    if cfg.rendering.c_gen_conditioning_zero:
        c = jnp.zeros_like(c)
    c = c * cfg.rendering.c_scale
    return mapping_apply(
        params["mapping"], z, c, num_ws=num_synthesis_ws(cfg.backbone_resolution),
        num_layers=cfg.mapping_layers, lr_multiplier=cfg.mapping_lr_multiplier,
        truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
    )


def synthesize_planes(params, ws, cfg: GeneratorConfig, *, noise_mode: str = "const",
                      rng: Optional[jax.Array] = None, dtype=jnp.float32):
    """ws → raw backbone output (B, 96, 256, 256) (ref: triplane.py:91)."""
    return synthesis_network(
        params["synthesis"], ws, img_resolution=cfg.backbone_resolution,
        noise_mode=noise_mode, rng=rng, dtype=dtype,
    )


def _decoder_fn(cfg: GeneratorConfig):
    lr_mul = cfg.rendering.decoder_lr_mul
    if not cfg.disable_alignment:
        return lambda p, xn, xd: disentangled_osg_decoder(p, xn, xd, lr_multiplier=lr_mul)
    return lambda p, xn, xd: segmentation_osg_decoder(p, xn, xd, lr_multiplier=lr_mul)


def split_planes(planes: jax.Array, cfg: GeneratorConfig) -> jax.Array:
    """(B, 96, H, W) → (B, 3, 32, H, W) (ref: triplane.py:114-115)."""
    B, C, H, W = planes.shape
    return planes.reshape(B, cfg.num_planes, cfg.plane_channels, H, W)


def render_planes(params, norm_planes, denorm_planes, c, cfg: GeneratorConfig, *,
                  ws_sr: Optional[jax.Array] = None,
                  neural_rendering_resolution: Optional[int] = None,
                  noise_mode: str = "const",
                  rng: Optional[jax.Array] = None,
                  plane_stats: Optional[Tuple[jax.Array, jax.Array]] = None,
                  coherent: Optional[bool] = None,
                  fused_decoder: bool = False,
                  canvas: Optional[jax.Array] = None,
                  sr_dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Planes + camera → frame dict. This is the editing decode()
    (ref utils.py:165-199) and the second half of synthesis().

    norm_planes/denorm_planes: (B, 3, 32, H, W); c: (B, 25) camera params
    (16 cam2world + 9 intrinsics); ws_sr: ws for the SR module (B, ≥1, 512).

    canvas: prebuilt window canvas (ops.triplane_kernel.build_plane_canvas)
    for the Pallas fast path. Orbit renderers MUST pass it: XLA does not
    hoist the ~5 ms/frame canvas build out of a frame scan (measured,
    scripts/bench_serving_split.py r3).
    """
    res = neural_rendering_resolution or cfg.neural_rendering_resolution
    cam2world = c[:, :16].reshape(-1, 4, 4)
    intrinsics = c[:, 16:25].reshape(-1, 3, 3)
    ray_origins, ray_dirs = sample_rays(cam2world, intrinsics, res)

    rng_render, rng_sr = jax.random.split(rng) if rng is not None else (None, None)
    feats, segs, depths, _ = render_rays(
        _decoder_fn(cfg), params["decoder"], norm_planes, denorm_planes,
        ray_origins, ray_dirs, cfg.rendering, rng=rng_render,
        plane_stats=plane_stats, coherent=coherent,
        fused_decoder=fused_decoder, canvas=canvas,
    )

    B = feats.shape[0]
    seg_image = segs.transpose(0, 2, 1).reshape(B, -1, res, res)
    depth_image = depths.transpose(0, 2, 1).reshape(B, 1, res, res)
    # NHWC (channels_last) SR path (ops/modconv.py, oracle-tested in
    # tests/test_ops.py::TestChannelsLast): the render feature grid is
    # channel-minor already, so NHWC skips the NCHW relayout on entry and
    # every in-module interleave copy; only the 3-channel outputs transpose
    # back. r3 measured it fps-neutral and Mosaic-destabilizing in GROUP=4
    # multi-frame scan programs — both facts predate the r4 program (group
    # 1, bf16 SR, pull-back merge), so it is re-A/B-able via NFE_SR_NHWC.
    if os.environ.get("NFE_SR_NHWC", "0") == "1":
        feature_image_cl = feats.reshape(B, res, res, -1)
        rgb_cl = feature_image_cl[..., :3]
        sr_cl = superresolution(
            params["superresolution"], rgb_cl, feature_image_cl, ws_sr,
            variant=cfg.rendering.superresolution_module,
            sr_antialias=cfg.rendering.sr_antialias,
            noise_mode=cfg.rendering.superresolution_noise_mode,
            rng=rng_sr, dtype=sr_dtype, channels_last=True,
        )
        sr_image = sr_cl.transpose(0, 3, 1, 2)
        rgb_image = rgb_cl.transpose(0, 3, 1, 2)
    else:
        feature_image = feats.transpose(0, 2, 1).reshape(B, -1, res, res)
        rgb_image = feature_image[:, :3]
        sr_image = superresolution(
            params["superresolution"], rgb_image, feature_image, ws_sr,
            variant=cfg.rendering.superresolution_module,
            sr_antialias=cfg.rendering.sr_antialias,
            noise_mode=cfg.rendering.superresolution_noise_mode,
            rng=rng_sr, dtype=sr_dtype,
        )
    return {
        "image": sr_image,
        "image_seg": seg_image,
        "image_raw": rgb_image,
        "image_depth": depth_image,
    }


def synthesis(params, ws, c, cfg: GeneratorConfig, *,
              neural_rendering_resolution: Optional[int] = None,
              planes_stats: Optional[Tuple[jax.Array, jax.Array]] = None,
              stats_from_index: Optional[int] = None,
              noise_mode: str = "const",
              rng: Optional[jax.Array] = None,
              sr_dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Full ws → frame forward (ref: triplane.py:74-138)."""
    rng_bb, rng_render = jax.random.split(rng) if rng is not None else (None, None)
    planes = synthesize_planes(params, ws, cfg, noise_mode=noise_mode, rng=rng_bb)

    if not cfg.disable_disentangle:
        norm, mean, var = normalize_plane(planes)
        # Denormalization is affine per channel, so only the statistics are
        # passed down — the renderer rematerializes denormalized SAMPLES
        # (σ·s + μ·wsum), halving the tri-plane sampling work (SURVEY §7).
        if stats_from_index is not None:
            # Appearance-uniform batch: everyone gets sample i's statistics
            # (ref triplane.py:100-101, histogram loss loss.py:284).
            d_mean = jnp.broadcast_to(mean[stats_from_index][None], mean.shape)
            d_var = jnp.broadcast_to(var[stats_from_index][None], var.shape)
        elif planes_stats is not None:
            d_mean = jnp.broadcast_to(planes_stats[0], mean.shape)
            d_var = jnp.broadcast_to(planes_stats[1], var.shape)
        else:
            # default: denorm == the raw planes == norm·(var+eps) + mean
            # (normalize_plane divides by var+1e-8) — keep it bit-exact
            d_mean, d_var = mean, var + 1e-8
        norm_planes = split_planes(norm, cfg)
        denorm_planes = None
        B = planes.shape[0]
        stats = (d_mean.reshape(B, cfg.num_planes, cfg.plane_channels),
                 d_var.reshape(B, cfg.num_planes, cfg.plane_channels))
    else:
        mean = var = None
        stats = None
        norm_planes = denorm_planes = split_planes(planes, cfg)

    out = render_planes(
        params, norm_planes, denorm_planes, c, cfg, ws_sr=ws,
        neural_rendering_resolution=neural_rendering_resolution,
        noise_mode=noise_mode, rng=rng_render, plane_stats=stats,
        sr_dtype=sr_dtype,
    )
    out["plane_mean"] = mean
    out["plane_var"] = var
    return out


def sample_points(params, coordinates, ws, cfg: GeneratorConfig, *,
                  noise_mode: str = "const",
                  rng: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Evaluate σ/rgb/seg at arbitrary 3-D coordinates — shape extraction
    and density regularization (ref: triplane.py:150-157 sample_mixed)."""
    planes = synthesize_planes(params, ws, cfg, noise_mode=noise_mode, rng=rng)
    if not cfg.disable_disentangle:
        norm, mean, var = normalize_plane(planes)
        norm_planes = split_planes(norm, cfg)
        B = planes.shape[0]
        stats = (mean.reshape(B, cfg.num_planes, cfg.plane_channels),
                 (var + 1e-8).reshape(B, cfg.num_planes, cfg.plane_channels))
        return run_model(_decoder_fn(cfg), params["decoder"], norm_planes, None,
                         coordinates, cfg.rendering, plane_stats=stats)
    norm_planes = denorm_planes = split_planes(planes, cfg)
    return run_model(_decoder_fn(cfg), params["decoder"], norm_planes, denorm_planes,
                     coordinates, cfg.rendering)


def sample_points_z(params, coordinates, z, c, cfg: GeneratorConfig, *,
                    truncation_psi: float = 1.0,
                    truncation_cutoff: Optional[int] = None,
                    noise_mode: str = "const",
                    rng: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """z-conditioned point evaluation (ref triplane.py:140-148 `sample`);
    `sample_points` is the ws-conditioned `sample_mixed` equivalent."""
    ws = mapping(params, z, c, cfg, truncation_psi=truncation_psi,
                 truncation_cutoff=truncation_cutoff)
    return sample_points(params, coordinates, ws, cfg, noise_mode=noise_mode,
                         rng=rng)


def generate(params, z, c, cfg: GeneratorConfig, *, truncation_psi: float = 1.0,
             truncation_cutoff: Optional[int] = None,
             neural_rendering_resolution: Optional[int] = None,
             noise_mode: str = "const",
             rng: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """z, c → frame (ref: triplane.py:159-162 forward)."""
    ws = mapping(params, z, c, cfg, truncation_psi=truncation_psi,
                 truncation_cutoff=truncation_cutoff)
    return synthesis(params, ws, c, cfg,
                     neural_rendering_resolution=neural_rendering_resolution,
                     noise_mode=noise_mode, rng=rng)
