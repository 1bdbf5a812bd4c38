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


def plane_canvas(norm_planes: jax.Array):
    """Prebuild the windowed-kernel canvas for an identity's (normalized)
    planes — build ONCE per editing session / trajectory and pass to
    `decode(..., canvas=)`: XLA does not hoist the ~5 ms canvas build out
    of a frame scan (measured, scripts/bench_serving_split.py)."""
    from ..ops.triplane_kernel import build_plane_canvas

    N, n_p, C, H, W = norm_planes.shape
    hwc = norm_planes.reshape(N * n_p, C, H, W).transpose(0, 2, 3, 1)
    return build_plane_canvas(hwc)


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


def render_video(params, ws, norm_planes, cfg: GeneratorConfig,
                 plane_stats: Tuple[jax.Array, jax.Array],
                 out_path: str, num_frames: int = 120, fps: int = 60,
                 yaw_amp: float = 0.35, pitch_amp: float = 0.25,
                 fov_deg: float = 18.837, mesh=None) -> None:
    """Orbit video from edited planes (ref utils.py:32-88 render_video):
    the whole trajectory renders as ONE fused device program
    (lax.scan over cameras), then streams to mp4/npz on the host.

    mesh: optional jax.sharding.Mesh — frames shard over its 'data' axis
    (parallel.serving.orbit_sharded), scaling orbit rendering linearly
    across a slice. num_frames must divide by the axis size."""
    import numpy as np

    from ..apps.gen_samples import to_uint8_image
    from ..apps.gen_videos import _write_video

    pivot = cfg.rendering.avg_camera_pivot
    radius = cfg.rendering.avg_camera_radius
    intr = fov_to_intrinsics(fov_deg)
    cams = jnp.concatenate([
        camera_params(
            lookat_pose(
                np.pi / 2 + yaw_amp * np.sin(2 * np.pi * i / num_frames),
                np.pi / 2 - 0.05 + pitch_amp * np.cos(2 * np.pi * i / num_frames),
                pivot, radius=radius),
            intr)
        for i in range(num_frames)
    ])

    if mesh is not None:
        from ..parallel.serving import orbit_sharded

        # 1 frame/scan-body: the r4 measured optimum AND the compile-safe
        # choice — >=2 fused-decode frames per body SIGABRT the current
        # libtpu's custom-call windowing with the pull-back merge
        # (runs/hw_r4 bisect matrix, docs/PERF.md r4).
        group = 1

        @jax.jit
        def orbit(params, ws, norm_planes, stats, cams):
            out = orbit_sharded(params, ws, cams, norm_planes, None, cfg,
                                mesh, plane_stats=stats, scan_group=group)
            return out["image"]
    else:
        @jax.jit
        def orbit(params, ws, norm_planes, stats, cams):
            canvas = plane_canvas(norm_planes)  # once per orbit, not per frame

            def frame(_, cam):
                out = decode(params, ws, cam[None], norm_planes, None, cfg,
                             plane_stats=stats, canvas=canvas)
                return None, out["image"][0]

            _, frames = jax.lax.scan(frame, None, cams)
            return frames

    frames = orbit(params, ws, norm_planes, plane_stats, cams)
    arrs = [to_uint8_image(frames[i : i + 1])[0] for i in range(num_frames)]
    _write_video(out_path, arrs, fps)


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


def decode_frames(params, ws, cams, norm_planes, denorm_planes,
                  cfg: GeneratorConfig, *,
                  plane_stats: Optional[Tuple[jax.Array, jax.Array]] = None,
                  neural_rendering_resolution: Optional[int] = None,
                  coherent: Optional[bool] = None,
                  fused_decoder: bool = True,
                  canvas: Optional[jax.Array] = None,
                  sr_dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Render MANY cameras against ONE identity's planes as a single fused
    device program — the serving-path orbit renderer (bench.py workload;
    ref gen_videos.py renders the same trajectory frame by frame).

    All F frames' rays flatten into the ray axis of ONE render (planes are
    NOT replicated; the windowed kernel tiles stay frame-coherent via
    ray_grid=(F·res, res)), then frames split back for a batched SR pass.
    Removes per-frame dispatch overhead and feeds every stage F× larger
    batches. The fused sampling+decode kernel takes the same flattened
    shape — its point-axis chunking (2^18 cap) keeps each Pallas program
    compiler-safe, and crucially this is ONE fused-decode call per program:
    F *separate* per-frame calls SIGABRT the current libtpu for F ≥ 2
    with the pull-back merge (llo::CouldLtS32 bisect, runs/hw_r4/,
    docs/PERF.md r4). cams: (F, 25); ws: (1, num_ws, w_dim);
    canvas: optional prebuilt window canvas (pass it when calling from a
    scan body — XLA does not hoist the build out of the scan). Returns
    per-frame {image (F,3,512,512), image_raw, image_seg, image_depth}.
    """
    from ..models.superresolution import superresolution
    from ..models.triplane import _decoder_fn
    from ..render.ray_sampler import sample_rays
    from ..render.renderer import render_rays

    F = cams.shape[0]
    res = neural_rendering_resolution or cfg.neural_rendering_resolution
    cam2world = cams[:, :16].reshape(-1, 4, 4)
    intrinsics = cams[:, 16:25].reshape(-1, 3, 3)
    ray_o, ray_d = sample_rays(cam2world, intrinsics, res)  # (F, R, 3)
    R = ray_o.shape[1]
    feats, segs, depths, _ = render_rays(
        _decoder_fn(cfg), params["decoder"], norm_planes, denorm_planes,
        ray_o.reshape(1, F * R, 3), ray_d.reshape(1, F * R, 3),
        cfg.rendering, rng=None, plane_stats=plane_stats,
        ray_grid=(F * res, res), coherent=coherent,
        fused_decoder=fused_decoder, canvas=canvas)

    seg_image = segs.reshape(F, res, res, -1).transpose(0, 3, 1, 2)
    depth_image = depths.reshape(F, res, res, 1).transpose(0, 3, 1, 2)
    ws_sr = jnp.broadcast_to(ws, (F,) + ws.shape[1:])
    feature_image = feats.reshape(F, res, res, -1).transpose(0, 3, 1, 2)
    rgb_image = feature_image[:, :3]
    sr_image = superresolution(
        params["superresolution"], rgb_image, feature_image, ws_sr,
        variant=cfg.rendering.superresolution_module,
        sr_antialias=cfg.rendering.sr_antialias,
        noise_mode=cfg.rendering.superresolution_noise_mode,
        rng=None, dtype=sr_dtype)
    return {"image": sr_image, "image_seg": seg_image,
            "image_raw": rgb_image, "image_depth": depth_image}
