"""Render orbit videos with latent interpolation.

Rebuild of ref gen_videos.py:74-205: cubic keyframe interpolation in W,
sinusoidal camera orbit (fixed intrinsics f=4.2647, ref :95), grid mp4
output; `sampling_multiplier` doubles the depth resolutions for quality
(ref :307-308).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GeneratorConfig, ffhq_generator_config
from ..models import triplane
from ..render.cameras import camera_params, lookat_pose

VIDEO_FOCAL = 4.2647  # normalized focal length (ref gen_videos.py:95)


def video_intrinsics() -> jax.Array:
    return jnp.asarray(
        [[VIDEO_FOCAL, 0, 0.5], [0, VIDEO_FOCAL, 0.5], [0, 0, 1]], jnp.float32)


def cubic_interp_ws(ws_keyframes: np.ndarray, num_frames_per_key: int) -> np.ndarray:
    """Cyclic cubic interpolation over keyframe ws (ref gen_videos.py:102-111
    uses scipy CubicSpline with periodic boundary)."""
    from scipy import interpolate

    K = ws_keyframes.shape[0]
    # periodic: repeat first keyframe at the end
    x = np.arange(K + 1)
    y = np.concatenate([ws_keyframes, ws_keyframes[:1]], axis=0)
    spline = interpolate.CubicSpline(x, y, axis=0, bc_type="periodic")
    t = np.linspace(0, K, K * num_frames_per_key, endpoint=False)
    return spline(t).astype(np.float32)


def orbit_camera(frame_idx: int, num_frames: int, pivot, radius: float,
                 yaw_amp: float = 0.35, pitch_amp: float = 0.25) -> jax.Array:
    """Sinusoidal orbit (ref gen_videos.py:126-133)."""
    phase = 2 * np.pi * frame_idx / num_frames
    return lookat_pose(
        np.pi / 2 + yaw_amp * np.sin(phase),
        np.pi / 2 - 0.05 + pitch_amp * np.cos(phase),
        pivot, radius=radius,
    )


def render_video(params, cfg: GeneratorConfig, seeds: List[int], out_path: str,
                 num_keyframes: Optional[int] = None, frames_per_key: int = 120,
                 truncation_psi: float = 0.7, truncation_cutoff: int = 14,
                 sampling_multiplier: float = 2.0, fps: int = 60) -> None:
    """z keyframes → interpolated W trajectory → orbit frames → mp4/npz."""
    # quality mode: double the depth resolutions (ref gen_videos.py:307-308)
    rendering = dataclasses.replace(
        cfg.rendering,
        depth_resolution=int(cfg.rendering.depth_resolution * sampling_multiplier),
        depth_resolution_importance=int(
            cfg.rendering.depth_resolution_importance * sampling_multiplier),
    )
    cfg = dataclasses.replace(cfg, rendering=rendering)

    pivot = cfg.rendering.avg_camera_pivot
    radius = cfg.rendering.avg_camera_radius
    intr = video_intrinsics()

    cond_pose = lookat_pose(np.pi / 2, np.pi / 2, pivot, radius=radius)
    c_cond = camera_params(cond_pose, intr)

    ws_keys = []
    for seed in seeds:
        z = jax.random.normal(jax.random.key(seed), (1, cfg.z_dim))
        ws = triplane.mapping(params, z, c_cond, cfg, truncation_psi=truncation_psi,
                              truncation_cutoff=truncation_cutoff)
        ws_keys.append(np.asarray(ws)[0])
    ws_traj = cubic_interp_ws(np.stack(ws_keys), frames_per_key)

    @jax.jit
    def render_frame(params, ws, c_cam):
        return triplane.synthesis(params, ws, c_cam, cfg)["image"]

    from .gen_samples import to_uint8_image

    frames = []
    n = ws_traj.shape[0]
    for i in range(n):
        cam = camera_params(orbit_camera(i, frames_per_key, pivot, radius), intr)
        img = render_frame(params, jnp.asarray(ws_traj[i : i + 1]), cam)
        frames.append(to_uint8_image(img)[0])

    _write_video(out_path, frames, fps)


def _write_video(path: str, frames: List[np.ndarray], fps: int) -> None:
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, quality=8)
    except Exception:
        npz = os.path.splitext(path)[0] + ".npz"
        np.savez_compressed(npz, frames=np.stack(frames), fps=fps)
        print(f"imageio unavailable; wrote raw frames to {npz}")


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--seeds", default="0,1", help="keyframe seeds")
    p.add_argument("--output", default="out/video.mp4")
    p.add_argument("--frames-per-key", type=int, default=120)
    p.add_argument("--trunc", type=float, default=0.7)
    p.add_argument("--sampling-multiplier", type=float, default=2.0)
    args = p.parse_args(argv)

    cfg = ffhq_generator_config()
    if args.checkpoint is None:
        params = triplane.init_generator(jax.random.key(0), cfg)
    else:
        from .gen_samples import main as _  # reuse loader path
        from ..io.checkpoint import load_checkpoint

        params = load_checkpoint(args.checkpoint)
        if "g_ema" in params:
            params = params["g_ema"]

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    seeds = [int(s) for s in args.seeds.split(",") if s]
    render_video(params, cfg, seeds, args.output,
                 frames_per_key=args.frames_per_key, truncation_psi=args.trunc,
                 sampling_multiplier=args.sampling_multiplier)


if __name__ == "__main__":
    main()
