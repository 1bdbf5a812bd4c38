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
    if K == 1:  # single keyframe → constant trajectory
        return np.repeat(ws_keyframes, num_frames_per_key, axis=0).astype(np.float32)
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
                 sampling_multiplier: float = 2.0, fps: int = 60,
                 grid_dims: tuple = (1, 1), nrr: Optional[int] = None,
                 gen_shapes: bool = False, shape_resolution: int = 128,
                 shape_format: str = "ply") -> None:
    """z keyframes → interpolated W trajectory → orbit frames → mp4/npz.

    grid_dims (W, H): seeds are distributed over W×H grid cells, each cell
    interpolating its own keyframe subsequence; frames tile the cells
    (ref gen_videos.py:74-86,116,198 layout_grid).
    nrr: neural rendering resolution override (ref --nrr, gen_videos.py:309).
    gen_shapes: per-frame marching-cubes .ply (or raw .npy σ grid) of cell 0
    plus a <out>_trajectory.npy camera dump (ref gen_videos.py:158-205).
    """
    # quality mode: double the depth resolutions (ref gen_videos.py:307-308)
    rendering = dataclasses.replace(
        cfg.rendering,
        depth_resolution=int(cfg.rendering.depth_resolution * sampling_multiplier),
        depth_resolution_importance=int(
            cfg.rendering.depth_resolution_importance * sampling_multiplier),
    )
    cfg = dataclasses.replace(cfg, rendering=rendering)

    grid_w, grid_h = grid_dims
    n_cells = grid_w * grid_h
    if num_keyframes is None:
        if len(seeds) % n_cells != 0:
            raise ValueError("number of seeds must be divisible by grid W*H")
        num_keyframes = len(seeds) // n_cells
    all_seeds = [seeds[i % len(seeds)] for i in range(num_keyframes * n_cells)]

    pivot = cfg.rendering.avg_camera_pivot
    radius = cfg.rendering.avg_camera_radius
    intr = video_intrinsics()

    cond_pose = lookat_pose(np.pi / 2, np.pi / 2, pivot, radius=radius)
    c_cond = camera_params(cond_pose, intr)

    ws_keys = []
    for seed in all_seeds:
        z = jax.random.normal(jax.random.key(seed), (1, cfg.z_dim))
        ws = triplane.mapping(params, z, c_cond, cfg, truncation_psi=truncation_psi,
                              truncation_cutoff=truncation_cutoff)
        ws_keys.append(np.asarray(ws)[0])
    ws_keys = np.stack(ws_keys).reshape(n_cells, num_keyframes, *ws_keys[0].shape)
    # per-cell cyclic interpolation over that cell's keyframes
    cell_trajs = [cubic_interp_ws(ws_keys[cell], frames_per_key)
                  for cell in range(n_cells)]

    @jax.jit
    def render_frame(params, ws, c_cam):
        return triplane.synthesis(params, ws, c_cam, cfg,
                                  neural_rendering_resolution=nrr)["image"]

    from .gen_samples import to_uint8_image

    shapes_dir = None
    if gen_shapes:
        shapes_dir = os.path.splitext(out_path)[0] + "_shapes"
        os.makedirs(shapes_dir, exist_ok=True)

    frames = []
    poses = []
    n = num_keyframes * frames_per_key
    for i in range(n):
        pose = orbit_camera(i, n, pivot, radius)
        cam = camera_params(pose, intr)
        poses.append(np.asarray(pose))
        tiles = [
            to_uint8_image(render_frame(
                params, jnp.asarray(cell_trajs[cell][i:i + 1]), cam))[0]
            for cell in range(n_cells)
        ]
        H, W = tiles[0].shape[:2]
        canvas = np.zeros((grid_h * H, grid_w * W, 3), np.uint8)
        for cell, tile in enumerate(tiles):
            yi, xi = divmod(cell, grid_w)
            canvas[yi * H:(yi + 1) * H, xi * W:(xi + 1) * W] = tile
        frames.append(canvas)

        if gen_shapes:
            _export_frame_shape(params, cell_trajs[0][i:i + 1], cfg, shapes_dir,
                                i, shape_resolution, shape_format)

    _write_video(out_path, frames, fps)
    if gen_shapes:
        np.save(os.path.splitext(out_path)[0] + "_trajectory.npy",
                np.concatenate(poses, axis=0))


def _export_frame_shape(params, ws_np, cfg, outdir: str, frame_idx: int,
                        resolution: int, fmt: str) -> None:
    """σ grid → border-trimmed marching-cubes .ply (ref gen_videos.py:158-196,
    incl. the 30/38-voxel border zeroing scaled to the grid resolution)."""
    from .shape_utils import (marching_cubes_mesh, sample_density_grid,
                              save_ply, trim_borders)

    sigmas = sample_density_grid(params, jnp.asarray(ws_np), cfg,
                                 resolution=resolution)
    sigmas = trim_borders(np.asarray(sigmas))
    path = os.path.join(outdir, f"{frame_idx:04d}_shape")
    if fmt == "ply":
        try:
            verts, faces = marching_cubes_mesh(sigmas, level=10.0)
            save_ply(path + ".ply", verts, faces)
        except Exception as e:  # empty level set early in training
            np.save(path + ".npy", sigmas)
            print(f"marching cubes failed ({e}); wrote raw grid")
    else:
        np.save(path + ".npy", sigmas)


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
    p.add_argument("--grid", default="1x1",
                   help="WxH cell layout per frame (ref --grid)")
    p.add_argument("--nrr", type=int, default=None,
                   help="neural rendering resolution override (ref --nrr)")
    p.add_argument("--shapes", action="store_true",
                   help="per-frame marching-cubes shape export")
    p.add_argument("--shape-resolution", type=int, default=128)
    p.add_argument("--shape-format", default="ply", choices=["ply", "npy"])
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
    grid_w, grid_h = (int(v) for v in args.grid.lower().split("x"))
    render_video(params, cfg, seeds, args.output,
                 frames_per_key=args.frames_per_key, truncation_psi=args.trunc,
                 sampling_multiplier=args.sampling_multiplier,
                 grid_dims=(grid_w, grid_h), nrr=args.nrr,
                 gen_shapes=args.shapes,
                 shape_resolution=args.shape_resolution,
                 shape_format=args.shape_format)


if __name__ == "__main__":
    main()
