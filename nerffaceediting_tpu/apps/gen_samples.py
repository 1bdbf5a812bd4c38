"""Generate images (and optional shapes) from a trained generator.

Rebuild of ref gen_samples.py:117-222: per seed, render 3 yaw angles with a
frontal conditioning pose; optionally extract the σ-field shape to .ply.

Usage:
  python -m nerffaceediting_tpu.apps.gen_samples \
      --checkpoint ckpt_dir --seeds 0,1,2 --outdir out/ [--shapes]
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GeneratorConfig, ffhq_generator_config
from ..models import triplane
from ..render.cameras import (
    camera_params,
    fov_to_intrinsics,
    lookat_pose,
)

FOV_DEG = 18.837  # ref gen_samples.py:156


def to_uint8_image(img: jax.Array) -> np.ndarray:
    """(B, 3, H, W) in (−1, 1) → (B, H, W, 3) uint8 (ref gen_samples.py:177)."""
    arr = np.asarray(jnp.transpose(img, (0, 2, 3, 1)))
    return ((arr + 1) * 127.5).clip(0, 255).astype(np.uint8)


def save_png(path: str, arr: np.ndarray) -> None:
    try:
        import PIL.Image

        PIL.Image.fromarray(arr, "RGB").save(path)
    except ImportError:  # headless fallback: raw npy
        np.save(path + ".npy", arr)


def generate_images(params, cfg: GeneratorConfig, seeds: List[int], outdir: str,
                    truncation_psi: float = 0.7, truncation_cutoff: int = 14,
                    fov_deg: float = FOV_DEG, shapes: bool = False,
                    shape_res: int = 512,
                    pose_angles=(0.4, 0.0, -0.4)) -> None:
    """ref gen_samples.py:117-222 main loop: 3 yaw angles, frontal
    conditioning pose, truncation 0.7/cutoff 14."""
    os.makedirs(outdir, exist_ok=True)
    intrinsics = fov_to_intrinsics(fov_deg)
    pivot = cfg.rendering.avg_camera_pivot
    radius = cfg.rendering.avg_camera_radius

    # conditioning uses the frontal pose (ref gen_samples.py:167-171)
    cond_pose = lookat_pose(np.pi / 2, np.pi / 2, pivot, radius=radius)
    c_cond = camera_params(cond_pose, intrinsics)

    @jax.jit
    def render(params, z, c_cond, c_cam):
        ws = triplane.mapping(params, z, c_cond, cfg,
                              truncation_psi=truncation_psi,
                              truncation_cutoff=truncation_cutoff)
        return triplane.synthesis(params, ws, c_cam, cfg)["image"], ws

    for seed in seeds:
        z = jax.random.normal(jax.random.key(seed), (1, cfg.z_dim))
        frames = []
        for angle_y in pose_angles:
            pose = lookat_pose(np.pi / 2 + angle_y, np.pi / 2, pivot, radius=radius)
            c_cam = camera_params(pose, intrinsics)
            img, ws = render(params, z, c_cond, c_cam)
            frames.append(to_uint8_image(img)[0])
        save_png(os.path.join(outdir, f"seed{seed:04d}.png"),
                 np.concatenate(frames, axis=1))

        if shapes:
            from .shape_utils import (
                marching_cubes_mesh, sample_density_grid, save_ply, trim_borders)

            sigmas = sample_density_grid(params, ws, cfg, resolution=shape_res)
            sigmas = trim_borders(sigmas)
            verts, faces = marching_cubes_mesh(sigmas, level=10.0)
            save_ply(os.path.join(outdir, f"seed{seed:04d}.ply"), verts, faces)


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", help="orbax checkpoint dir or torch .pkl/.pt", default=None)
    p.add_argument("--seeds", default="0", help="comma-separated seeds")
    p.add_argument("--outdir", default="out")
    p.add_argument("--trunc", type=float, default=0.7)
    p.add_argument("--trunc-cutoff", type=int, default=14)
    p.add_argument("--fov-deg", type=float, default=FOV_DEG)
    p.add_argument("--shapes", action="store_true")
    p.add_argument("--shape-res", type=int, default=512)
    args = p.parse_args(argv)

    cfg = ffhq_generator_config()
    if args.checkpoint is None:
        print("no checkpoint given: using random init (smoke-test mode)")
        params = triplane.init_generator(jax.random.key(0), cfg)
    elif args.checkpoint.endswith((".pkl", ".pt", ".pth")):
        from ..io.torch_converter import load_torch_checkpoint, merge_with_init

        converted = load_torch_checkpoint(args.checkpoint)
        params = merge_with_init(converted, triplane.init_generator(jax.random.key(0), cfg))
    else:
        from ..io.checkpoint import load_checkpoint

        params = load_checkpoint(args.checkpoint)
        if "g_ema" in params:
            params = params["g_ema"]

    seeds = [int(s) for s in args.seeds.split(",") if s]
    generate_images(params, cfg, seeds, args.outdir, truncation_psi=args.trunc,
                    truncation_cutoff=args.trunc_cutoff, fov_deg=args.fov_deg,
                    shapes=args.shapes, shape_res=args.shape_res)


if __name__ == "__main__":
    main()
