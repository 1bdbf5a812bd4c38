"""Generate a synthetic-but-structured camera-labelled dataset for training
demonstrations (VERDICT r2 item 5).

Ray-traces a fixed "head-like" 3D scene — a skin-tone head ellipsoid, hair
cap, two eyes, nose, mouth — with Lambertian + ambient shading, from cameras
drawn with the SAME distribution and label packing the FFHQ config trains
with (gaussian lookat poses around the front, radius 2.7, fov 18.837;
`render/cameras.py` convention, ref camera_utils.py:58-87 +
dataset.json packing ref training/dataset.py:230-242). Per-image shape and
color jitter gives the GAN something non-degenerate to model, while 3D
consistency means camera conditioning is actually learnable.

Output: a zip usable by `train/dataset.py::ImageFolderDataset` (PNG images +
dataset.json), i.e. exactly what `apps/train.py --data` consumes.

Usage:
    python scripts/make_synthetic_dataset.py --out /tmp/synth512.zip \
        --n 2000 --res 512 [--seed 0]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scene(rng: np.random.Generator):
    """Per-image jittered scene: list of (center(3), radii(3), albedo(3)).

    Geometry lives inside the renderer's [-0.5, 0.5] box scene bounds
    (config box_warp=1) so the same scene is learnable by the tri-plane
    generator at the real training config.
    """
    jit = lambda s: rng.uniform(1 - s, 1 + s)
    skin = np.array([0.85, 0.62, 0.50]) * jit(0.15)
    hair = np.array([0.15, 0.10, 0.08]) + rng.uniform(0, 0.35) * np.array([1, 0.6, 0.3])
    eye = np.array([0.08, 0.10, 0.30]) * jit(0.3)
    lips = np.array([0.70, 0.25, 0.25]) * jit(0.2)
    hw = 0.26 * jit(0.08)   # head half-width
    prims = [
        # head: slightly prolate ellipsoid at origin
        (np.array([0.0, 0.0, 0.0]), np.array([hw, hw * 1.25, hw * 1.1]), skin),
        # hair cap: larger sphere shifted up+back
        (np.array([0.0, 0.10 * jit(0.2), -0.08]),
         np.array([hw * 1.05, hw * 1.15, hw * 0.95]), hair),
        # eyes (z-forward: +z toward the default camera)
        (np.array([-0.10 * jit(0.1), 0.05, hw * 1.02]),
         np.array([0.035, 0.035, 0.02]) * jit(0.2), eye),
        (np.array([+0.10 * jit(0.1), 0.05, hw * 1.02]),
         np.array([0.035, 0.035, 0.02]) * jit(0.2), eye),
        # nose
        (np.array([0.0, -0.02, hw * 1.12]),
         np.array([0.035, 0.05, 0.04]) * jit(0.2), skin * 1.08),
        # mouth
        (np.array([0.0, -0.12 * jit(0.1), hw * 1.0]),
         np.array([0.07, 0.02, 0.02]) * jit(0.2), lips),
    ]
    return prims


def _render(cam2world: np.ndarray, intrinsics: np.ndarray, res: int,
            prims, light_dir=(0.4, 0.6, 0.7)) -> np.ndarray:
    """Analytic ellipsoid ray tracing, vectorized over the pixel grid.

    Ray generation mirrors render/ray_sampler.py (uv at pixel centers,
    normalized intrinsics) so dataset cameras and the renderer agree.
    """
    fx, fy, cx, cy = (intrinsics[0, 0], intrinsics[1, 1],
                      intrinsics[0, 2], intrinsics[1, 2])
    uv = (np.stack(np.meshgrid(np.arange(res), np.arange(res), indexing="xy"),
                   -1).reshape(-1, 2) + 0.5) / res
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    dirs_cam = np.stack([x, y, np.ones_like(x)], -1)
    dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs = dirs_cam @ cam2world[:3, :3].T
    origin = cam2world[:3, 3]

    N = dirs.shape[0]
    best_t = np.full(N, np.inf, np.float32)
    color = np.zeros((N, 3), np.float32)
    L = np.asarray(light_dir, np.float32)
    L /= np.linalg.norm(L)
    for c, r, albedo in prims:
        # unit-sphere space intersection
        o = (origin - c) / r
        d = dirs / r
        a = np.sum(d * d, -1)
        b = 2 * np.sum(o * d, -1)
        cc = np.sum(o * o, -1) - 1.0
        disc = b * b - 4 * a * cc
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), np.inf)
        hit &= (t > 1e-3) & (t < best_t)
        if not hit.any():
            continue
        p = origin + dirs * t[:, None]
        n = (p - c) / (r * r)
        n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-9
        lam = np.maximum(n @ L, 0.0)
        shade = (0.30 + 0.70 * lam)[:, None] * albedo[None]
        best_t = np.where(hit, t, best_t)
        color = np.where(hit[:, None], shade, color)

    bg = 0.95  # light background, like studio portrait datasets
    img = np.where(np.isinf(best_t)[:, None], bg, color)
    return (np.clip(img, 0, 1).reshape(res, res, 3) * 255).astype(np.uint8)


def make_dataset(out: str, n: int, res: int, seed: int = 0,
                 fov: float = 18.837, radius: float = 2.7,
                 h_std: float = 0.35, v_std: float = 0.18) -> None:
    import jax
    from PIL import Image

    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    rng = np.random.default_rng(seed)
    intr = np.asarray(fov_to_intrinsics(fov))
    labels = []
    with zipfile.ZipFile(out, "w", zipfile.ZIP_STORED) as zf:
        for i in range(n):
            # FFHQ-style pose distribution (apps/train.py gen_pose_cond
            # uses the same lookat sampler at train time)
            key = jax.random.key(seed * 1_000_003 + i)
            pose = np.asarray(lookat_pose(
                np.pi / 2, np.pi / 2, (0.0, 0.0, 0.0), radius=radius,
                rng=key, horizontal_stddev=h_std, vertical_stddev=v_std))[0]
            img = _render(pose, intr, res, _scene(rng))
            fname = f"img{i:08d}.png"
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="png", compress_level=1)
            zf.writestr(fname, buf.getvalue())
            label = np.asarray(camera_params(pose[None], intr))[0]
            labels.append([fname, [float(v) for v in label]])
            if (i + 1) % 200 == 0:
                print(f"{i + 1}/{n}", flush=True)
        zf.writestr("dataset.json", json.dumps({"labels": labels}))
    print(f"wrote {out}: {n} images at {res}x{res}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    make_dataset(args.out, args.n, args.res, args.seed)
