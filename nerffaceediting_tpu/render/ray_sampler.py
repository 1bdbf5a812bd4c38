"""Camera-ray generation (OpenCV convention).

Rebuild of ref training/volumetric_rendering/ray_sampler.py:18-62: pixel
centers on a uniform grid, un-projected through the intrinsics (incl. skew),
transformed by cam2world, directions normalized. Pure math — one fused XLA
region; no state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_rays(cam2world: jax.Array, intrinsics: jax.Array, resolution: int):
    """cam2world (N,4,4), intrinsics (N,3,3) → origins (N,M,3), dirs (N,M,3),
    with M = resolution² in row-major (i*res + j) pixel order, pixel centers
    at ((j+0.5)/res, (i+0.5)/res) (ref: ray_sampler.py:43-45)."""
    N = cam2world.shape[0]
    M = resolution * resolution
    cam_locs = cam2world[:, :3, 3]  # (N, 3)
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    idx = jnp.arange(resolution, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(idx, idx)  # jj = column (x), ii = row (y)
    x_cam = ((jj + 0.5) / resolution).reshape(1, M)
    y_cam = ((ii + 0.5) / resolution).reshape(1, M)
    z_cam = jnp.ones((N, M), jnp.float32)

    # Un-projection with skew (ref: ray_sampler.py:51-52).
    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel = jnp.stack(
        [jnp.broadcast_to(x_lift, (N, M)), y_lift, z_cam, jnp.ones((N, M), jnp.float32)],
        axis=-1,
    )  # (N, M, 4)
    world = jnp.einsum("nij,nmj->nmi", cam2world, cam_rel)[..., :3]

    dirs = world - cam_locs[:, None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam_locs[:, None, :], dirs.shape)
    return origins, dirs
