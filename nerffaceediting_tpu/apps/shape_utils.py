"""Shape extraction: σ-field → mesh / voxel grid.

Rebuild of ref shape_utils.py:40-124 + the sampling loop of
gen_samples.py:185-222: evaluate density on an N³ grid in device-sized
chunks (static shapes via lax.map), trim borders, then marching-cubes on the
host (geometry extraction is not a device workload)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GeneratorConfig
from ..models import triplane


def sample_density_grid(params, ws, cfg: GeneratorConfig, resolution: int = 512,
                        max_batch: int = 1 << 20, cube_length: float = None) -> np.ndarray:
    """σ on a resolution³ grid spanning box_warp (ref gen_samples.py:185-205:
    chunked evaluation with max_batch points per step)."""
    if cube_length is None:
        cube_length = cfg.rendering.box_warp * 1.0
    # voxel grid matching ref create_samples (gen_samples.py:96-104)
    lin = (np.arange(resolution, dtype=np.float32) / resolution - 0.5) * cube_length
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1).reshape(-1, 3)
    # ref axis convention: samples[:, [1, 0, 2]] swap (gen_samples.py:103)
    grid = grid[:, [1, 0, 2]]

    n_pts = grid.shape[0]
    chunk = min(max_batch, n_pts)
    n_chunks = (n_pts + chunk - 1) // chunk
    pad = n_chunks * chunk - n_pts
    coords = jnp.asarray(np.pad(grid, ((0, pad), (0, 0)))).reshape(n_chunks, 1, chunk, 3)

    @jax.jit
    def density_of(coords_chunk):
        out = triplane.sample_points(params, coords_chunk, ws, cfg)
        return out["sigma"][..., 0]

    sigmas = jax.lax.map(density_of, coords)  # (n_chunks, 1, chunk)
    sigmas = np.asarray(sigmas).reshape(-1)[:n_pts]
    return sigmas.reshape(resolution, resolution, resolution)


def trim_borders(sigmas: np.ndarray, pad: int = 0, pad_value: float = -1000.0,
                 pad_top: Optional[int] = None) -> np.ndarray:
    """Kill density at the volume borders so marching cubes closes the mesh
    (ref gen_samples.py:207-215: pad=N//50, top pad ×2.4 for hair)."""
    if pad == 0:
        pad = int(sigmas.shape[0] // 50 * 3)
    if pad_top is None:
        pad_top = int(pad * 2.4 / 3)
    s = sigmas.copy()
    s[:pad] = pad_value
    s[-pad:] = pad_value
    s[:, :pad] = pad_value
    s[:, -pad_top:] = pad_value
    s[:, :, :pad] = pad_value
    s[:, :, -pad:] = pad_value
    return s


def marching_cubes_mesh(sigmas: np.ndarray, level: float = 10.0):
    """σ grid → (vertices, faces) via skimage marching cubes
    (ref shape_utils.py:40-73 convert_sdf_samples_to_ply)."""
    from skimage import measure

    verts, faces, _, _ = measure.marching_cubes(sigmas, level=level)
    return verts, faces


def save_ply(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal ASCII PLY writer (ref shape_utils.py:74-106 writes binary via
    plyfile; ASCII keeps us dependency-free)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
