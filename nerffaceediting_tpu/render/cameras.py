"""Camera pose/intrinsics utilities (rebuild of ref camera_utils.py:22-149).

y-up, z-forward, x-left coordinate system; poses look at a target point.
All functions are numpy/JAX-agnostic pure math returning float32 arrays; the
stochastic samplers take explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def create_cam2world_matrix(forward_vector: jax.Array, origin: jax.Array) -> jax.Array:
    """Look-at cam2world with y-up, no roll (ref: camera_utils.py:118-137)."""
    forward = normalize(forward_vector)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), forward.shape)
    right = -normalize(jnp.cross(up, forward))
    up = normalize(jnp.cross(forward, right))

    B = forward.shape[0]
    rot = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B, 1, 1))
    rot = rot.at[:, :3, :3].set(jnp.stack([right, up, forward], axis=-1))
    trans = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B, 1, 1))
    trans = trans.at[:, :3, 3].set(origin)
    return trans @ rot


def _spherical_origin(h, v, radius):
    """Azimuth/polar → camera position (ref: camera_utils.py:44-52)."""
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    theta = h
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    x = radius * jnp.sin(phi) * jnp.cos(math.pi - theta)
    z = radius * jnp.sin(phi) * jnp.sin(math.pi - theta)
    y = radius * jnp.cos(phi)
    return jnp.stack([x, y, z], axis=-1)


def lookat_pose(horizontal: float, vertical: float, lookat_position,
                radius: float = 1.0, batch_size: int = 1,
                rng: Optional[jax.Array] = None,
                horizontal_stddev: float = 0.0, vertical_stddev: float = 0.0) -> jax.Array:
    """LookAtPoseSampler.sample (ref: camera_utils.py:58-87). Deterministic
    when rng is None or both stddevs are 0."""
    h = jnp.full((batch_size,), float(horizontal), jnp.float32)
    v = jnp.full((batch_size,), float(vertical), jnp.float32)
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = h + jax.random.normal(kh, (batch_size,)) * horizontal_stddev
        v = v + jax.random.normal(kv, (batch_size,)) * vertical_stddev
    origins = _spherical_origin(h, v, radius)
    lookat = jnp.broadcast_to(jnp.asarray(lookat_position, jnp.float32), origins.shape)
    forward = normalize(lookat - origins)
    return create_cam2world_matrix(forward, origins)


def gaussian_pose(horizontal_mean, vertical_mean, radius=1.0, batch_size=1,
                  rng: Optional[jax.Array] = None,
                  horizontal_stddev=0.0, vertical_stddev=0.0) -> jax.Array:
    """GaussianCameraPoseSampler.sample (ref: camera_utils.py:22-55):
    looks at the origin."""
    return lookat_pose(horizontal_mean, vertical_mean, (0.0, 0.0, 0.0),
                       radius=radius, batch_size=batch_size, rng=rng,
                       horizontal_stddev=horizontal_stddev,
                       vertical_stddev=vertical_stddev)


def uniform_pose(horizontal_mean, vertical_mean, radius=1.0, batch_size=1,
                 rng: Optional[jax.Array] = None,
                 horizontal_stddev=0.0, vertical_stddev=0.0) -> jax.Array:
    """UniformCameraPoseSampler.sample (ref: camera_utils.py:88-116)."""
    h = jnp.full((batch_size,), float(horizontal_mean), jnp.float32)
    v = jnp.full((batch_size,), float(vertical_mean), jnp.float32)
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = h + (jax.random.uniform(kh, (batch_size,)) * 2 - 1) * horizontal_stddev
        v = v + (jax.random.uniform(kv, (batch_size,)) * 2 - 1) * vertical_stddev
    origins = _spherical_origin(h, v, radius)
    forward = normalize(-origins)
    return create_cam2world_matrix(forward, origins)


def fov_to_intrinsics(fov_degrees: float) -> jax.Array:
    """Normalized 3×3 intrinsics from FOV (ref: camera_utils.py:140-149)."""
    focal = 1.0 / (math.tan(fov_degrees * 3.14159 / 360) * 1.414)
    return jnp.asarray(
        [[focal, 0.0, 0.5], [0.0, focal, 0.5], [0.0, 0.0, 1.0]], jnp.float32
    )


def camera_params(cam2world: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Pack the 25-float conditioning label (16 cam2world + 9 intrinsics),
    the dataset's label format (ref: training/dataset.py:230-242)."""
    if cam2world.ndim == 2:
        cam2world = cam2world[None]
    B = cam2world.shape[0]
    intr = jnp.broadcast_to(intrinsics.reshape(-1, 9), (B, 9))
    return jnp.concatenate([cam2world.reshape(B, 16), intr], axis=1)
