"""Ray/box math (rebuild of ref training/volumetric_rendering/math_utils.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_vecs(v, axis: int = -1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def get_ray_limits_box(rays_o: jax.Array, rays_d: jax.Array, box_side_length: float):
    """Slab-method ray/AABB intersection with the centered cube of side
    `box_side_length` (ref: math_utils.py:46-98). Misses get
    (tmin, tmax) = (-1, -2). Shapes: (..., 3) → (..., 1)."""
    half = box_side_length / 2.0
    o = jax.lax.stop_gradient(rays_o)
    d = jax.lax.stop_gradient(rays_d)

    invdir = 1.0 / d
    # For each axis: entering/leaving t against the two slab planes.
    t_lo = (-half - o) * invdir
    t_hi = (half - o) * invdir
    tmin_ax = jnp.minimum(t_lo, t_hi)
    tmax_ax = jnp.maximum(t_lo, t_hi)

    # Progressive slab intersection replicating the reference's validity
    # logic (comparisons BEFORE each max/min update).
    tmin = tmin_ax[..., 0]
    tmax = tmax_ax[..., 0]
    valid = jnp.ones(tmin.shape, bool)
    for ax in (1, 2):
        valid &= ~((tmin > tmax_ax[..., ax]) | (tmin_ax[..., ax] > tmax))
        tmin = jnp.maximum(tmin, tmin_ax[..., ax])
        tmax = jnp.minimum(tmax, tmax_ax[..., ax])

    tmin = jnp.where(valid, tmin, -1.0)
    tmax = jnp.where(valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None]


def linspace_batch(start: jax.Array, stop: jax.Array, num: int):
    """[num, *start.shape] evenly spaced start→stop inclusive
    (ref: math_utils.py:101-118)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((num,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
