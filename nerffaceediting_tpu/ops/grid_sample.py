"""Bilinear 2-D grid sampling (align_corners=False, zeros padding).

TPU-native replacement for ``torch.nn.functional.grid_sample`` as used by the
tri-plane sampler (ref: training/volumetric_rendering/renderer.py:64 and
torch_utils/ops/grid_sample_gradfix.py). Implemented as four gathers over the
flattened spatial axis + a bilinear blend; differentiable to arbitrary order
through ``jax.grad``, which is what the reference's gradfix wrapper exists to
guarantee.

The fused Pallas tri-plane kernel (ops/triplane_kernel.py) supersedes this on
the render hot path; this op remains the golden-semantics implementation and
the general-purpose fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample `img` at normalized `coords`.

    Args:
      img:    (B, C, H, W) feature maps.
      coords: (B, M, 2) sample locations in [-1, 1]; coords[..., 0] is x
              (width axis), coords[..., 1] is y (height axis) — the
              torch.grid_sample convention.

    Returns:
      (B, C, M) sampled features. Out-of-range samples blend with zeros
      (padding_mode='zeros'); pixel centers follow align_corners=False:
      pixel i center is at normalized coordinate (2i + 1)/size - 1.
    """
    B, C, H, W = img.shape
    assert coords.ndim == 3 and coords.shape[-1] == 2

    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)
    x = coords[..., 0].astype(compute_dtype)
    y = coords[..., 1].astype(compute_dtype)

    # align_corners=False: unnormalize to continuous pixel coordinates.
    fx = (x + 1.0) * (W * 0.5) - 0.5
    fy = (y + 1.0) * (H * 0.5) - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    def in_bounds(ix, iy):
        return ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)).astype(compute_dtype)

    m00 = in_bounds(ix0, iy0)
    m01 = in_bounds(ix1, iy0)
    m10 = in_bounds(ix0, iy1)
    m11 = in_bounds(ix1, iy1)

    cx0 = jnp.clip(ix0, 0, W - 1)
    cx1 = jnp.clip(ix1, 0, W - 1)
    cy0 = jnp.clip(iy0, 0, H - 1)
    cy1 = jnp.clip(iy1, 0, H - 1)

    flat = img.reshape(B, C, H * W)

    def gather(iy, ix):
        idx = (iy * W + ix)[:, None, :]  # (B, 1, M)
        return jnp.take_along_axis(flat, idx, axis=2)  # (B, C, M)

    v00 = gather(cy0, cx0)
    v01 = gather(cy0, cx1)
    v10 = gather(cy1, cx0)
    v11 = gather(cy1, cx1)

    w00 = (wy0 * wx0 * m00)[:, None, :]
    w01 = (wy0 * wx1 * m01)[:, None, :]
    w10 = (wy1 * wx0 * m10)[:, None, :]
    w11 = (wy1 * wx1 * m11)[:, None, :]

    out = (
        v00.astype(compute_dtype) * w00
        + v01.astype(compute_dtype) * w01
        + v10.astype(compute_dtype) * w10
        + v11.astype(compute_dtype) * w11
    )
    return out.astype(img.dtype)
