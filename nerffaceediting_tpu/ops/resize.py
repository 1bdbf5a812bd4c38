"""Bilinear image resizing matching torch F.interpolate semantics.

Used by (a) the superresolution input lift 64²→128² (ref:
training/superresolution.py:282-286, antialias flag has no effect when
upsampling) and (b) `filtered_resizing` of real/SR images for the dual
discriminator (ref: training/dual_discriminator.py:86-102, antialiased
downsample).

``jax.image.resize`` with method='linear' uses half-pixel sample positions —
identical to torch align_corners=False — but does NOT antialias when
downscaling, so the antialiased path scales the kernel support explicitly
(same triangle-kernel convolution torch uses for antialias=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(x: jax.Array, size: int, antialias: bool = False,
                    channels_last: bool = False) -> jax.Array:
    """Resize NCHW (or NHWC) images to (size, size) bilinearly.

    antialias only changes behaviour when downscaling (torch semantics).
    """
    if channels_last:
        B, H, W, C = x.shape
        if H == size and W == size:
            return x
        if not antialias or size >= H:
            return jax.image.resize(x, (B, size, size, C), method="linear")
        return _downsample_antialiased(x.transpose(0, 3, 1, 2),
                                       size).transpose(0, 2, 3, 1)
    B, C, H, W = x.shape
    if H == size and W == size:
        return x
    if not antialias or size >= H:
        return jax.image.resize(x, (B, C, size, size), method="linear")
    return _downsample_antialiased(x, size)


def _triangle_kernel_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) row-normalized triangle-kernel resampling
    matrix, as used by torch's antialiased bilinear downsample."""
    scale = in_size / out_size
    support = scale  # triangle kernel half-width, scaled by the zoom factor
    out_idx = np.arange(out_size, dtype=np.float64)
    center = (out_idx + 0.5) * scale - 0.5
    in_idx = np.arange(in_size, dtype=np.float64)
    dist = np.abs(in_idx[None, :] - center[:, None]) / support
    weights = np.clip(1.0 - dist, 0.0, None)
    weights /= weights.sum(axis=1, keepdims=True)
    return weights


def _downsample_antialiased(x: jax.Array, size: int) -> jax.Array:
    B, C, H, W = x.shape
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    wy = jnp.asarray(_triangle_kernel_matrix(H, size), compute_dtype)
    wx = jnp.asarray(_triangle_kernel_matrix(W, size), compute_dtype)
    y = jnp.einsum("oh,bchw->bcow", wy, x.astype(compute_dtype))
    y = jnp.einsum("ow,bchw->bcho", wx, y)
    return y.astype(x.dtype)
