"""filtered_lrelu — upsample → bias → leaky ReLU → clamp → downsample.

TPU equivalent of the reference's largest CUDA kernel
(ref torch_utils/ops/filtered_lrelu.cu ~1800 LoC, used only by StyleGAN3's
alias-free layers, networks_stylegan3.py:357 — NOT on the NeRFFaceEditing
ffhq path, SURVEY §2.1). Composed from the upfirdn primitive exactly as the
reference's own fallback does (filtered_lrelu.py ref path): the CUDA kernel's
sign-buffer memoization is a memory optimization XLA doesn't need — the
elementwise chain fuses into the surrounding convs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .bias_act import bias_act
from .upfirdn import upfirdn2d, _get_filter_size, _parse_padding


def filtered_lrelu(x: jax.Array, fu: Optional[jax.Array] = None,
                   fd: Optional[jax.Array] = None,
                   b: Optional[jax.Array] = None,
                   up: int = 1, down: int = 1, padding=0,
                   gain: float = 2**0.5, slope: float = 0.2,
                   clamp: Optional[float] = None) -> jax.Array:
    """ref torch_utils/ops/filtered_lrelu.py:123-153 (the reference path):

    1. bias, 2. zero-upsample by `up`, pad by `padding`, filter with `fu`
    (gain up²), 3. leaky-relu(slope) scaled by `gain`, optional ±clamp,
    4. filter with `fd` (valid) and downsample by `down`.
    `padding` is w.r.t. the upsampled image; both FIR stages shrink the
    canvas by taps−1 (no implicit centering — SG3's layer-level padding
    accounts for the filter extents, networks_stylegan3.py:324-330)."""
    if b is not None:
        x = x + b.reshape(1, -1, 1, 1).astype(x.dtype)
    x = upfirdn2d(x, fu, up=up, padding=padding, gain=up**2)
    x = bias_act(x, None, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down)
    return x
