"""upfirdn2d — pad → zero-upsample → FIR filter → downsample.

TPU-native replacement for the reference CUDA kernel
(ref: torch_utils/ops/upfirdn2d.cu, semantics defined by the golden
reference implementation torch_utils/ops/upfirdn2d.py:169-213).

Instead of a hand-written kernel, the whole pipeline maps onto ONE
``lax.conv_general_dilated`` per filter axis:

  * zero-upsampling  = ``lhs_dilation``   (XLA dilates the input on the fly,
    the zeros are never materialized in HBM)
  * padding/cropping = explicit (possibly negative) conv padding
  * FIR filtering    = depthwise convolution (``feature_group_count = C``)
  * downsampling     = ``window_strides``

Separable filters (the [1,3,3,1] StyleGAN2 default) run as two 1-D depthwise
convs; per-axis up/pad/down commute with the orthogonal-axis filter, so each
axis is fully fused. XLA lowers this well on TPU and the op is differentiable
to arbitrary order for free (the CUDA path hand-codes the transposed op as
its backward, ref upfirdn2d.py:253-271).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .precision import get_precision

Scaling = Union[int, Sequence[int]]
Padding = Union[int, Sequence[int]]


def _parse_scaling(scaling: Scaling) -> Tuple[int, int]:
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding: Padding) -> Tuple[int, int, int, int]:
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def _get_filter_size(f: Optional[jax.Array]) -> Tuple[int, int]:
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> jax.Array:
    """Prepare a FIR filter for upfirdn2d (ref: upfirdn2d.py:69-117).

    Returns a float32 array: 1-D if separable, else 2-D.
    """
    if f is None:
        f = 1.0
    f = jnp.asarray(f, jnp.float32)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[jnp.newaxis]

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _depthwise_fir_1d(
    x: jax.Array,
    f1d: jax.Array,
    axis: int,  # 2 = H, 3 = W (logical axes; layout set by channels_last)
    up: int,
    down: int,
    pad0: int,
    pad1: int,
    channels_last: bool = False,
) -> jax.Array:
    """Depthwise 1-D FIR with fused dilation/stride along one spatial axis."""
    channels = x.shape[3] if channels_last else x.shape[1]
    taps = int(f1d.shape[0])
    if axis == 2:
        kernel = f1d.reshape(taps, 1)
        lhs_dilation = (up, 1)
        strides = (down, 1)
        padding = ((pad0, pad1), (0, 0))
    else:
        kernel = f1d.reshape(1, taps)
        lhs_dilation = (1, up)
        strides = (1, down)
        padding = ((0, 0), (pad0, pad1))
    if channels_last:
        # HWIO depthwise kernel: (kh, kw, 1, C) — channels ride the lane dim.
        kernel = jnp.tile(kernel[:, :, jnp.newaxis, jnp.newaxis],
                          (1, 1, 1, channels))
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        kernel = jnp.tile(kernel[jnp.newaxis, jnp.newaxis], (channels, 1, 1, 1))
        dn = ("NCHW", "OIHW", "NCHW")
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=dn,
        feature_group_count=channels,
        precision=get_precision(),
    )


def upfirdn2d(
    x: jax.Array,
    f: Optional[jax.Array],
    up: Scaling = 1,
    down: Scaling = 1,
    padding: Padding = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
    channels_last: bool = False,
) -> jax.Array:
    """Pad, upsample, FIR-filter, and downsample a batch of images
    (NCHW by default; NHWC with channels_last — the TPU-preferred layout).

    Exact semantics of ref torch_utils/ops/upfirdn2d.py:169-213: zero-insert
    upsample by `up`, apply (possibly negative) `padding` on the upsampled
    grid, correlate with `f` flipped unless `flip_filter`, then keep every
    `down`-th pixel. Output magnitude is scaled by `gain`.
    """
    assert x.ndim == 4
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    in_h, in_w = (x.shape[1], x.shape[2]) if channels_last else (x.shape[2], x.shape[3])
    up_w = in_w * upx + padx0 + padx1
    up_h = in_h * upy + pady0 + pady1
    assert up_w >= f.shape[-1] and up_h >= f.shape[0]

    # The reference flips the filter for correlation unless flip_filter is
    # set (upfirdn2d.py:201-203); lax.conv computes correlation, so we flip
    # when flip_filter is False.
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    # Zero-upsampling inserts up-1 zeros AFTER each sample
    # (upfirdn2d.py:190-193), whereas lhs_dilation inserts them BETWEEN
    # samples: the dilated signal is the reference's upsampled signal minus
    # its up-1 trailing zeros. Compensate by adding up-1 to the trailing pad.
    if f.ndim == 1:
        x = _depthwise_fir_1d(x, f, axis=2, up=upy, down=downy, pad0=pady0,
                              pad1=pady1 + upy - 1, channels_last=channels_last)
        x = _depthwise_fir_1d(x, f, axis=3, up=upx, down=downx, pad0=padx0,
                              pad1=padx1 + upx - 1, channels_last=channels_last)
    else:
        if channels_last:
            channels = x.shape[3]
            kernel = jnp.tile(f[:, :, jnp.newaxis, jnp.newaxis],
                              (1, 1, 1, channels))
            dn = ("NHWC", "HWIO", "NHWC")
        else:
            channels = x.shape[1]
            kernel = jnp.tile(f[jnp.newaxis, jnp.newaxis], (channels, 1, 1, 1))
            dn = ("NCHW", "OIHW", "NCHW")
        x = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(downy, downx),
            padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
            lhs_dilation=(upy, upx),
            dimension_numbers=dn,
            feature_group_count=channels,
            precision=get_precision(),
        )
    return x


def filter2d(x, f, padding: Padding = 0, flip_filter=False, gain=1.0,
             channels_last: bool = False):
    """Shape-preserving FIR filter (ref: upfirdn2d.py:279-312)."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + fw // 2,
        padx1 + (fw - 1) // 2,
        pady0 + fh // 2,
        pady1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain,
                     channels_last=channels_last)


def upsample2d(x, f, up: Scaling = 2, padding: Padding = 0, flip_filter=False, gain=1.0,
               channels_last: bool = False):
    """FIR-interpolating 2× upsample (ref: upfirdn2d.py:315-351)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy, channels_last=channels_last)


def downsample2d(x, f, down: Scaling = 2, padding: Padding = 0, flip_filter=False, gain=1.0,
                 channels_last: bool = False):
    """Anti-aliased 2× downsample (ref: upfirdn2d.py:354-389)."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain,
                     channels_last=channels_last)
