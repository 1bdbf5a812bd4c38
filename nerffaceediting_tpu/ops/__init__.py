from .bias_act import activation_funcs, bias_act
from .upfirdn import (
    setup_filter,
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
)
from .grid_sample import grid_sample_2d
from .resize import resize_bilinear
from .modconv import modulated_conv2d, conv2d_resample

__all__ = [
    "activation_funcs",
    "bias_act",
    "setup_filter",
    "upfirdn2d",
    "filter2d",
    "upsample2d",
    "downsample2d",
    "grid_sample_2d",
    "resize_bilinear",
    "modulated_conv2d",
    "conv2d_resample",
]


def fma(a, b, c):
    """Fused multiply-add a*b + c (ref torch_utils/ops/fma.py:17 — a custom
    autograd op there to fuse the demodulation-plus-noise step; XLA fuses
    this natively, the function exists for API parity)."""
    return a * b + c
