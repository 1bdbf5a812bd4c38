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
