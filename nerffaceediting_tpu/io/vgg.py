"""VGG16 perceptual features in JAX (for the projector's LPIPS-style loss).

The reference downloads NVIDIA's vgg16.pt TorchScript (ref projector.py:43-46)
— unavailable offline; this module provides (a) the VGG16 feature trunk as
pure JAX, (b) a converter from torchvision VGG16 state_dicts, (c) a keyed
random init for tests. Features follow the LPIPS convention: conv stack
activations after each of the 5 blocks, unit-normalized per channel.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.precision import get_precision

# torchvision vgg16.features conv layer indices and channels
VGG16_LAYOUT = [  # (torch_idx, in_ch, out_ch) per conv; 'M' = maxpool after
    (0, 3, 64), (2, 64, 64), "M",
    (5, 64, 128), (7, 128, 128), "M",
    (10, 128, 256), (12, 256, 256), (14, 256, 256), "M",
    (17, 256, 512), (19, 512, 512), (21, 512, 512), "M",
    (24, 512, 512), (26, 512, 512), (28, 512, 512), "M",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv(x, w, b):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
    return y + b.reshape(1, -1, 1, 1).astype(x.dtype)


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def vgg16_features(params: Dict, img255: jax.Array,
                   normalize: bool = True) -> jax.Array:
    """img255 (B, 3, H, W) in [0, 255] → concatenated LPIPS-style features.

    Returns (B, D): per-block spatially-averaged, channel-unit-normalized
    activations (a compact perceptual embedding; the projector only needs a
    perceptual distance, ref projector.py:153-156 uses sum-squared feature
    difference)."""
    x = img255 / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, x.dtype).reshape(1, 3, 1, 1)
    x = (x - mean) / std

    feats: List[jax.Array] = []
    conv_i = 0
    for item in VGG16_LAYOUT:
        if item == "M":
            # block output: capture before pooling
            f = x
            if normalize:
                f = f * lax.rsqrt(jnp.mean(jnp.square(f), axis=1, keepdims=True) + 1e-10)
            feats.append(jnp.mean(f, axis=(2, 3)))
            x = _maxpool2(x)
        else:
            _, _, _ = item
            p = params[f"conv{conv_i}"]
            x = jax.nn.relu(_conv(x, p["weight"], p["bias"]))
            conv_i += 1
    return jnp.concatenate(feats, axis=1)


def init_vgg16(key) -> Dict:
    params = {}
    convs = [it for it in VGG16_LAYOUT if it != "M"]
    keys = jax.random.split(key, len(convs))
    for i, ((torch_idx, cin, cout), k) in enumerate(zip(convs, keys)):
        params[f"conv{i}"] = {
            "weight": jax.random.normal(k, (cout, cin, 3, 3)) * (2.0 / (cin * 9)) ** 0.5,
            "bias": jnp.zeros((cout,)),
        }
    return params


def convert_vgg16_state_dict(sd) -> Dict:
    """torchvision vgg16().state_dict() → our pytree (features.N.weight)."""
    import numpy as np

    params = {}
    convs = [it for it in VGG16_LAYOUT if it != "M"]
    for i, (torch_idx, _, _) in enumerate(convs):
        w = sd[f"features.{torch_idx}.weight"]
        b = sd[f"features.{torch_idx}.bias"]
        w = w.detach().cpu().numpy() if hasattr(w, "detach") else np.asarray(w)
        b = b.detach().cpu().numpy() if hasattr(b, "detach") else np.asarray(b)
        params[f"conv{i}"] = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    return params


def make_feature_fn(params: Dict):
    """FeatureFn for editing/projector.py (img in [0,255] → (B, D))."""
    def fn(img255: jax.Array) -> jax.Array:
        return vgg16_features(params, img255)
    return fn
