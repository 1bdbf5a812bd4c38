"""InceptionV3 feature extractor in pure JAX — the self-contained FID
detector (VERDICT r1 #10: no torch on the generator side).

Implements the torchvision `inception_v3` graph (inference mode, no aux
head) keyed to the torchvision state_dict layout, so published weights
convert mechanically (`convert_inception_state_dict`). A keyed random init
gives a deterministic fixture detector for tests; FID *parity* with the
reference's TF-ported pickle additionally needs the real weights file
(ref metrics/metric_utils.py:64-65 inception-2015-12-05.pkl — its TF pool_3
graph differs slightly from torchvision's; document which detector scored a
number when comparing).

Forward: uint8-range RGB → resize 299² → ImageNet normalize → stem →
3×InceptionA → InceptionB → 4×InceptionC → InceptionD → 2×InceptionE →
global avgpool → (B, 2048).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.precision import get_precision

BN_EPS = 1e-3  # torchvision BasicConv2d


def _conv_bn(p, x, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    y = lax.conv_general_dilated(
        x, p["conv"]["weight"].astype(x.dtype), (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
    bn = p["bn"]
    scale = bn["weight"] * lax.rsqrt(bn["running_var"] + BN_EPS)
    bias = bn["bias"] - bn["running_mean"] * scale
    y = y * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)
    return jax.nn.relu(y)


def _maxpool3s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def _avgpool3s1p1(x):
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
                          [(0, 0), (0, 0), (1, 1), (1, 1)])
    # torchvision count_include_pad=True (default for nn.AvgPool2d here? it
    # uses F.avg_pool2d default count_include_pad=True) → divide by 9
    return s / 9.0


def _inception_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_2"], _conv_bn(p["branch5x5_1"], x), padding=2)
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=1)
    bp = _conv_bn(p["branch_pool"], _avgpool3s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=1)


def _inception_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _conv_bn(p["branch_pool"], _avgpool3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_2"], _conv_bn(p["branch3x3_1"], x), stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=1)


def _inception_e(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=(0, 1)),
        _conv_bn(p["branch3x3_2b"], b3, padding=(1, 0)),
    ], axis=1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=(0, 1)),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=(1, 0)),
    ], axis=1)
    bp = _conv_bn(p["branch_pool"], _avgpool3s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def inception_features(params: Dict, img255: jax.Array) -> jax.Array:
    """img255 (B, 3, H, W) uint8-range RGB → (B, 2048) pool features."""
    from ..ops import resize_bilinear

    x = img255.astype(jnp.float32) / 255.0
    if x.shape[-1] != 299:
        x = resize_bilinear(x, 299, antialias=True)
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, x.dtype).reshape(1, 3, 1, 1)
    x = (x - mean) / std

    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=1)
    x = _maxpool3s2(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    x = _maxpool3s2(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    return jnp.mean(x, axis=(2, 3))  # (B, 2048)


def inception_probs(params: Dict, img255: jax.Array) -> jax.Array:
    """Classifier softmax over the 1000 ImageNet classes — the IS input
    (ref metrics/inception_score.py:25-27 captures the softmax output)."""
    feats = inception_features(params, img255)
    fc = params["fc"]
    logits = feats @ fc["weight"].T + fc["bias"]
    return jax.nn.softmax(logits, axis=-1)


def convert_inception_state_dict(sd) -> Dict:
    """torchvision inception_v3().state_dict() → our pytree (drops
    AuxLogits and num_batches_tracked; keeps fc for the IS classifier
    head, ref metrics/inception_score.py:27 uses the softmax output)."""

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: Dict = {}
    for name, value in sd.items():
        if name.startswith("AuxLogits.") or name.endswith("num_batches_tracked"):
            continue
        node = params
        parts = name.split(".")
        for key in parts[:-1]:
            node = node.setdefault(key, {})
        node[parts[-1]] = jnp.asarray(to_np(value))
    return params


# (module, out-channel spec) table for the keyed random init
_STEM = [("Conv2d_1a_3x3", 3, 32, (3, 3)), ("Conv2d_2a_3x3", 32, 32, (3, 3)),
         ("Conv2d_2b_3x3", 32, 64, (3, 3)), ("Conv2d_3b_1x1", 64, 80, (1, 1)),
         ("Conv2d_4a_3x3", 80, 192, (3, 3))]


def init_inception(key) -> Dict:
    """Keyed random init with the converter's structure (fixture detector)."""
    counter = [0]
    keys = jax.random.split(key, 512)

    def conv_bn(cin, cout, kh, kw):
        k = keys[counter[0]]
        counter[0] += 1
        return {
            "conv": {"weight": jax.random.normal(k, (cout, cin, kh, kw))
                     * (2.0 / (cin * kh * kw)) ** 0.5},
            "bn": {"weight": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
                   "running_mean": jnp.zeros((cout,)),
                   "running_var": jnp.ones((cout,))},
        }

    params: Dict = {}
    for name, cin, cout, (kh, kw) in _STEM:
        params[name] = conv_bn(cin, cout, kh, kw)

    def ia(cin, pf):
        return {"branch1x1": conv_bn(cin, 64, 1, 1),
                "branch5x5_1": conv_bn(cin, 48, 1, 1),
                "branch5x5_2": conv_bn(48, 64, 5, 5),
                "branch3x3dbl_1": conv_bn(cin, 64, 1, 1),
                "branch3x3dbl_2": conv_bn(64, 96, 3, 3),
                "branch3x3dbl_3": conv_bn(96, 96, 3, 3),
                "branch_pool": conv_bn(cin, pf, 1, 1)}

    def ib(cin):
        return {"branch3x3": conv_bn(cin, 384, 3, 3),
                "branch3x3dbl_1": conv_bn(cin, 64, 1, 1),
                "branch3x3dbl_2": conv_bn(64, 96, 3, 3),
                "branch3x3dbl_3": conv_bn(96, 96, 3, 3)}

    def ic(cin, c7):
        return {"branch1x1": conv_bn(cin, 192, 1, 1),
                "branch7x7_1": conv_bn(cin, c7, 1, 1),
                "branch7x7_2": conv_bn(c7, c7, 1, 7),
                "branch7x7_3": conv_bn(c7, 192, 7, 1),
                "branch7x7dbl_1": conv_bn(cin, c7, 1, 1),
                "branch7x7dbl_2": conv_bn(c7, c7, 7, 1),
                "branch7x7dbl_3": conv_bn(c7, c7, 1, 7),
                "branch7x7dbl_4": conv_bn(c7, c7, 7, 1),
                "branch7x7dbl_5": conv_bn(c7, 192, 1, 7),
                "branch_pool": conv_bn(cin, 192, 1, 1)}

    def idd(cin):
        return {"branch3x3_1": conv_bn(cin, 192, 1, 1),
                "branch3x3_2": conv_bn(192, 320, 3, 3),
                "branch7x7x3_1": conv_bn(cin, 192, 1, 1),
                "branch7x7x3_2": conv_bn(192, 192, 1, 7),
                "branch7x7x3_3": conv_bn(192, 192, 7, 1),
                "branch7x7x3_4": conv_bn(192, 192, 3, 3)}

    def ie(cin):
        return {"branch1x1": conv_bn(cin, 320, 1, 1),
                "branch3x3_1": conv_bn(cin, 384, 1, 1),
                "branch3x3_2a": conv_bn(384, 384, 1, 3),
                "branch3x3_2b": conv_bn(384, 384, 3, 1),
                "branch3x3dbl_1": conv_bn(cin, 448, 1, 1),
                "branch3x3dbl_2": conv_bn(448, 384, 3, 3),
                "branch3x3dbl_3a": conv_bn(384, 384, 1, 3),
                "branch3x3dbl_3b": conv_bn(384, 384, 3, 1),
                "branch_pool": conv_bn(cin, 192, 1, 1)}

    params["Mixed_5b"] = ia(192, 32)
    params["Mixed_5c"] = ia(256, 64)
    params["Mixed_5d"] = ia(288, 64)
    params["Mixed_6a"] = ib(288)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        c7 = {"Mixed_6b": 128, "Mixed_6c": 160, "Mixed_6d": 160,
              "Mixed_6e": 192}[name]
        params[name] = ic(768, c7)
    params["Mixed_7a"] = idd(768)
    params["Mixed_7b"] = ie(1280)
    params["Mixed_7c"] = ie(2048)
    k = keys[counter[0]]
    params["fc"] = {"weight": jax.random.normal(k, (1000, 2048)) / 2048 ** 0.5,
                    "bias": jnp.zeros((1000,))}
    return params


def inception_features_fn_jax(params: Optional[Dict] = None, batch: int = 16):
    """FeatureFn for metric_main (uint8 NHWC numpy → (N, 2048) numpy),
    torch-free. params: converted torchvision weights, or
    $NFE_INCEPTION_WEIGHTS, or (tests) a keyed random init."""
    import os

    if params is None:
        path = os.environ.get("NFE_INCEPTION_WEIGHTS")
        if path and os.path.exists(path):
            import torch

            params = convert_inception_state_dict(
                torch.load(path, map_location="cpu"))
        else:
            raise RuntimeError(
                "inception_features_fn_jax needs params or "
                "$NFE_INCEPTION_WEIGHTS (torchvision inception_v3 state_dict)")

    fwd = jax.jit(lambda imgs: inception_features(params, imgs))

    def fn(imgs: np.ndarray) -> np.ndarray:
        x = jnp.asarray(imgs.transpose(0, 3, 1, 2).astype(np.float32))
        return np.asarray(fwd(x))

    return fn


def inception_probs_fn_jax(params: Optional[Dict] = None):
    """Like inception_features_fn_jax but returns the classifier softmax
    (N, 1000) — the Inception-Score input. Requires the fc head (kept by
    convert_inception_state_dict; present in init_inception fixtures)."""
    import os

    if params is None:
        path = os.environ.get("NFE_INCEPTION_WEIGHTS")
        if path and os.path.exists(path):
            import torch

            params = convert_inception_state_dict(
                torch.load(path, map_location="cpu"))
        else:
            raise RuntimeError(
                "inception_probs_fn_jax needs params or "
                "$NFE_INCEPTION_WEIGHTS (torchvision inception_v3 state_dict)")
    if "fc" not in params:
        raise RuntimeError("inception params lack the fc classifier head "
                           "needed for IS (reconvert with a full state_dict)")

    fwd = jax.jit(lambda imgs: inception_probs(params, imgs))

    def fn(imgs: np.ndarray) -> np.ndarray:
        x = jnp.asarray(imgs.transpose(0, 3, 1, 2).astype(np.float32))
        return np.asarray(fwd(x))

    return fn
