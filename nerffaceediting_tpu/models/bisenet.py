"""BiSeNet face parser (19 classes), frozen-inference JAX rebuild.

Rebuild of ref external_dependencies/face_parsing/model.py:230-272 +
resnet.py:58-99: ResNet18 backbone → ContextPath (ARM16/ARM32 attention +
global-context head) → FeatureFusionModule → 19-class output head, all
outputs bilinearly (align_corners=True) lifted to input resolution.

Used frozen inside the training loss (ref loss.py:202-204) and by the
geometry-editing workflow to produce target masks. BatchNorm therefore runs
in inference mode (running statistics folded into scale/shift) — the
reference's inplace_abn CUDA op is explicitly NOT needed (SURVEY §2.1).

Parameter pytree keys mirror the torch state_dict ('cp.resnet.conv1.weight'
etc. nested on '.'), so the published 79999_iter.pth converts by re-nesting
alone (io/torch_converter.convert_bisenet_state_dict).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.precision import get_precision

BN_EPS = 1e-5
# ImageNet normalization applied before parsing (ref loss.py:204) on images
# already mapped from (−1,1) to (0,1).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv(x, w, stride=1, padding=0):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision(),
    )


def _bn(p, x):
    scale = p["weight"] * lax.rsqrt(p["running_var"] + BN_EPS)
    shift = p["bias"] - p["running_mean"] * scale
    return x * scale.reshape(1, -1, 1, 1).astype(x.dtype) + shift.reshape(1, -1, 1, 1).astype(x.dtype)


def _conv_bn_relu(p, x, stride=1, padding=1):
    return jax.nn.relu(_bn(p["bn"], _conv(x, p["conv"]["weight"], stride, padding)))


def _basic_block(p, x, stride=1):
    r = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"]["weight"], stride, 1)))
    r = _bn(p["bn2"], _conv(r, p["conv2"]["weight"], 1, 1))
    sc = x
    if "downsample" in p:
        sc = _bn(p["downsample"]["1"], _conv(x, p["downsample"]["0"]["weight"], stride, 0))
    return jax.nn.relu(sc + r)


def _max_pool_3x3_s2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)),
    )


def _resnet18(p, x):
    x = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"]["weight"], 2, 3)))
    x = _max_pool_3x3_s2(x)
    for blk in ("0", "1"):
        x = _basic_block(p["layer1"][blk], x)
    f8 = x
    f8 = _basic_block(p["layer2"]["0"], f8, stride=2)
    f8 = _basic_block(p["layer2"]["1"], f8)
    f16 = _basic_block(p["layer3"]["0"], f8, stride=2)
    f16 = _basic_block(p["layer3"]["1"], f16)
    f32 = _basic_block(p["layer4"]["0"], f16, stride=2)
    f32 = _basic_block(p["layer4"]["1"], f32)
    return f8, f16, f32


def _global_avg(x):
    return jnp.mean(x, axis=(2, 3), keepdims=True)


def _arm(p, x):
    """AttentionRefinementModule (ref model.py:67-89)."""
    feat = _conv_bn_relu(p["conv"], x)
    atten = _global_avg(feat)
    atten = _bn(p["bn_atten"], _conv(atten, p["conv_atten"]["weight"]))
    return feat * jax.nn.sigmoid(atten)


def _resize_nearest(x, hw: Tuple[int, int]):
    B, C, H, W = x.shape
    return jax.image.resize(x, (B, C, hw[0], hw[1]), method="nearest")


def _resize_bilinear_ac(x, hw: Tuple[int, int]):
    """align_corners=True bilinear (ref model.py:254-256): sample positions
    i*(in−1)/(out−1) — jax.image has no such mode, so gather explicitly."""
    B, C, H, W = x.shape
    oh, ow = hw

    def axis_weights(in_size, out_size):
        if out_size == 1 or in_size == 1:
            idx0 = jnp.zeros((out_size,), jnp.int32)
            return idx0, idx0, jnp.ones((out_size,), jnp.float32)
        pos = jnp.arange(out_size) * (in_size - 1) / (out_size - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 2)
        frac = pos - i0
        return i0, i0 + 1, 1.0 - frac.astype(jnp.float32)

    y0, y1, wy = axis_weights(H, oh)
    x0, x1, wx = axis_weights(W, ow)
    top = x[:, :, y0][:, :, :, x0] * wx + x[:, :, y0][:, :, :, x1] * (1 - wx)
    bot = x[:, :, y1][:, :, :, x0] * wx + x[:, :, y1][:, :, :, x1] * (1 - wx)
    return top * wy[:, None] + bot * (1 - wy[:, None])


def _context_path(p, x):
    """ref model.py:92-142."""
    f8, f16, f32 = _resnet18(p["resnet"], x)
    h8w8 = f8.shape[2:]
    h16w16 = f16.shape[2:]
    h32w32 = f32.shape[2:]

    avg = _conv_bn_relu(p["conv_avg"], _global_avg(f32), padding=0)
    avg_up = _resize_nearest(avg, h32w32)

    f32_sum = _arm(p["arm32"], f32) + avg_up
    f32_up = _conv_bn_relu(p["conv_head32"], _resize_nearest(f32_sum, h16w16))

    f16_sum = _arm(p["arm16"], f16) + f32_up
    f16_up = _conv_bn_relu(p["conv_head16"], _resize_nearest(f16_sum, h8w8))

    return f8, f16_up, f32_up


def _ffm(p, fsp, fcp):
    """FeatureFusionModule (ref model.py:181-211)."""
    feat = _conv_bn_relu(p["convblk"], jnp.concatenate([fsp, fcp], axis=1), padding=0)
    atten = _global_avg(feat)
    atten = jax.nn.relu(_conv(atten, p["conv1"]["weight"]))
    atten = jax.nn.sigmoid(_conv(atten, p["conv2"]["weight"]))
    return feat * atten + feat


def _output_head(p, x):
    x = _conv_bn_relu(p["conv"], x)
    return _conv(x, p["conv_out"]["weight"])


def bisenet_apply(params: Dict, img: jax.Array, main_only: bool = True,
                  rescale_01: bool = False):
    """img (B, 3, H, W) in (−1, 1) → 19-class logits (B, 19, H, W).

    Preprocessing matches ref loss.py:204 bit-for-bit: ImageNet
    Normalize((0.485,0.456,0.406),(0.229,0.224,0.225)) applied DIRECTLY to
    the clamped (−1,1) image — the reference does NOT rescale to (0,1)
    first (the parser was trained on (0,1) inputs, but the training loss
    consumed it this way, so parity requires reproducing it). Set
    ``rescale_01=True`` for the standards-correct (0,1) preprocessing when
    using the parser standalone. Returns only the main head by default
    (the loss uses face2seg(x)[0], ref loss.py:204)."""
    x = jnp.clip(img, -1, 1)
    if rescale_01:
        x = x / 2.0 + 0.5
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, x.dtype).reshape(1, 3, 1, 1)
    x = (x - mean) / std

    H, W = img.shape[2:]
    f_res8, f_cp8, f_cp16 = _context_path(params["cp"], x)
    fused = _ffm(params["ffm"], f_res8, f_cp8)

    out = _resize_bilinear_ac(_output_head(params["conv_out"], fused), (H, W))
    if main_only:
        return out
    out16 = _resize_bilinear_ac(_output_head(params["conv_out16"], f_cp8), (H, W))
    out32 = _resize_bilinear_ac(_output_head(params["conv_out32"], f_cp16), (H, W))
    return out, out16, out32


def init_bisenet(key, n_classes: int = 19) -> Dict:
    """Random init mirroring the torch state_dict structure — for tests and
    as the merge target when loading the pretrained 79999_iter.pth."""
    import numpy as np

    rngs = iter(jax.random.split(key, 256))

    def conv(o, i, k):
        fan = i * k * k
        return {"weight": jax.random.normal(next(rngs), (o, i, k, k)) * (2.0 / fan) ** 0.5}

    def bn(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}

    def cbr(o, i, k):
        return {"conv": conv(o, i, k), "bn": bn(o)}

    def block(i, o, stride):
        p = {"conv1": conv(o, i, 3), "bn1": bn(o), "conv2": conv(o, o, 3), "bn2": bn(o)}
        if i != o or stride != 1:
            p["downsample"] = {"0": conv(o, i, 1), "1": bn(o)}
        return p

    def layer(i, o, stride):
        return {"0": block(i, o, stride), "1": block(o, o, 1)}

    resnet = {
        "conv1": conv(64, 3, 7), "bn1": bn(64),
        "layer1": layer(64, 64, 1), "layer2": layer(64, 128, 2),
        "layer3": layer(128, 256, 2), "layer4": layer(256, 512, 2),
    }
    cp = {
        "resnet": resnet,
        "arm16": {"conv": cbr(128, 256, 3), "conv_atten": conv(128, 128, 1), "bn_atten": bn(128)},
        "arm32": {"conv": cbr(128, 512, 3), "conv_atten": conv(128, 128, 1), "bn_atten": bn(128)},
        "conv_head32": cbr(128, 128, 3),
        "conv_head16": cbr(128, 128, 3),
        "conv_avg": cbr(128, 512, 1),
    }
    return {
        "cp": cp,
        "ffm": {"convblk": cbr(256, 256, 1), "conv1": conv(64, 256, 1), "conv2": conv(256, 64, 1)},
        "conv_out": {"conv": cbr(256, 256, 3), "conv_out": conv(n_classes, 256, 1)},
        "conv_out16": {"conv": cbr(64, 128, 3), "conv_out": conv(n_classes, 64, 1)},
        "conv_out32": {"conv": cbr(64, 128, 3), "conv_out": conv(n_classes, 64, 1)},
    }
