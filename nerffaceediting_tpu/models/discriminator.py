"""Dual discriminator (rebuild of ref training/dual_discriminator.py +
networks_stylegan2.py:557-794).

The dual input concatenates the SR image with the raw neural render
bilinearly lifted to full resolution (ref dual_discriminator.py:157-158) so
the discriminator supervises both scales. Architecture is the StyleGAN2
resnet discriminator; fp16-per-resolution is replaced by an activation dtype
argument (bf16 on TPU).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import DiscriminatorConfig
from ..ops import resize_bilinear, setup_filter, upsample2d, downsample2d
from .layers import (
    conv2d_layer,
    fully_connected,
    init_conv2d_layer,
    init_fully_connected,
    minibatch_std_layer,
)
from .stylegan2 import block_resolutions, init_mapping, mapping_apply


def filtered_resizing(image: jax.Array, size: int, f: Optional[jax.Array] = None,
                      filter_mode="antialiased") -> jax.Array:
    """Resize real/raw images for the dual input
    (ref: dual_discriminator.py:86-102)."""
    if filter_mode == "antialiased":
        return resize_bilinear(image, size, antialias=True)
    if filter_mode == "none":
        return resize_bilinear(image, size, antialias=False)
    if filter_mode == "classic":
        x = upsample2d(image, f, up=2)
        x = resize_bilinear(x, size * 2 + 2, antialias=False)
        return downsample2d(x, f, down=2, flip_filter=True, padding=-1)
    if isinstance(filter_mode, float):
        assert 0 < filter_mode < 1
        filtered = resize_bilinear(image, size, antialias=True)
        aliased = resize_bilinear(image, size, antialias=False)
        return (1 - filter_mode) * aliased + filter_mode * filtered
    raise ValueError(f"unknown filter_mode {filter_mode!r}")


# ---------------------------------------------------------------------------
# Blocks (ref: networks_stylegan2.py:557-641)

def init_discriminator_block(key, in_channels: int, tmp_channels: int,
                             out_channels: int, img_channels: int,
                             has_fromrgb: bool):
    keys = jax.random.split(key, 4)
    params: Dict = {}
    if has_fromrgb:
        params["fromrgb"] = init_conv2d_layer(keys[0], img_channels, tmp_channels, 1)
    params["conv0"] = init_conv2d_layer(keys[1], tmp_channels, tmp_channels, 3)
    params["conv1"] = init_conv2d_layer(keys[2], tmp_channels, out_channels, 3)
    params["skip"] = init_conv2d_layer(keys[3], tmp_channels, out_channels, 1, bias=False)
    return params


def discriminator_block(params, x, img, *, resample_filter, conv_clamp=None,
                        dtype=jnp.float32):
    """resnet architecture block: fromrgb (first block) → conv0 →
    down-conv1 with 1×1 down-skip."""
    if x is not None:
        x = x.astype(dtype)
    if "fromrgb" in params:
        img = img.astype(dtype)
        y = conv2d_layer(params["fromrgb"], img, activation="lrelu", conv_clamp=conv_clamp)
        x = x + y if x is not None else y
    y = conv2d_layer(params["skip"], x, down=2, resample_filter=resample_filter,
                     gain=math.sqrt(0.5))
    x = conv2d_layer(params["conv0"], x, activation="lrelu", conv_clamp=conv_clamp)
    x = conv2d_layer(params["conv1"], x, activation="lrelu", down=2,
                     resample_filter=resample_filter, conv_clamp=conv_clamp,
                     gain=math.sqrt(0.5))
    return y + x, img


def init_discriminator_epilogue(key, in_channels: int, cmap_dim: int,
                                mbstd_num_channels: int = 1, resolution: int = 4):
    k_conv, k_fc, k_out = jax.random.split(key, 3)
    return {
        "conv": init_conv2d_layer(k_conv, in_channels + mbstd_num_channels, in_channels, 3),
        "fc": init_fully_connected(k_fc, in_channels * resolution**2, in_channels),
        "out": init_fully_connected(k_out, in_channels, 1 if cmap_dim == 0 else cmap_dim),
    }


def discriminator_epilogue(params, x, cmap, *, mbstd_group_size=4,
                           mbstd_num_channels=1, conv_clamp=None):
    """ref networks_stylegan2.py:675-728 (fp32 always)."""
    x = x.astype(jnp.float32)
    if mbstd_num_channels > 0:
        x = minibatch_std_layer(x, mbstd_group_size, mbstd_num_channels)
    x = conv2d_layer(params["conv"], x, activation="lrelu", conv_clamp=conv_clamp)
    x = fully_connected(params["fc"], x.reshape(x.shape[0], -1), activation="lrelu")
    x = fully_connected(params["out"], x)
    if cmap is not None:
        cmap_dim = cmap.shape[1]
        x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1 / math.sqrt(cmap_dim))
    return x


# ---------------------------------------------------------------------------
# DualDiscriminator (ref: dual_discriminator.py:107-174)

def init_dual_discriminator(key, cfg: DiscriminatorConfig) -> Dict:
    img_channels = cfg.img_channels * 2  # dual input (ref :124)
    resolutions = [2**i for i in range(int(math.log2(cfg.img_resolution)), 2, -1)]
    chans = {res: min(cfg.channel_base // res, cfg.channel_max)
             for res in resolutions + [4]}
    cmap_dim = cfg.cmap_dim if cfg.cmap_dim is not None else chans[4]
    if cfg.c_dim == 0:
        cmap_dim = 0

    keys = jax.random.split(key, len(resolutions) + 2)
    params: Dict = {}
    for i, res in enumerate(resolutions):
        in_ch = chans[res] if res < cfg.img_resolution else 0
        params[f"b{res}"] = init_discriminator_block(
            keys[i], in_ch, chans[res], chans[res // 2], img_channels,
            has_fromrgb=(res == cfg.img_resolution),
        )
    if cfg.c_dim > 0:
        params["mapping"] = init_mapping(
            keys[-2], z_dim=0, c_dim=cfg.c_dim, w_dim=cmap_dim, num_ws=0, num_layers=8
        )
        del params["mapping"]["w_avg"]
    params["b4"] = init_discriminator_epilogue(keys[-1], chans[4], cmap_dim)
    return params


def single_discriminator(params, img_sr, img_raw, c, cfg: DiscriminatorConfig, *,
                         rng: Optional[jax.Array] = None,
                         dtype=jnp.float32) -> jax.Array:
    """SingleDiscriminator (ref dual_discriminator.py:21-80): ignores the raw
    render, discriminates the SR image alone. Init with
    init_dual_discriminator on a config whose img_channels is NOT doubled —
    use init_single_discriminator."""
    f = setup_filter([1, 3, 3, 1])
    resolutions = [2**i for i in range(int(math.log2(cfg.img_resolution)), 2, -1)]
    x, img = None, img_sr
    for res in resolutions:
        x, img = discriminator_block(
            params[f"b{res}"], x, img, resample_filter=f,
            conv_clamp=cfg.conv_clamp, dtype=dtype,
        )
        img = None
    cmap = None
    if "mapping" in params:
        cmap = mapping_apply(params["mapping"], None, c, num_ws=0, num_layers=8)
    return discriminator_epilogue(
        params["b4"], x, cmap, mbstd_group_size=cfg.mbstd_group_size,
        mbstd_num_channels=cfg.mbstd_num_channels, conv_clamp=cfg.conv_clamp,
    )


def init_single_discriminator(key, cfg: DiscriminatorConfig):
    """Single-input variant: same trunk, 3-channel fromrgb."""
    import dataclasses as _dc

    half = _dc.replace(cfg)  # img_channels not doubled
    params = init_dual_discriminator(key, half)
    # rebuild the top fromrgb for 3 channels
    resolutions = [2**i for i in range(int(math.log2(cfg.img_resolution)), 2, -1)]
    top = resolutions[0]
    chans = min(cfg.channel_base // top, cfg.channel_max)
    params[f"b{top}"]["fromrgb"] = init_conv2d_layer(key, cfg.img_channels, chans, 1)
    return params


def dummy_dual_discriminator(params, img_sr, img_raw, c, cfg: DiscriminatorConfig,
                             raw_fade: float = 1.0, *,
                             rng: Optional[jax.Array] = None,
                             dtype=jnp.float32) -> jax.Array:
    """DummyDualDiscriminator (ref dual_discriminator.py:179-244): dual input
    whose raw channel fades out over training (raw_fade 1→0), for ablating
    dual discrimination."""
    f = setup_filter([1, 3, 3, 1])
    raw_up = filtered_resizing(img_raw, img_sr.shape[-1], f, "antialiased") * raw_fade
    return dual_discriminator(params, img_sr, raw_up, c, cfg, filter_mode="none",
                              rng=rng, dtype=dtype)


def dual_discriminator(params, img_sr, img_raw, c, cfg: DiscriminatorConfig, *,
                       filter_mode="antialiased",
                       rng: Optional[jax.Array] = None,
                       dtype=jnp.float32) -> jax.Array:
    """(SR image, raw render, camera label) → realism logits (B, 1).

    Raw render is lifted to full resolution and concatenated channelwise
    (ref: dual_discriminator.py:156-171); disc_c_noise corrupts the pose
    conditioning before the cmap projection (ref :168).
    """
    f = setup_filter([1, 3, 3, 1])
    raw_up = filtered_resizing(img_raw, img_sr.shape[-1], f, filter_mode)
    img = jnp.concatenate([img_sr, raw_up], axis=1)

    resolutions = [2**i for i in range(int(math.log2(cfg.img_resolution)), 2, -1)]
    x = None
    for res in resolutions:
        x, img = discriminator_block(
            params[f"b{res}"], x, img, resample_filter=f,
            conv_clamp=cfg.conv_clamp, dtype=dtype,
        )
        img = None  # fromrgb only at the top block (resnet architecture)

    cmap = None
    if "mapping" in params:
        if cfg.disc_c_noise > 0:
            assert rng is not None
            c = c + jax.random.normal(rng, c.shape, c.dtype) * (
                jnp.std(c, axis=0, keepdims=True) * cfg.disc_c_noise
            )
        cmap = mapping_apply(params["mapping"], None, c, num_ws=0, num_layers=8)
    return discriminator_epilogue(
        params["b4"], x, cmap, mbstd_group_size=cfg.mbstd_group_size,
        mbstd_num_channels=cfg.mbstd_num_channels, conv_clamp=cfg.conv_clamp,
    )


def freeze_d_mask(d_params: Dict, cfg: DiscriminatorConfig) -> Dict:
    """Freeze-D (ref networks_stylegan2.py:585-607, --freezed): a boolean
    pytree matching d_params with False on the first cfg.freezed conv layers
    counted from the top-resolution block downwards (fromrgb → conv0 →
    conv1 → skip per block — the reference's trainable_iter threads through
    all four, so the resnet skip conv freezes with its block and the
    first_layer_idx counting stays aligned for freezed ≥ 4). The optimizer
    step zeroes gradients where the mask is False."""
    mask = jax.tree.map(lambda _: True, d_params)
    if cfg.freezed <= 0:
        return mask
    layer_idx = 0
    res = cfg.img_resolution
    while res > 4:
        block = d_params.get(f"b{res}", {})
        for layer in ("fromrgb", "conv0", "conv1", "skip"):
            if layer in block:
                if layer_idx < cfg.freezed:
                    mask[f"b{res}"][layer] = jax.tree.map(
                        lambda _: False, block[layer])
                layer_idx += 1
        res //= 2
    return mask
