"""StyleGAN2 mapping + synthesis networks (the tri-plane backbone).

Functional rebuild of ref training/networks_stylegan2.py:193-552 for TPU:
stateless pytree parameters, explicit RNG, NCHW fp32/bf16 activations (the
reference's fp16-per-resolution scheme is replaced by a single activation
dtype — on TPU, bf16 feeds the MXU directly and needs no conv_clamp).

The w_avg buffer (truncation anchor) is part of the mapping params; training
updates it functionally (new params out), inference reads it.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import setup_filter, upsample2d
from .layers import (
    fully_connected,
    init_fully_connected,
    init_synthesis_layer,
    init_torgb_layer,
    normalize_2nd_moment,
    synthesis_layer,
    torgb_layer,
)


# ---------------------------------------------------------------------------
# Channel schedule (ref: networks_stylegan2.py:486-488)

def block_resolutions(img_resolution: int) -> Sequence[int]:
    return [2**i for i in range(2, int(math.log2(img_resolution)) + 1)]


def channels_dict(img_resolution: int, channel_base: int = 32768, channel_max: int = 512):
    return {res: min(channel_base // res, channel_max) for res in block_resolutions(img_resolution)}


def num_synthesis_ws(img_resolution: int) -> int:
    """Number of w vectors consumed by the synthesis network: one per conv
    (2 per block except the 4×4 block's single conv) plus the final ToRGB
    (ref: networks_stylegan2.py:490-500)."""
    n_blocks = len(block_resolutions(img_resolution))
    return (2 * n_blocks - 1) + 1


# ---------------------------------------------------------------------------
# MappingNetwork (ref: networks_stylegan2.py:193-268)

def init_mapping(key, z_dim: int, c_dim: int, w_dim: int, num_ws: int,
                 num_layers: int = 8, embed_features: Optional[int] = None,
                 lr_multiplier: float = 0.01):
    if embed_features is None:
        embed_features = w_dim
    if c_dim == 0:
        embed_features = 0
    features = [z_dim + embed_features] + [w_dim] * (num_layers - 1) + [w_dim]

    keys = jax.random.split(key, num_layers + 1)
    params: Dict = {}
    if c_dim > 0:
        params["embed"] = init_fully_connected(keys[-1], c_dim, embed_features)
    for idx in range(num_layers):
        params[f"fc{idx}"] = init_fully_connected(
            keys[idx], features[idx], features[idx + 1], lr_multiplier=lr_multiplier
        )
    params["w_avg"] = jnp.zeros((w_dim,), jnp.float32)
    return params


def mapping_apply(params, z, c, *, num_ws: int, num_layers: int,
                  lr_multiplier: float = 0.01,
                  truncation_psi: float = 1.0,
                  truncation_cutoff: Optional[int] = None):
    """z, c → broadcast ws (B, num_ws, w_dim). Truncation lerps toward w_avg
    (ref: networks_stylegan2.py:233-268)."""
    x = None
    if z is not None and z.shape[-1] > 0:
        x = normalize_2nd_moment(z.astype(jnp.float32))
    if "embed" in params:
        y = normalize_2nd_moment(fully_connected(params["embed"], c.astype(jnp.float32)))
        x = jnp.concatenate([x, y], axis=1) if x is not None else y

    for idx in range(num_layers):
        x = fully_connected(params[f"fc{idx}"], x, activation="lrelu",
                            lr_multiplier=lr_multiplier)

    if not num_ws:
        # num_ws=None/0: no broadcast — the conditioning-map case
        # (ref networks_stylegan2.py:777 D mapping with num_ws=None).
        return x

    ws = jnp.tile(x[:, jnp.newaxis], (1, num_ws, 1))
    if truncation_psi != 1.0:
        w_avg = params["w_avg"]
        truncated = w_avg + truncation_psi * (ws - w_avg)
        if truncation_cutoff is None:
            ws = truncated
        else:
            layer_idx = jnp.arange(num_ws)[jnp.newaxis, :, jnp.newaxis]
            ws = jnp.where(layer_idx < truncation_cutoff, truncated, ws)
    return ws


def mapping_update_w_avg(params, ws_or_w, beta: float = 0.998):
    """Functional w_avg EMA update (ref: networks_stylegan2.py:251-253):
    w_avg ← lerp(mean(w), w_avg, beta). Returns updated params."""
    w = ws_or_w if ws_or_w.ndim == 2 else ws_or_w[:, 0]
    mean_w = jnp.mean(jax.lax.stop_gradient(w), axis=0)
    new_avg = mean_w + beta * (params["w_avg"] - mean_w)
    return {**params, "w_avg": new_avg}


# ---------------------------------------------------------------------------
# SynthesisBlock / SynthesisNetwork (ref: networks_stylegan2.py:365-518)

def init_synthesis_block(key, in_channels: int, out_channels: int, w_dim: int,
                         resolution: int, img_channels: int, is_last: bool,
                         architecture: str = "skip"):
    keys = jax.random.split(key, 4)
    params: Dict = {}
    if in_channels == 0:
        params["const"] = jax.random.normal(
            keys[0], (out_channels, resolution, resolution), jnp.float32
        )
    else:
        params["conv0"] = init_synthesis_layer(
            keys[1], in_channels, out_channels, w_dim, resolution
        )
    params["conv1"] = init_synthesis_layer(keys[2], out_channels, out_channels, w_dim, resolution)
    if is_last or architecture == "skip":
        params["torgb"] = init_torgb_layer(keys[3], out_channels, img_channels, w_dim)
    return params


def synthesis_block(params, x, img, ws_block, *, resolution: int,
                    architecture: str = "skip",
                    resample_filter: Optional[jax.Array] = None,
                    conv_clamp: Optional[float] = None,
                    noise_mode: str = "const",
                    rng: Optional[jax.Array] = None,
                    up: bool = True,
                    dtype=jnp.float32,
                    channels_last: bool = False):
    """One resolution block: (up-)conv0 → conv1 → skip-accumulated ToRGB.

    ws_block is (B, n_ws_used, w_dim); order: conv0 (if present), conv1,
    torgb (if present) — matching the reference's w_iter consumption
    (ref: networks_stylegan2.py:417-457). `up=False` gives the
    SynthesisBlockNoUp variant (ref: superresolution.py:158-257).
    """
    assert architecture == "skip", "only the 'skip' architecture is used by EG3D generators"
    w_idx = 0
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

    if "const" in params:
        const = params["const"].astype(dtype)
        if channels_last:
            const = const.transpose(1, 2, 0)
        x = jnp.tile(const[jnp.newaxis], (ws_block.shape[0], 1, 1, 1))
    else:
        x = x.astype(dtype)
        x = synthesis_layer(
            params["conv0"], x, ws_block[:, w_idx], resolution=resolution,
            up=2 if up else 1, resample_filter=resample_filter if up else None,
            conv_clamp=conv_clamp, noise_mode=noise_mode, rng=rngs[0],
            channels_last=channels_last,
        )
        w_idx += 1

    x = synthesis_layer(
        params["conv1"], x, ws_block[:, w_idx], resolution=resolution,
        conv_clamp=conv_clamp, noise_mode=noise_mode, rng=rngs[1],
        channels_last=channels_last,
    )
    w_idx += 1

    if img is not None and up:
        img = upsample2d(img, resample_filter, channels_last=channels_last)
    if "torgb" in params:
        y = torgb_layer(params["torgb"], x, ws_block[:, w_idx], conv_clamp=conv_clamp,
                        channels_last=channels_last)
        y = y.astype(jnp.float32)
        img = img + y if img is not None else y
    return x, img


def init_synthesis_network(key, w_dim: int, img_resolution: int, img_channels: int,
                           channel_base: int = 32768, channel_max: int = 512):
    resolutions = block_resolutions(img_resolution)
    channels = channels_dict(img_resolution, channel_base, channel_max)
    keys = jax.random.split(key, len(resolutions))
    params: Dict = {}
    for k, res in zip(keys, resolutions):
        in_ch = channels[res // 2] if res > 4 else 0
        params[f"b{res}"] = init_synthesis_block(
            k, in_ch, channels[res], w_dim, res, img_channels,
            is_last=(res == img_resolution),
        )
    return params


def synthesis_network(params, ws, *, img_resolution: int,
                      resample_filter: Optional[jax.Array] = None,
                      conv_clamp: Optional[float] = None,
                      noise_mode: str = "const",
                      rng: Optional[jax.Array] = None,
                      dtype=jnp.float32):
    """ws (B, num_ws, w_dim) → image (B, img_channels, R, R) float32.

    w assignment matches ref networks_stylegan2.py:503-517: block at index i
    consumes ws starting at 2i-1 (4×4 block: conv1=ws0, torgb=ws1; later
    blocks: conv0, conv1, torgb with torgb sharing the next block's first w).
    """
    if resample_filter is None:
        resample_filter = setup_filter([1, 3, 3, 1])
    resolutions = block_resolutions(img_resolution)
    num_ws = num_synthesis_ws(img_resolution)
    assert ws.shape[1] == num_ws

    ws = ws.astype(jnp.float32)
    x = img = None
    w_idx = 0
    rngs = jax.random.split(rng, len(resolutions)) if rng is not None else [None] * len(resolutions)
    for res, block_rng in zip(resolutions, rngs):
        block = params[f"b{res}"]
        n_conv = 1 if res == 4 else 2
        ws_block = ws[:, w_idx : w_idx + n_conv + 1]  # conv ws + torgb w
        x, img = synthesis_block(
            block, x, img, ws_block, resolution=res,
            resample_filter=resample_filter, conv_clamp=conv_clamp,
            noise_mode=noise_mode, rng=block_rng, dtype=dtype,
        )
        w_idx += n_conv
    return img
