"""Core StyleGAN2 layers as functional pytree modules.

Conventions (used throughout the framework):

* Parameters are plain nested dicts of arrays whose leaf names mirror the
  reference torch module attributes ('weight', 'bias', 'noise_const', ...),
  so the torch-pickle converter (io/torch_converter.py) is a near-identity
  mapping. Conv weights keep the torch (O, I, kh, kw) layout; FC weights
  keep (out, in).
* `init_*` functions build parameters from a PRNG key; `*_apply` functions
  are pure and jit-safe. Static hyperparameters (channel counts, activation
  names, resampling factors) are passed explicitly and baked into the trace.
* Equalized learning rate: weights are stored at unit scale and multiplied
  by `gain = lr_multiplier / sqrt(fan_in)` at run time
  (ref: training/networks_stylegan2.py:96-127).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import bias_act, modulated_conv2d, conv2d_resample, setup_filter
from ..ops.bias_act import activation_funcs


# ---------------------------------------------------------------------------
# FullyConnectedLayer (ref: networks_stylegan2.py:96-130)

def init_fully_connected(key, in_features: int, out_features: int, bias: bool = True,
                         lr_multiplier: float = 1.0, bias_init: float = 0.0):
    params = {
        "weight": jax.random.normal(key, (out_features, in_features), jnp.float32)
        / lr_multiplier
    }
    if bias:
        params["bias"] = jnp.full((out_features,), float(bias_init), jnp.float32)
    return params


def fully_connected(params, x, activation: str = "linear", lr_multiplier: float = 1.0):
    """y = act((x @ wᵀ)·gain + b·lr_mult); gain = lr_mult/sqrt(fan_in)."""
    w = params["weight"]
    weight_gain = lr_multiplier / math.sqrt(w.shape[1])
    b = params.get("bias")
    if b is not None and lr_multiplier != 1.0:
        b = b * lr_multiplier
    y = x @ (w.astype(x.dtype).T * jnp.asarray(weight_gain, x.dtype))
    # Features live on the last axis (inputs may be (B, C) or (B, M, C)).
    return bias_act(y, None if b is None else b.astype(x.dtype), act=activation,
                    dim=y.ndim - 1)


def normalize_2nd_moment(x, axis: int = 1, eps: float = 1e-8):
    """ref: networks_stylegan2.py:27-29."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


# ---------------------------------------------------------------------------
# Conv2dLayer — unmodulated conv with optional resampling
# (ref: networks_stylegan2.py:135-188)

def init_conv2d_layer(key, in_channels: int, out_channels: int, kernel_size: int,
                      bias: bool = True):
    params = {
        "weight": jax.random.normal(
            key, (out_channels, in_channels, kernel_size, kernel_size), jnp.float32
        )
    }
    if bias:
        params["bias"] = jnp.zeros((out_channels,), jnp.float32)
    return params


def conv2d_layer(params, x, *, activation: str = "linear", up: int = 1, down: int = 1,
                 resample_filter: Optional[jax.Array] = None,
                 conv_clamp: Optional[float] = None, gain: float = 1.0,
                 channels_last: bool = False):
    w = params["weight"]
    kh = w.shape[2]
    weight_gain = 1.0 / math.sqrt(w.shape[1] * kh * kh)
    act_gain = activation_funcs[activation].def_gain * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    x = conv2d_resample(
        x, (w * weight_gain).astype(x.dtype), f=resample_filter, up=up, down=down,
        padding=kh // 2, flip_weight=(up == 1), channels_last=channels_last,
    )
    b = params.get("bias")
    return bias_act(x, None if b is None else b.astype(x.dtype), act=activation,
                    gain=act_gain, clamp=act_clamp,
                    dim=3 if channels_last else 1)


# ---------------------------------------------------------------------------
# SynthesisLayer — modulated conv + noise + activation
# (ref: networks_stylegan2.py:276-335)

def init_synthesis_layer(key, in_channels: int, out_channels: int, w_dim: int,
                         resolution: int, kernel_size: int = 3, use_noise: bool = True):
    k_affine, k_weight, k_noise = jax.random.split(key, 3)
    params = {
        "affine": init_fully_connected(k_affine, w_dim, in_channels, bias_init=1.0),
        "weight": jax.random.normal(
            k_weight, (out_channels, in_channels, kernel_size, kernel_size), jnp.float32
        ),
        "bias": jnp.zeros((out_channels,), jnp.float32),
    }
    if use_noise:
        params["noise_const"] = jax.random.normal(k_noise, (resolution, resolution), jnp.float32)
        params["noise_strength"] = jnp.zeros((), jnp.float32)
    return params


def synthesis_layer(params, x, w, *, resolution: int, up: int = 1,
                    activation: str = "lrelu",
                    resample_filter: Optional[jax.Array] = None,
                    conv_clamp: Optional[float] = None,
                    noise_mode: str = "const",
                    rng: Optional[jax.Array] = None,
                    gain: float = 1.0,
                    channels_last: bool = False):
    assert noise_mode in ("random", "const", "none")
    styles = fully_connected(params["affine"], w)

    noise = None
    if "noise_const" in params and noise_mode == "random":
        assert rng is not None, "noise_mode='random' requires an rng key"
        nshape = ((x.shape[0], resolution, resolution, 1) if channels_last
                  else (x.shape[0], 1, resolution, resolution))
        noise = (jax.random.normal(rng, nshape, x.dtype)
                 * params["noise_strength"].astype(x.dtype))
    elif "noise_const" in params and noise_mode == "const":
        noise = params["noise_const"].astype(x.dtype) * params["noise_strength"].astype(x.dtype)
        if channels_last:
            noise = noise[:, :, jnp.newaxis]  # (R, R, 1) broadcast over C

    x = modulated_conv2d(
        x, params["weight"], styles, noise=noise, up=up,
        padding=params["weight"].shape[2] // 2, resample_filter=resample_filter,
        flip_weight=(up == 1), channels_last=channels_last,
    )
    act_gain = activation_funcs[activation].def_gain * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    return bias_act(x, params["bias"].astype(x.dtype), act=activation,
                    gain=act_gain, clamp=act_clamp,
                    dim=3 if channels_last else 1)


# ---------------------------------------------------------------------------
# ToRGBLayer (ref: networks_stylegan2.py:340-360)

def init_torgb_layer(key, in_channels: int, out_channels: int, w_dim: int,
                     kernel_size: int = 1):
    k_affine, k_weight = jax.random.split(key)
    return {
        "affine": init_fully_connected(k_affine, w_dim, in_channels, bias_init=1.0),
        "weight": jax.random.normal(
            k_weight, (out_channels, in_channels, kernel_size, kernel_size), jnp.float32
        ),
        "bias": jnp.zeros((out_channels,), jnp.float32),
    }


def torgb_layer(params, x, w, *, conv_clamp: Optional[float] = None,
                channels_last: bool = False):
    in_channels = params["weight"].shape[1]
    kh = params["weight"].shape[2]
    weight_gain = 1.0 / math.sqrt(in_channels * kh * kh)
    styles = fully_connected(params["affine"], w) * weight_gain
    x = modulated_conv2d(x, params["weight"], styles, demodulate=False,
                         channels_last=channels_last)
    return bias_act(x, params["bias"].astype(x.dtype), clamp=conv_clamp,
                    dim=3 if channels_last else 1)


# ---------------------------------------------------------------------------
# MinibatchStdLayer (ref: networks_stylegan2.py:646-670)

def minibatch_std_layer(x, group_size: Optional[int] = 4, num_channels: int = 1):
    N, C, H, W = x.shape
    G = min(group_size, N) if group_size is not None else N
    F_ = num_channels
    c = C // F_
    y = x.reshape(G, -1, F_, c, H, W)
    y = y - jnp.mean(y, axis=0)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4))
    y = y.reshape(-1, F_, 1, 1)
    y = jnp.tile(y, (G, 1, H, W))
    return jnp.concatenate([x, y.astype(x.dtype)], axis=1)
