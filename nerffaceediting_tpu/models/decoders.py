"""Tri-plane feature decoders (σ / seg / rgb MLPs).

Rebuild of ref training/triplane.py:167-270. These 2-layer, 64-wide MLPs run
once per ray sample (~1.6M evaluations per frame) — they are fused into the
Pallas tri-plane render kernel on the hot path; this module is the reference
XLA implementation and the parameter container.

MipNeRF sigmoid clamp: rgb = sigmoid(x)·(1+2ε) − ε with ε=1e-3
(ref: triplane.py:188,269).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .layers import fully_connected, init_fully_connected

HIDDEN_DIM = 64  # ref: triplane.py:170,235


def _init_mlp(key, in_features: int, out_features: int):
    k0, k1 = jax.random.split(key)
    return {
        "fc0": init_fully_connected(k0, in_features, HIDDEN_DIM),
        "fc1": init_fully_connected(k1, HIDDEN_DIM, out_features),
    }


def _mlp(params, x, lr_multiplier: float = 1.0):
    x = fully_connected(params["fc0"], x, lr_multiplier=lr_multiplier)
    x = jax.nn.softplus(x)
    return fully_connected(params["fc1"], x, lr_multiplier=lr_multiplier)


def _sigmoid_clamp(x):
    return jax.nn.sigmoid(x) * (1 + 2 * 0.001) - 0.001


def init_osg_decoder(key, n_features: int = 32, output_dim: int = 32):
    """Original EG3D decoder: one net → (σ, rgb) (ref: triplane.py:167-176)."""
    return {"net": _init_mlp(key, n_features, 1 + output_dim)}


def osg_decoder(params, sampled_features, *, lr_multiplier: float = 1.0):
    """sampled_features (B, 3, M, C) → {'rgb': (B,M,out), 'sigma': (B,M,1)}."""
    x = jnp.mean(sampled_features, axis=1)  # aggregate over planes
    x = _mlp(params["net"], x, lr_multiplier)
    return {"rgb": _sigmoid_clamp(x[..., 1:]), "sigma": x[..., 0:1]}


def init_segmentation_osg_decoder(key, n_features: int = 32, output_dim: int = 32,
                                  seg_dim: int = 15):
    """Ablation decoder (disable_alignment): base net + parallel seg head,
    both on denormalized features (ref: triplane.py:192-230)."""
    k0, k1 = jax.random.split(key)
    return {
        "net": _init_mlp(k0, n_features, 1 + output_dim),
        "seg_net": _init_mlp(k1, n_features, seg_dim),
    }


def segmentation_osg_decoder(params, sampled_norm_features, sampled_denorm_features,
                             *, lr_multiplier: float = 1.0):
    x = jnp.mean(sampled_denorm_features, axis=1)
    y = _mlp(params["net"], x, lr_multiplier)
    seg = _mlp(params["seg_net"], x, lr_multiplier)
    return {"rgb": _sigmoid_clamp(y[..., 1:]), "sigma": y[..., 0:1], "seg": seg}


def init_disentangled_osg_decoder(key, n_features: int = 32, output_dim: int = 32,
                                  seg_dim: int = 15):
    """THE NeRFFaceEditing decoder (ref: triplane.py:232-270): geo_net emits
    σ+seg from *normalized* samples, app_net emits rgb features from
    *denormalized* samples."""
    k_geo, k_app = jax.random.split(key)
    return {
        "geo_net": _init_mlp(k_geo, n_features, 1 + seg_dim),
        "app_net": _init_mlp(k_app, n_features, output_dim),
    }


def disentangled_osg_decoder(params, sampled_norm_features, sampled_denorm_features,
                             *, lr_multiplier: float = 1.0):
    """(B, 3, M, C) norm/denorm plane samples →
    {'rgb': (B,M,32), 'sigma': (B,M,1), 'seg': (B,M,15)}."""
    xn = jnp.mean(sampled_norm_features, axis=1)
    xd = jnp.mean(sampled_denorm_features, axis=1)
    g = _mlp(params["geo_net"], xn, lr_multiplier)
    rgb = _mlp(params["app_net"], xd, lr_multiplier)
    return {
        "rgb": _sigmoid_clamp(rgb),
        "sigma": g[..., 0:1],
        "seg": g[..., 1:],
    }
