"""CLIP ViT-B/32 vision tower in pure JAX — the FID-CLIP detector.

The reference scores FID-CLIP with OpenAI CLIP ViT-B/32 image features
(ref metrics/metric_utils.py:45-63 `get_feature_detector` 'clip' branch,
frechet_inception_distance.py:45 fid50k_clip). This module implements the
vision transformer + projection head exactly in the HuggingFace
`transformers` CLIPVisionModel layout, with a state_dict converter — so the
published weights drop in, and the port is oracle-tested against a
locally-constructed random `transformers` model (no network needed).

Architecture (ViT-B/32): 32×32 conv patch embed → [CLS; patches] + learned
positions → pre-LN transformer ×12 (12 heads, 3072 MLP, QuickGELU) →
post-LN on CLS → 512-d linear projection.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.precision import get_precision

# ViT-B/32 hyperparameters (openai/clip-vit-base-patch32)
IMAGE_SIZE = 224
PATCH = 32
WIDTH = 768
LAYERS = 12
HEADS = 12
MLP = 3072
PROJ = 512

# CLIP preprocessing constants (OpenAI)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _linear(p, x):
    return x @ p["weight"].T + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(p, x):
    """Multi-head self-attention, HF CLIPAttention layout (q/k/v/out_proj)."""
    B, N, D = x.shape
    H = HEADS
    hd = D // H
    q = _linear(p["q_proj"], x).reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    k = _linear(p["k_proj"], x).reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    v = _linear(p["v_proj"], x).reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      precision=get_precision()) / math.sqrt(hd)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=get_precision())
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return _linear(p["out_proj"], out)


def _block(p, x):
    x = x + _attention(p["self_attn"], _ln(p["layer_norm1"], x))
    h = _ln(p["layer_norm2"], x)
    h = _linear(p["mlp"]["fc2"], _quick_gelu(_linear(p["mlp"]["fc1"], h)))
    return x + h


def clip_image_features(params: Dict, img255: jax.Array,
                        project: bool = True) -> jax.Array:
    """img255 (B, 3, H, W) uint8-range RGB → (B, 512) CLIP image features
    (or (B, 768) pooled pre-projection features with project=False).

    Input is resized to 224² and CLIP-normalized internally."""
    from ..ops import resize_bilinear

    x = img255.astype(jnp.float32) / 255.0
    if x.shape[-1] != IMAGE_SIZE:
        x = resize_bilinear(x, IMAGE_SIZE, antialias=True)
    mean = jnp.asarray(CLIP_MEAN, x.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD, x.dtype).reshape(1, 3, 1, 1)
    x = (x - mean) / std

    emb = params["embeddings"]
    # patch embed: conv stride 32, no bias (HF patch_embedding)
    p = lax.conv_general_dilated(
        x, emb["patch_embedding"]["weight"].astype(x.dtype),
        (PATCH, PATCH), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
    B, D, gh, gw = p.shape
    p = p.reshape(B, D, gh * gw).transpose(0, 2, 1)  # (B, N, D)
    cls = jnp.broadcast_to(emb["class_embedding"].reshape(1, 1, D), (B, 1, D))
    x = jnp.concatenate([cls, p], axis=1)
    x = x + emb["position_embedding"]["weight"][None]

    x = _ln(params["pre_layrnorm"], x)
    for l in range(LAYERS):
        x = _block(params["layers"][f"{l}"], x)
    pooled = _ln(params["post_layernorm"], x[:, 0])
    if not project:
        return pooled
    return pooled @ params["visual_projection"]["weight"].T


def convert_clip_state_dict(sd, proj=None) -> Dict:
    """HF CLIPVisionModel.state_dict() (keys vision_model.*) + optional
    visual_projection weight (from CLIPModel) → our pytree."""

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: Dict = {"embeddings": {}, "layers": {}}
    for name, value in sd.items():
        v = jnp.asarray(to_np(value))
        parts = name.split(".")
        if parts[0] == "vision_model":
            parts = parts[1:]
        if parts[0] == "embeddings":
            if parts[1] == "class_embedding":
                params["embeddings"]["class_embedding"] = v
            else:  # patch_embedding.weight / position_embedding.weight
                params["embeddings"].setdefault(parts[1], {})[parts[2]] = v
        elif parts[0] in ("pre_layrnorm", "post_layernorm"):
            params.setdefault(parts[0], {})[parts[1]] = v
        elif parts[0] == "encoder" and parts[1] == "layers":
            layer = params["layers"].setdefault(parts[2], {})
            node = layer
            for key in parts[3:-1]:
                node = node.setdefault(key, {})
            node[parts[-1]] = v
        elif parts[0] == "visual_projection":
            params["visual_projection"] = {"weight": v}
    if proj is not None:
        params["visual_projection"] = {"weight": jnp.asarray(to_np(proj))}
    if "visual_projection" not in params:
        # projection absent (plain CLIPVisionModel): identity-like random is
        # wrong — expose pooled features instead by a square identity.
        params["visual_projection"] = {"weight": jnp.eye(PROJ, WIDTH)}
    return params


def init_clip(key) -> Dict:
    """Keyed random init with the converter's structure (for tests)."""
    ks = iter(jax.random.split(key, 16 + LAYERS * 16))

    def lin(cin, cout):
        return {"weight": jax.random.normal(next(ks), (cout, cin)) * (cin ** -0.5),
                "bias": jnp.zeros((cout,))}

    def ln():
        return {"weight": jnp.ones((WIDTH,)), "bias": jnp.zeros((WIDTH,))}

    n_pos = (IMAGE_SIZE // PATCH) ** 2 + 1
    params = {
        "embeddings": {
            "class_embedding": jax.random.normal(next(ks), (WIDTH,)) * 0.02,
            "patch_embedding": {
                "weight": jax.random.normal(next(ks), (WIDTH, 3, PATCH, PATCH)) * 0.02},
            "position_embedding": {
                "weight": jax.random.normal(next(ks), (n_pos, WIDTH)) * 0.02},
        },
        "pre_layrnorm": ln(),
        "post_layernorm": ln(),
        "layers": {},
        "visual_projection": {
            "weight": jax.random.normal(next(ks), (PROJ, WIDTH)) * WIDTH ** -0.5},
    }
    for l in range(LAYERS):
        params["layers"][f"{l}"] = {
            "layer_norm1": ln(), "layer_norm2": ln(),
            "self_attn": {"q_proj": lin(WIDTH, WIDTH), "k_proj": lin(WIDTH, WIDTH),
                          "v_proj": lin(WIDTH, WIDTH), "out_proj": lin(WIDTH, WIDTH)},
            "mlp": {"fc1": lin(WIDTH, MLP), "fc2": lin(MLP, WIDTH)},
        }
    return params


def clip_features_fn(params: Dict, batch: int = 32):
    """FeatureFn for metric_main (uint8 NHWC numpy → (N, 512) numpy)."""
    fwd = jax.jit(lambda imgs: clip_image_features(params, imgs))

    def fn(imgs: np.ndarray) -> np.ndarray:
        x = jnp.asarray(imgs.transpose(0, 3, 1, 2).astype(np.float32))
        return np.asarray(fwd(x))

    return fn
