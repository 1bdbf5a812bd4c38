"""Latent inversion of real photos (GAN inversion + pivotal tuning).

Rebuild of ref projector.py:24-208:
  phase 1 — N steps of Adam on w (+ per-layer noise maps) minimizing a
            perceptual feature distance, with cosine lr ramp, additive w
            noise decay, and noise-map autocorrelation regularization
            (ref :124-180);
  phase 2 — N steps of pivotal tuning: freeze w, optimize ALL generator
            params under L1 + perceptual loss (ref :184-203).

The perceptual feature extractor is injected (`feature_fn`): the reference
uses VGG16-LPIPS downloaded from NVIDIA (projector.py:43-46); this framework
ships a converter for torchvision VGG16 weights (io/vgg.py) and falls back
to a multi-scale image-space distance when no weights are available.

TPU design: each optimization step is ONE jitted program (forward render +
loss + grads + Adam update, donated buffers); the Python loop only counts
steps."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import GeneratorConfig
from ..models import triplane
from ..ops import resize_bilinear


FeatureFn = Callable[[jax.Array], jax.Array]  # (B,3,H,W) in [0,255] → features


def _default_feature_fn() -> "FeatureFn":
    """LPIPS-grade VGG16 features when weights exist, multiscale fallback
    otherwise (ref projector.py:43-46 downloads vgg16-lpips by default)."""
    from ..io.vgg import load_default_feature_fn

    return load_default_feature_fn() or multiscale_l2_features


def multiscale_l2_features(img: jax.Array) -> jax.Array:
    """Fallback perceptual proxy: concatenated multi-scale pixels (used when
    no VGG16 weights are present; swap in vgg16_features for fidelity)."""
    feats = []
    x = img / 255.0
    for _ in range(4):
        feats.append(x.reshape(x.shape[0], -1))
        if x.shape[-1] > 8:
            x = resize_bilinear(x, x.shape[-1] // 2, antialias=True)
    return jnp.concatenate(feats, axis=1)


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    """ref projector.py:27-66 defaults."""

    num_steps: int = 500
    num_steps_pti: int = 500
    w_avg_samples: int = 10000
    initial_learning_rate: float = 0.01
    initial_noise_factor: float = 0.05
    lr_rampdown_length: float = 0.25
    lr_rampup_length: float = 0.05
    noise_ramp_length: float = 0.75
    regularize_noise_weight: float = 1e5
    first_inv_lr: float = 5e-3  # pivotal-tuning lr (ref :66)


def compute_w_stats(params, cfg: GeneratorConfig, pcfg: ProjectorConfig,
                    c: jax.Array, rng) -> Tuple[jax.Array, jax.Array]:
    """Mean/std of w from z samples (ref projector.py:58-64)."""
    z = jax.random.normal(rng, (pcfg.w_avg_samples, cfg.z_dim))
    c_rep = jnp.tile(c[:1], (pcfg.w_avg_samples, 1))
    ws = triplane.mapping(params, z, c_rep, cfg)  # (N, num_ws, w_dim)
    w = ws[:, :1]  # single w broadcast later
    w_avg = jnp.mean(w, axis=0, keepdims=True)  # (1, 1, w_dim)
    w_std = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(w - w_avg), axis=-1)))
    return w_avg, w_std


def _lr_schedule(step, num_steps, base_lr, pcfg: ProjectorConfig):
    """Cosine ramp-down with linear ramp-up (ref projector.py:146-152)."""
    t = step / num_steps
    lr_ramp = jnp.minimum(1.0, (1.0 - t) / pcfg.lr_rampdown_length)
    lr_ramp = 0.5 - 0.5 * jnp.cos(lr_ramp * jnp.pi)
    lr_ramp = lr_ramp * jnp.minimum(1.0, t / pcfg.lr_rampup_length)
    return base_lr * lr_ramp


def _noise_regularization(noise_maps: Dict[str, jax.Array]) -> jax.Array:
    """Autocorrelation regularizer pushing noise maps toward white noise
    (ref projector.py:161-171): sum over pyramid levels of squared
    unit-shift correlations."""
    reg = 0.0
    for v in jax.tree.leaves(noise_maps):
        noise = v[None, None] if v.ndim == 2 else v
        while True:
            reg = reg + jnp.mean(noise * jnp.roll(noise, 1, axis=3)) ** 2
            reg = reg + jnp.mean(noise * jnp.roll(noise, 1, axis=2)) ** 2
            if noise.shape[2] <= 8:
                break
            B, C, H, W = noise.shape
            noise = jnp.mean(noise.reshape(B, C, H // 2, 2, W // 2, 2), axis=(3, 5))
    return reg


def _normalize_noise(noise_maps):
    """Zero-mean/unit-std renormalization after each step (ref :177-180)."""
    def norm(v):
        return (v - jnp.mean(v)) / jnp.sqrt(jnp.mean(jnp.square(v - jnp.mean(v))) + 1e-8)
    return jax.tree.map(norm, noise_maps)


def project(params, target_image: jax.Array, c: jax.Array, cfg: GeneratorConfig,
            pcfg: ProjectorConfig = ProjectorConfig(),
            feature_fn: Optional[FeatureFn] = None,
            rng: Optional[jax.Array] = None, verbose: bool = False):
    """Phase-1 W-space inversion. target_image (1,3,R,R) in (−1,1).

    feature_fn defaults to LPIPS-grade VGG16 features when weights are
    available ($NFE_VGG16_WEIGHTS, io/vgg.load_default_feature_fn), else the
    multiscale pixel fallback. Returns (w_opt, history dict)."""
    from ..models.stylegan2 import num_synthesis_ws

    feature_fn = feature_fn or _default_feature_fn()

    rng = jax.random.key(0) if rng is None else rng
    rng_stats, rng_noise = jax.random.split(rng)
    w_avg, w_std = compute_w_stats(params, cfg, pcfg, c, rng_stats)
    num_ws = num_synthesis_ws(cfg.backbone_resolution)

    target_feats = feature_fn((jnp.clip(target_image, -1, 1) + 1) * 127.5)

    # Jointly optimized noise maps (the reference optimizes the backbone's
    # noise buffers alongside w, projector.py:130-136): pull every
    # noise_const leaf from the synthesis subtree.
    def extract_noise(tree, path=()):
        out = {}
        for k, v in tree.items():
            if k == "noise_const":
                out[".".join(path)] = jax.random.normal(
                    jax.random.fold_in(rng_noise, hash(path) & 0x7FFFFFFF), v.shape)
            elif isinstance(v, dict):
                out.update(extract_noise(v, path + (k,)))
        return out

    def insert_noise(tree, noise, path=()):
        out = {}
        for k, v in tree.items():
            if k == "noise_const":
                out[k] = noise[".".join(path)]
            elif isinstance(v, dict):
                out[k] = insert_noise(v, noise, path + (k,))
            else:
                out[k] = v
        return out

    noise_maps = extract_noise(params["synthesis"])
    w_opt = jnp.tile(w_avg, (1, 1, 1))  # (1, 1, w_dim), broadcast at render
    opt = optax.adam(1.0, b1=0.9, b2=0.999)  # lr applied via gradient scaling
    opt_state = opt.init((w_opt, noise_maps))

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(w_opt, noise_maps, opt_state, step, rng_step):
        t = step / pcfg.num_steps
        w_noise_scale = w_std * pcfg.initial_noise_factor * jnp.maximum(
            0.0, 1.0 - t / pcfg.noise_ramp_length) ** 2
        lr = _lr_schedule(step, pcfg.num_steps, pcfg.initial_learning_rate, pcfg)

        def loss_fn(w, noise):
            w_noised = w + jax.random.normal(rng_step, w.shape) * w_noise_scale
            ws = jnp.tile(w_noised, (1, num_ws, 1))
            p = dict(params)
            p["synthesis"] = insert_noise(params["synthesis"], noise)
            out = triplane.synthesis(p, ws, c, cfg, noise_mode="const")
            # NO clamp before the feature loss (ref projector.py:155 feeds
            # the raw scaled image) — a clamp saturates to zero gradient
            # whenever the render leaves [-1,1], which a far-from-target w
            # (or an early-training G) does for most pixels: measured on
            # hardware, the clipped loss froze at bit-identical values for
            # 500 straight steps (runs/hw_r4/inversion_full2.log).
            synth = (out["image"] + 1) * 127.5
            feats = feature_fn(synth)
            dist = jnp.sum(jnp.square(feats - target_feats))
            return dist + _noise_regularization(noise) * pcfg.regularize_noise_weight

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(w_opt, noise_maps)
        updates, opt_state = opt.update(jax.tree.map(lambda g: g * lr, grads), opt_state)
        w_opt, noise_maps = optax.apply_updates((w_opt, noise_maps), updates)
        noise_maps = _normalize_noise(noise_maps)
        return w_opt, noise_maps, opt_state, loss

    losses = []
    for step in range(pcfg.num_steps):
        rng, rng_step = jax.random.split(rng)
        w_opt, noise_maps, opt_state, loss = step_fn(
            w_opt, noise_maps, opt_state, jnp.asarray(step, jnp.float32), rng_step)
        if verbose and step % 50 == 0:
            print(f"w-opt step {step}: loss {float(loss):.4f}")
        losses.append(loss)

    ws = jnp.tile(w_opt, (1, num_ws, 1))
    return ws, {"loss": losses, "noise_maps": noise_maps}


def pivotal_tuning(params, ws, target_image: jax.Array, c: jax.Array,
                   cfg: GeneratorConfig, pcfg: ProjectorConfig = ProjectorConfig(),
                   feature_fn: Optional[FeatureFn] = None,
                   verbose: bool = False):
    """Phase-2: optimize all generator params at the pivot ws
    (ref projector.py:184-203, L1 + LPIPS)."""
    feature_fn = feature_fn or _default_feature_fn()
    target01 = (jnp.clip(target_image, -1, 1) + 1) / 2
    target_feats = feature_fn(target01 * 255.0)

    opt = optax.adam(pcfg.first_inv_lr, b1=0.9, b2=0.999)
    opt_state = opt.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state):
        def loss_fn(p):
            out = triplane.synthesis(p, ws, c, cfg, noise_mode="const")
            # raw image in the loss — ref projector.py:194-197 clamps only
            # for visualization; a clamp here zeroes every gradient once
            # the render saturates (see project()).
            img01 = (out["image"] + 1) / 2
            l1 = jnp.mean(jnp.abs(img01 - target01))
            feats = feature_fn(img01 * 255.0)
            lpips = jnp.sum(jnp.square(feats - target_feats))
            return l1 + lpips

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for step in range(pcfg.num_steps_pti):
        params, opt_state, loss = step_fn(params, opt_state)
        if verbose and step % 50 == 0:
            print(f"pti step {step}: loss {float(loss):.4f}")
        losses.append(loss)
    return params, {"loss": losses}
