"""Adaptive discriminator augmentation (ADA) pipeline.

Rebuild of ref training/augment.py:124-441: geometric transforms composed as
affine matrices applied in one resampling pass, plus color-space transforms
composed in a 4×4 color matrix — the TPU-friendly formulation (two fused
dense ops per batch instead of per-augmentation passes).

Covered (ref probabilities multiply a global strength p, adjusted online
from D's real-logit sign, ref training_loop.py:372-375):
  geometric: xflip, 90° rotations, integer translation, isotropic scaling,
             arbitrary rotation, anisotropic stretch, fractional translation
  color:     brightness, contrast, luma flip, hue rotation, saturation
  image:     frequency-band filtering, additive RGB noise, cutout
             (ref augment.py:379-441; all default-off, matching the ref
             'bgc'-style spec used by --aug ada, ref train.py:365)."""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import resize_bilinear
from ..ops.grid_sample import grid_sample_2d


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Per-augmentation probability multipliers (ref augment.py:register)."""

    xflip: float = 1.0
    rotate90: float = 1.0
    xint: float = 1.0
    xint_max: float = 0.125
    scale: float = 1.0
    rotate: float = 1.0
    aniso: float = 1.0
    xfrac: float = 1.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 1.0
    contrast: float = 1.0
    lumaflip: float = 1.0
    hue: float = 1.0
    saturation: float = 1.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # Image-space corruption groups (ref augment.py:162-172 defaults).
    imgfilter: float = 0.0
    imgfilter_bands: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5


# sym2 wavelet lowpass — the filter-bank seed (ref augment.py:38).
_SYM2 = (-0.12940952255092145, 0.22414386804185735,
         0.836516303737469, 0.48296291314469025)


def _imgfilter_bank() -> np.ndarray:
    """4-band frequency decomposition filter bank (ref augment.py:176-187):
    band 0 is the identity lowpass; bands 1..3 add the highpass residue of
    successively dilated sym2 half-band pairs."""
    lo = np.asarray(_SYM2)
    hi = lo * ((-1.0) ** np.arange(lo.size))
    lo2 = np.convolve(lo, lo[::-1]) / 2       # H(z)·H(z⁻¹)/2
    hi2 = np.convolve(hi, hi[::-1]) / 2       # H(−z)·H(−z⁻¹)/2
    bank = np.eye(4, 1)
    for i in range(1, bank.shape[0]):
        # zero-interleave (á-trous dilation), then lowpass
        bank = np.dstack([bank, np.zeros_like(bank)]).reshape(bank.shape[0], -1)[:, :-1]
        bank = np.stack([np.convolve(row, lo2) for row in bank])
        lo_idx = (bank.shape[1] - hi2.size) // 2
        bank[i, lo_idx:lo_idx + hi2.size] += hi2
    return bank


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    zeros = jnp.zeros_like(theta)
    ones = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, -s, zeros], -1),
        jnp.stack([s, c, zeros], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)


def _translate2d(tx, ty):
    zeros = jnp.zeros_like(tx)
    ones = jnp.ones_like(tx)
    return jnp.stack([
        jnp.stack([ones, zeros, tx], -1),
        jnp.stack([zeros, ones, ty], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)


def _scale2d(sx, sy):
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    return jnp.stack([
        jnp.stack([sx, zeros, zeros], -1),
        jnp.stack([zeros, sy, zeros], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)


def _bernoulli_gate(rng, B, prob):
    return (jax.random.uniform(rng, (B,)) < prob).astype(jnp.float32)


def augment_pipe(rng: jax.Array, images: jax.Array, p: float,
                 cfg: AugmentConfig = AugmentConfig()) -> jax.Array:
    """Apply ADA transforms with global strength p ∈ [0, 1].

    images: (B, C, H, W) in (−1, 1); C may be >3 (the dual 6-channel input —
    color transforms apply to each 3-channel group)."""
    B, C, H, W = images.shape
    rngs = jax.random.split(rng, 16)

    # ---- compose inverse geometric transform G (pixel grid: [-1,1]²)
    G = jnp.tile(jnp.eye(3)[None], (B, 1, 1))

    if cfg.xflip > 0:
        gate = _bernoulli_gate(rngs[0], B, cfg.xflip * p)
        flip = jax.random.randint(rngs[1], (B,), 0, 2).astype(jnp.float32) * gate
        G = _scale2d(1 - 2 * flip, jnp.ones((B,))) @ G
    if cfg.rotate90 > 0:
        gate = _bernoulli_gate(rngs[2], B, cfg.rotate90 * p)
        k = jax.random.randint(rngs[3], (B,), 0, 4).astype(jnp.float32) * gate
        G = _rot2d(-k * (math.pi / 2)) @ G
    if cfg.xint > 0:
        gate = _bernoulli_gate(rngs[4], B, cfg.xint * p)
        t = jax.random.uniform(rngs[5], (B, 2), minval=-cfg.xint_max, maxval=cfg.xint_max)
        t = jnp.round(t * jnp.asarray([W, H])) / jnp.asarray([W, H]) * 2 * gate[:, None]
        G = _translate2d(-t[:, 0], -t[:, 1]) @ G
    if cfg.scale > 0:
        gate = _bernoulli_gate(rngs[6], B, cfg.scale * p)
        s = jnp.exp2(jax.random.normal(rngs[7], (B,)) * cfg.scale_std * gate)
        G = _scale2d(1 / s, 1 / s) @ G
    if cfg.rotate > 0:
        gate = _bernoulli_gate(rngs[8], B, cfg.rotate * p)
        theta = jax.random.uniform(rngs[9], (B,), minval=-math.pi, maxval=math.pi)
        theta = theta * cfg.rotate_max * gate
        G = _rot2d(-theta) @ G
    if cfg.aniso > 0:
        gate = _bernoulli_gate(rngs[10], B, cfg.aniso * p)
        s = jnp.exp2(jax.random.normal(rngs[11], (B,)) * cfg.aniso_std * gate)
        G = _scale2d(1 / s, s) @ G
    if cfg.xfrac > 0:
        gate = _bernoulli_gate(rngs[12], B, cfg.xfrac * p)
        t = jax.random.normal(rngs[13], (B, 2)) * cfg.xfrac_std * 2 * gate[:, None]
        G = _translate2d(-t[:, 0], -t[:, 1]) @ G

    # ---- one bilinear resampling pass through the composed transform
    # (grid at pixel centers: identity transform reproduces the image exactly)
    cy = (2 * jnp.arange(H) + 1) / H - 1
    cx = (2 * jnp.arange(W) + 1) / W - 1
    ys, xs = jnp.meshgrid(cy, cx, indexing="ij")
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).reshape(-1, 3)  # (HW, 3)
    src = jnp.einsum("bij,nj->bni", G, grid)[..., :2]  # (B, HW, 2)
    images = grid_sample_2d(images, src).reshape(B, C, H, W)

    # ---- color transform, composed as a 4×4 matrix on RGB1
    Cm = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    I = jnp.eye(4)
    v = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)

    if cfg.brightness > 0:
        gate = _bernoulli_gate(rngs[14], B, cfg.brightness * p)
        b = jax.random.normal(jax.random.fold_in(rngs[14], 1), (B,)) * cfg.brightness_std * gate
        T = jnp.tile(I[None], (B, 1, 1)).at[:, :3, 3].add(b[:, None])
        Cm = T @ Cm
    if cfg.contrast > 0:
        gate = _bernoulli_gate(rngs[15], B, cfg.contrast * p)
        c = jnp.exp2(jax.random.normal(jax.random.fold_in(rngs[15], 1), (B,))
                     * cfg.contrast_std * gate)
        T = jnp.tile(I[None], (B, 1, 1)) * jnp.concatenate(
            [jnp.tile(c[:, None], (1, 3)), jnp.ones((B, 1))], axis=1)[:, :, None]
        Cm = T @ Cm
    if cfg.lumaflip > 0:
        gate = _bernoulli_gate(jax.random.fold_in(rngs[15], 2), B, cfg.lumaflip * p)
        flip = jax.random.randint(jax.random.fold_in(rngs[15], 3), (B,), 0, 2).astype(jnp.float32) * gate
        T = I[None] - 2 * jnp.einsum("i,j->ij", v, v)[None] * flip[:, None, None]
        Cm = T @ Cm
    if cfg.hue > 0 and C >= 3:
        gate = _bernoulli_gate(jax.random.fold_in(rngs[15], 4), B, cfg.hue * p)
        theta = jax.random.uniform(jax.random.fold_in(rngs[15], 5), (B,),
                                   minval=-math.pi, maxval=math.pi) * cfg.hue_max * gate
        # Rodrigues rotation around the luma axis
        K = jnp.asarray([[0, -v[2], v[1], 0], [v[2], 0, -v[0], 0],
                         [-v[1], v[0], 0, 0], [0, 0, 0, 0]], jnp.float32)
        sin, cos = jnp.sin(theta), jnp.cos(theta)
        T = (I[None] + sin[:, None, None] * K[None]
             + (1 - cos)[:, None, None] * (K @ K)[None])
        Cm = T @ Cm
    if cfg.saturation > 0 and C >= 3:
        gate = _bernoulli_gate(jax.random.fold_in(rngs[15], 6), B, cfg.saturation * p)
        s = jnp.exp2(jax.random.normal(jax.random.fold_in(rngs[15], 7), (B,))
                     * cfg.saturation_std * gate)
        vv = jnp.einsum("i,j->ij", v, v)[None]
        T = vv + (I[None] - vv) * s[:, None, None]
        Cm = T @ Cm

    # apply to each 3-channel group
    out = []
    for g in range(C // 3):
        rgb = images[:, g * 3 : g * 3 + 3]  # (B, 3, H, W)
        rgb1 = jnp.concatenate([rgb, jnp.ones((B, 1, H, W), rgb.dtype)], axis=1)
        rgb1 = jnp.einsum("bij,bjhw->bihw", Cm.astype(rgb.dtype), rgb1)
        out.append(rgb1[:, :3])
    rem = C - (C // 3) * 3
    if rem:
        out.append(images[:, -rem:])
    images = jnp.concatenate(out, axis=1)

    # ---- image-space filtering: per-sample 4-band gain (ref augment.py:383-412)
    if cfg.imgfilter > 0:
        fbank = jnp.asarray(_imgfilter_bank(), jnp.float32)  # (4, taps)
        expected_power = jnp.asarray([10.0, 1.0, 1.0, 1.0]) / 13.0
        gains = jnp.ones((B, 4))
        k = jax.random.fold_in(rngs[15], 8)
        for i, band_strength in enumerate(cfg.imgfilter_bands):
            k, k_t, k_gate = jax.random.split(k, 3)
            t_i = jnp.exp2(jax.random.normal(k_t, (B,)) * cfg.imgfilter_std)
            gate = (jax.random.uniform(k_gate, (B,))
                    < cfg.imgfilter * p * band_strength)
            t_i = jnp.where(gate, t_i, 1.0)
            t = jnp.ones((B, 4)).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), -1,
                                     keepdims=True))
            gains = gains * t
        hz = gains @ fbank                                # (B, taps)
        taps = fbank.shape[1]
        pd = taps // 2
        hz = jnp.repeat(hz, C, axis=0).astype(images.dtype)  # (B·C, taps)
        x = images.reshape(1, B * C, H, W)
        x = jnp.pad(x, ((0, 0), (0, 0), (pd, pd), (pd, pd)), mode="reflect")
        # separable depthwise conv, per-(sample, channel) kernel
        x = lax.conv_general_dilated(
            x, hz.reshape(B * C, 1, 1, taps), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=B * C)
        x = lax.conv_general_dilated(
            x, hz.reshape(B * C, 1, taps, 1), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=B * C)
        images = x.reshape(B, C, H, W)

    # ---- additive RGB noise (ref augment.py:420-425)
    if cfg.noise > 0:
        k_s, k_gate, k_n = jax.random.split(jax.random.fold_in(rngs[15], 9), 3)
        sigma = jnp.abs(jax.random.normal(k_s, (B,))) * cfg.noise_std
        sigma = jnp.where(jax.random.uniform(k_gate, (B,)) < cfg.noise * p,
                          sigma, 0.0).reshape(B, 1, 1, 1)
        images = images + jax.random.normal(k_n, images.shape,
                                            images.dtype) * sigma

    # ---- cutout (ref augment.py:427-441)
    if cfg.cutout > 0:
        k_gate, k_c = jax.random.split(jax.random.fold_in(rngs[15], 10))
        size = jnp.where(
            jax.random.uniform(k_gate, (B, 1, 1, 1)) < cfg.cutout * p,
            cfg.cutout_size, 0.0)
        center = jax.random.uniform(k_c, (B, 2, 1, 1))
        coord_x = ((jnp.arange(W) + 0.5) / W).reshape(1, 1, 1, W)
        coord_y = ((jnp.arange(H) + 0.5) / H).reshape(1, 1, H, 1)
        mask_x = jnp.abs(coord_x - center[:, 0:1, :, :]) >= size / 2
        mask_y = jnp.abs(coord_y - center[:, 1:2, :, :]) >= size / 2
        mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
        images = images * mask

    return images


class AdaController:
    """Online p adjustment from the sign of D's real logits
    (ref training_loop.py:372-375): p += sign(E[sign(real_logits)] − target)
    · nimg/(speed·1000)."""

    def __init__(self, target: float = 0.6, speed_kimg: float = 500.0):
        self.p = 0.0
        self.target = target
        self.speed_kimg = speed_kimg

    def update(self, real_sign_mean: float, n_img: int) -> float:
        adjust = math.copysign(1.0, real_sign_mean - self.target)
        # ref clamps below at 0 only (training_loop.py:375).
        self.p = max(self.p + adjust * n_img / (self.speed_kimg * 1000), 0.0)
        return self.p
