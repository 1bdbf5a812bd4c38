"""Optimization steps: phase machinery, lazy regularization, EMA.

Rebuild of the reference's phase loop (ref training/training_loop.py:250-365):
Gmain / Greg@4 / Dmain / Dreg@16, each phase backpropagating and stepping its
module's Adam SEPARATELY with lazy-regularization lr/β scaling
(mb_ratio = r/(r+1), training_loop.py:255-262), gradient NaN scrubbing
(training_loop.py:344), and a per-iteration G_ema lerp with ramped β
(training_loop.py:355-365).

Each phase is its own jitted program (one compiled variant per schedule
bucket) — matching the reference's per-phase optimizer semantics and keeping
single-program size within the compiler's comfort zone (the fused
R1-at-512² + histogram-reg megaprogram is avoidable complexity).

Data parallelism is implicit: with params replicated and batches sharded
over the mesh's `data` axis, XLA emits the psum that replaces the
reference's flat-tensor all_reduce.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import DiscriminatorConfig, GeneratorConfig
from . import loss as loss_mod
from .loss import LossConfig


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """ref train.py:227-228,249-250: Adam β=(0,0.99); G lr 2.5e-3, D lr 2e-3."""

    g_lr: float = 0.0025
    d_lr: float = 0.002
    beta1: float = 0.0
    beta2: float = 0.99
    eps: float = 1e-8
    g_reg_interval: Optional[int] = 4    # density/hist reg cadence (train.py:341)
    d_reg_interval: Optional[int] = 16   # R1 cadence (training_loop.py:147)

    def lazy(self, lr: float, interval: Optional[int]):
        """Lazy-regularization scaling (ref training_loop.py:255-259)."""
        if interval is None:
            return lr, self.beta1, self.beta2
        mb_ratio = interval / (interval + 1)
        return lr * mb_ratio, self.beta1**mb_ratio, self.beta2**mb_ratio


def make_optimizers(cfg: OptimizerConfig):
    g_lr, g_b1, g_b2 = cfg.lazy(cfg.g_lr, cfg.g_reg_interval)
    d_lr, d_b1, d_b2 = cfg.lazy(cfg.d_lr, cfg.d_reg_interval)
    g_opt = optax.adam(g_lr, b1=g_b1, b2=g_b2, eps=cfg.eps)
    d_opt = optax.adam(d_lr, b1=d_b1, b2=d_b2, eps=cfg.eps)
    return g_opt, d_opt


class TrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_ema: Any
    g_opt_state: Any
    d_opt_state: Any
    cur_nimg: jax.Array  # int32 scalar


def init_train_state(g_params, d_params, opt_cfg: OptimizerConfig) -> TrainState:
    g_opt, d_opt = make_optimizers(opt_cfg)
    # Copy the incoming params: the phase steps DONATE their state buffers,
    # which would otherwise silently delete the caller's arrays.
    g_params = jax.tree.map(jnp.copy, g_params)
    d_params = jax.tree.map(jnp.copy, d_params)
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        g_ema=jax.tree.map(jnp.copy, g_params),
        g_opt_state=g_opt.init(g_params),
        d_opt_state=d_opt.init(d_params),
        cur_nimg=jnp.asarray(0, jnp.int32),
    )


def _scrub(grads):
    """NaN/Inf scrub (ref training_loop.py:344 nan_to_num on flat grads)."""
    return jax.tree.map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads
    )


def ema_beta(batch_size: int, cur_nimg, ema_kimg: float, ema_rampup: Optional[float]):
    """ref training_loop.py:355-360."""
    ema_nimg = ema_kimg * 1000
    if ema_rampup is not None:
        ema_nimg = jnp.minimum(ema_nimg, cur_nimg * ema_rampup)
    return jnp.asarray(0.5, jnp.float32) ** (batch_size / jnp.maximum(ema_nimg, 1e-8))


_STATIC = ("g_cfg", "d_cfg", "loss_cfg", "opt_cfg", "cur_nimg_static", "microbatch")


def _blur_sigma_arg(loss_cfg, cur_nimg_static: int, cur_nimg):
    """Blur sigma to hand the phase losses: static 0.0 once the fade has
    ended (the schedule bucket key only distinguishes blur on/off), else the
    EXACT traced sigma at the live step counter. The reference recomputes
    sigma from cur_nimg every step (ref loss.py:419); tracing it keeps that
    exactness with ONE compiled program for the whole fade, where the
    0.1-quantized static bucket recompiled all four phases every 200 imgs at
    blur_fade_kimg=20 (measured minutes per 25-step tick on-chip, r4)."""
    if loss_cfg.blur_sigma(cur_nimg_static) <= 0:
        return 0.0
    nimg = jnp.asarray(cur_nimg, jnp.float32)
    return (jnp.maximum(1.0 - nimg / (loss_cfg.blur_fade_kimg * 1e3), 0.0)
            * loss_cfg.blur_init_sigma)


def _swap_prob_arg(loss_cfg, cur_nimg_static: int, cur_nimg):
    """Traced gen-pose-conditioning swap probability (same rationale as
    _blur_sigma_arg: the gpc fade crosses a 0.01 quantization boundary every
    20 kimg — ~50 avoidable recompiles over the reference's 25,000-kimg
    schedule). None (gpc off) keeps the swap-free program."""
    if loss_cfg.swapping_prob(cur_nimg_static) is None:
        return None
    nimg = jnp.asarray(cur_nimg, jnp.float32)
    if loss_cfg.gpc_reg_fade_kimg > 0:
        alpha = jnp.minimum(nimg / (loss_cfg.gpc_reg_fade_kimg * 1e3), 1.0)
    else:
        alpha = 1.0
    return (1.0 - alpha) * 1.0 + alpha * loss_cfg.gpc_reg_prob


def _microbatched_grads(grad_fn, params, batch_arrays, rng, n_micro: int):
    """Gradient accumulation over micro-batches (the reference's `batch_gpu`
    splitting, ref training_loop.py:314-334): lax.scan over micro-slices,
    averaging grads and stats — peak activation memory is one micro-batch.

    grad_fn(params, rng, *micro_arrays) → ((loss, stats), grads).
    """
    if n_micro == 1:
        (_, stats), grads = grad_fn(params, rng, *batch_arrays)
        return grads, stats

    micro = [a.reshape(n_micro, a.shape[0] // n_micro, *a.shape[1:])
             for a in batch_arrays]
    rngs = jax.random.split(rng, n_micro)

    def body(carry, xs):
        acc_grads, acc_stats = carry
        r, *arrays = xs
        (_, stats), grads = grad_fn(params, r, *arrays)
        acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
        if acc_stats is None:
            acc_stats = stats
        else:
            acc_stats = jax.tree.map(jnp.add, acc_stats, stats)
        return (acc_grads, acc_stats), None

    zero_grads = jax.tree.map(jnp.zeros_like, params)
    # first micro-batch initializes the stats structure
    (_, stats0), grads0 = grad_fn(params, rngs[0], *(m[0] for m in micro))
    grads0 = jax.tree.map(jnp.add, zero_grads, grads0)
    if n_micro > 1:
        (grads, stats), _ = jax.lax.scan(
            body, (grads0, stats0),
            (rngs[1:], *[m[1:] for m in micro]))
    else:
        grads, stats = grads0, stats0
    inv = 1.0 / n_micro
    grads = jax.tree.map(lambda g: g * inv, grads)
    stats = jax.tree.map(lambda s: s * inv, stats)
    return grads, stats


def _g_apply(state: TrainState, grads, opt_cfg) -> TrainState:
    g_opt, _ = make_optimizers(opt_cfg)
    updates, g_opt_state = g_opt.update(_scrub(grads), state.g_opt_state, state.g_params)
    return state._replace(g_params=optax.apply_updates(state.g_params, updates),
                          g_opt_state=g_opt_state)


def _d_apply(state: TrainState, grads, opt_cfg, d_cfg=None) -> TrainState:
    if d_cfg is not None and d_cfg.freezed > 0:
        # Freeze-D: zero gradients on the frozen top layers
        # (ref networks_stylegan2.py:585-592).
        from ..models.discriminator import freeze_d_mask

        mask = freeze_d_mask(state.d_params, d_cfg)
        grads = jax.tree.map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
    _, d_opt = make_optimizers(opt_cfg)
    updates, d_opt_state = d_opt.update(_scrub(grads), state.d_opt_state, state.d_params)
    return state._replace(d_params=optax.apply_updates(state.d_params, updates),
                          d_opt_state=d_opt_state)


@partial(jax.jit, static_argnames=_STATIC + ("has_parser",), donate_argnums=(0,))
def gmain_step(state: TrainState, z, gen_c, rng, *, g_cfg, d_cfg, loss_cfg,
               opt_cfg, cur_nimg_static: int = 0, has_parser: bool = False,
               face_parser_params=None, microbatch: int = 1,
               ada_p=None) -> Tuple[TrainState, Dict]:
    face_parser = None
    if has_parser:
        from ..models.bisenet import bisenet_apply
        face_parser = lambda img: bisenet_apply(face_parser_params, img)
    blur_sigma = _blur_sigma_arg(loss_cfg, cur_nimg_static, state.cur_nimg)
    swapping_prob = _swap_prob_arg(loss_cfg, cur_nimg_static, state.cur_nimg)

    def grad_fn(g_params, r, z_, c_):
        def loss_fn(p):
          with jax.named_scope("Gmain_forward"):
            return loss_mod.g_main_loss(
                p, state.d_params, z_, c_, r, g_cfg=g_cfg, d_cfg=d_cfg,
                cfg=loss_cfg, cur_nimg=cur_nimg_static, face_parser=face_parser,
                ada_p=ada_p, blur_sigma=blur_sigma, swapping_prob=swapping_prob)
        return jax.value_and_grad(loss_fn, has_aux=True)(g_params)

    grads, stats = _microbatched_grads(grad_fn, state.g_params, (z, gen_c), rng, microbatch)
    return _g_apply(state, grads, opt_cfg), stats


@partial(jax.jit, static_argnames=_STATIC, donate_argnums=(0,))
def greg_step(state: TrainState, z, gen_c, rng, *, g_cfg, d_cfg, loss_cfg,
              opt_cfg, cur_nimg_static: int = 0,
              microbatch: int = 1, ada_p=None) -> Tuple[TrainState, Dict]:
    """Histogram and density regularizers backpropagate SEPARATELY and sum
    their gradients (the reference's two .backward() calls within the Greg
    phase, loss.py:307,331) — halves the peak activation memory vs one
    fused backward.

    microbatch>1 chunks the histogram render over the batch: the global
    (z0, c0) sample is PREPENDED to every chunk, so each chunk renders
    wearing global sample 0's appearance statistics (gradients flow to its
    planes) and every chunk sample's histogram target is global sample 0's —
    including chunk-first samples, which a chunk-local target would silently
    drop. Sample 0's extra adversarial logit per chunk is excluded
    (adv_skip_first). The remaining deviation from the full-batch reference
    value is the Hellinger distance's sqrt-of-sum, taken per chunk instead
    of over the whole batch — a documented approximation, not a dropped
    gradient. microbatch=1 keeps the reference-exact path."""
    rng_hist, rng_dens = jax.random.split(rng)
    stats: Dict = {}
    blur_sigma = _blur_sigma_arg(loss_cfg, cur_nimg_static, state.cur_nimg)
    swapping_prob = _swap_prob_arg(loss_cfg, cur_nimg_static, state.cur_nimg)

    if microbatch == 1:
        def hist_fn(g_params):
          with jax.named_scope("Greg_hist_forward"):
            return loss_mod.g_reg_loss(
                g_params, state.d_params, z, gen_c, rng_hist, g_cfg=g_cfg,
                d_cfg=d_cfg, cfg=loss_cfg, cur_nimg=cur_nimg_static,
                include_density=False, ada_p=ada_p, blur_sigma=blur_sigma,
                swapping_prob=swapping_prob)

        (_, s), grads = jax.value_and_grad(hist_fn, has_aux=True)(state.g_params)
        stats.update(s)
    else:
        z0, c0 = z[:1], gen_c[:1]

        def grad_fn(g_params, r, z_, c_):
            # Global target sample joins every chunk: stats_from_index=0 then
            # couples the chunk to ITS planes and the (stop-gradient)
            # histogram target is ITS histogram — see docstring.
            z_cat = jnp.concatenate([z0, z_], axis=0)
            c_cat = jnp.concatenate([c0, c_], axis=0)

            def loss_fn(p):
              with jax.named_scope("Greg_hist_forward"):
                return loss_mod.g_reg_loss(
                    p, state.d_params, z_cat, c_cat, r, g_cfg=g_cfg, d_cfg=d_cfg,
                    cfg=loss_cfg, cur_nimg=cur_nimg_static,
                    include_density=False, ada_p=ada_p,
                    adv_skip_first=True, blur_sigma=blur_sigma,
                    swapping_prob=swapping_prob)
            return jax.value_and_grad(loss_fn, has_aux=True)(g_params)

        grads, s = _microbatched_grads(grad_fn, state.g_params, (z, gen_c),
                                       rng_hist, microbatch)
        stats.update(s)

    if g_cfg.rendering.density_reg > 0:
        def dens_fn(g_params):
            return loss_mod.density_regularization(
                g_params, z, gen_c, rng_dens, g_cfg, loss_cfg, cur_nimg_static,
                swapping_prob=swapping_prob)

        dens_loss, dens_grads = jax.value_and_grad(dens_fn)(state.g_params)
        stats["Loss/G/density_reg"] = dens_loss
        grads = jax.tree.map(jnp.add, grads, dens_grads)

    # Lazy-reg gain: the reference multiplies each phase's loss by
    # gain = phase.interval before backward (ref training_loop.py:333 +
    # loss.py `.mul(gain).backward()`), compensating for the phase running
    # only every interval-th step while sharing Adam state scaling.
    gain = float(opt_cfg.g_reg_interval or 1)
    if gain != 1.0:
        grads = jax.tree.map(lambda g: g * gain, grads)

    return _g_apply(state, grads, opt_cfg), stats


@partial(jax.jit, static_argnames=_STATIC, donate_argnums=(0,))
def dmain_step(state: TrainState, real_img, real_c, z, gen_c, rng, *, g_cfg,
               d_cfg, loss_cfg, opt_cfg, cur_nimg_static: int = 0,
               microbatch: int = 1, ada_p=None) -> Tuple[TrainState, Dict]:
    blur_sigma = _blur_sigma_arg(loss_cfg, cur_nimg_static, state.cur_nimg)
    swapping_prob = _swap_prob_arg(loss_cfg, cur_nimg_static, state.cur_nimg)

    def grad_fn(d_params, r, real_, rc_, z_, c_):
        def loss_fn(p):
          with jax.named_scope("Dmain_forward"):
            return loss_mod.d_main_loss(
                p, state.g_params, z_, c_, real_, rc_, r,
                g_cfg=g_cfg, d_cfg=d_cfg, cfg=loss_cfg, cur_nimg=cur_nimg_static,
                ada_p=ada_p, blur_sigma=blur_sigma, swapping_prob=swapping_prob)
        return jax.value_and_grad(loss_fn, has_aux=True)(d_params)

    grads, stats = _microbatched_grads(
        grad_fn, state.d_params, (real_img, real_c, z, gen_c), rng, microbatch)
    state = _d_apply(state, grads, opt_cfg, d_cfg)

    # w_avg EMA update — the reference refreshes the truncation anchor during
    # Dmain's generator forward (ref loss.py:424 update_emas=True →
    # networks_stylegan2.py:251-253).
    from ..models import triplane as triplane_mod
    from ..models.stylegan2 import mapping_update_w_avg

    rng_swap = jax.random.fold_in(rng, 17)
    c_cond = loss_mod.swap_conditioning(rng_swap, gen_c, swapping_prob)
    ws = triplane_mod.mapping(state.g_params, z, c_cond, g_cfg)
    g_params = dict(state.g_params)
    g_params["mapping"] = mapping_update_w_avg(
        state.g_params["mapping"], ws, beta=g_cfg.w_avg_beta)
    return state._replace(g_params=g_params), stats


@partial(jax.jit, static_argnames=_STATIC + ("has_parser",), donate_argnums=(0,))
def dreg_step(state: TrainState, real_img, real_c, rng, *, d_cfg, loss_cfg,
              opt_cfg, cur_nimg_static: int = 0,
              g_cfg=None, has_parser=False, microbatch: int = 1,
              ada_p=None) -> Tuple[TrainState, Dict]:
    blur_sigma = _blur_sigma_arg(loss_cfg, cur_nimg_static, state.cur_nimg)

    def grad_fn(d_params, r, real_, rc_):
        def loss_fn(p):
          with jax.named_scope("Dr1_forward"):
            return loss_mod.d_reg_loss(
                p, real_, rc_, r, d_cfg=d_cfg, cfg=loss_cfg,
                cur_nimg=cur_nimg_static, ada_p=ada_p, blur_sigma=blur_sigma)
        return jax.value_and_grad(loss_fn, has_aux=True)(d_params)

    grads, stats = _microbatched_grads(
        grad_fn, state.d_params, (real_img, real_c), rng, microbatch)
    # gain = phase.interval for lazy regularization (ref training_loop.py:333).
    gain = float(opt_cfg.d_reg_interval or 1)
    if gain != 1.0:
        grads = jax.tree.map(lambda g: g * gain, grads)
    return _d_apply(state, grads, opt_cfg, d_cfg), stats


@partial(jax.jit, static_argnames=("batch_size", "ema_kimg", "ema_rampup"), donate_argnums=(0,))
def ema_step(state: TrainState, *, batch_size: int, ema_kimg: float = 10.0,
             ema_rampup: Optional[float] = 0.05) -> TrainState:
    """G_ema lerp + nimg advance (ref training_loop.py:355-365)."""
    beta = ema_beta(batch_size, state.cur_nimg, ema_kimg, ema_rampup)
    g_ema = jax.tree.map(lambda e, p: p + (e - p) * beta, state.g_ema, state.g_params)
    return state._replace(g_ema=g_ema, cur_nimg=state.cur_nimg + batch_size)


def train_step(state: TrainState, real_img, real_c, z, gen_c, rng, *,
               g_cfg: GeneratorConfig, d_cfg: DiscriminatorConfig,
               loss_cfg: LossConfig, opt_cfg: OptimizerConfig,
               do_greg: bool, do_dreg: bool, batch_size: int,
               ema_kimg: float = 10.0, ema_rampup: Optional[float] = 0.05,
               cur_nimg_static: int = 0, has_parser: bool = False,
               face_parser_params=None, microbatch: int = 1,
               ada_p=None,
               ) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One full optimization iteration = the due phases in the reference's
    order (Gmain, Greg, Dmain, Dreg — training_loop.py:250-262), each its own
    jitted program with its own optimizer step, then the EMA lerp.

    ada_p: optional traced scalar ADA strength (jnp.float32); None disables
    augmentation entirely (the ref's augment_pipe=None)."""
    rngs = jax.random.split(rng, 4)
    stats: Dict[str, jax.Array] = {}

    state, s = gmain_step(state, z, gen_c, rngs[0], g_cfg=g_cfg, d_cfg=d_cfg,
                          loss_cfg=loss_cfg, opt_cfg=opt_cfg,
                          cur_nimg_static=cur_nimg_static, has_parser=has_parser,
                          face_parser_params=face_parser_params,
                          microbatch=microbatch, ada_p=ada_p)
    stats.update(s)
    if do_greg:
        state, s = greg_step(state, z, gen_c, rngs[1], g_cfg=g_cfg, d_cfg=d_cfg,
                             loss_cfg=loss_cfg, opt_cfg=opt_cfg,
                             cur_nimg_static=cur_nimg_static, ada_p=ada_p,
                             microbatch=microbatch)
        stats.update(s)
    state, s = dmain_step(state, real_img, real_c, z, gen_c, rngs[2],
                          g_cfg=g_cfg, d_cfg=d_cfg, loss_cfg=loss_cfg,
                          opt_cfg=opt_cfg, cur_nimg_static=cur_nimg_static,
                          microbatch=microbatch, ada_p=ada_p)
    stats.update(s)
    if do_dreg:
        state, s = dreg_step(state, real_img, real_c, rngs[3], d_cfg=d_cfg,
                             loss_cfg=loss_cfg, opt_cfg=opt_cfg,
                             cur_nimg_static=cur_nimg_static,
                             microbatch=microbatch, ada_p=ada_p)
        stats.update(s)
    state = ema_step(state, batch_size=batch_size, ema_kimg=ema_kimg,
                     ema_rampup=ema_rampup)
    return state, stats
