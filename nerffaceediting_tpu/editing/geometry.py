"""Geometry editing: re-optimize the normalized tri-planes against an
edited semantic mask (the demo.ipynb geometry edit, SURVEY §3.3 /
BASELINE config 3).

The appearance code (tri-plane statistics) stays FIXED; only the normalized
planes — the geometry code — are optimized so the rendered 3-D-consistent
segmentation matches the target mask, with an image-preservation term
outside the edited region. One jitted Adam step (render + CE + grads,
donated buffers); the Python loop only counts iterations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import GeneratorConfig
from ..models import triplane
from ..train.loss import seg_cross_entropy


@dataclasses.dataclass(frozen=True)
class GeometryEditConfig:
    num_steps: int = 200
    learning_rate: float = 2e-2
    preserve_weight: float = 1.0   # keep un-edited regions' rgb intact
    seg_weight: float = 1.0
    plane_reg_weight: float = 1e-3  # keep planes near the original geometry
    # CE weight multiplier INSIDE the edited region: the plain mean-CE
    # dilutes the edit's gradient by its pixel fraction (~15% in the demo)
    # while the preservation term pushes back everywhere — the r4 artifact
    # reached only seg_match 0.24 after 10 steps. Boosting the edited
    # pixels' CE restores the intended per-region balance.
    edit_seg_boost: float = 5.0


def edit_geometry(params, ws, cam, norm_planes, plane_stats,
                  target_labels: jax.Array, cfg: GeneratorConfig,
                  ecfg: GeometryEditConfig = GeometryEditConfig(),
                  edit_mask: Optional[jax.Array] = None,
                  verbose: bool = False):
    """Optimize norm_planes so the rendered segmentation matches
    `target_labels` under camera `cam`.

    Args:
      norm_planes: (B, 3, 32, H, W) geometry code (normalized planes).
      plane_stats: (mean, var) each (B, 3, 32) — frozen appearance code.
      target_labels: (B, h, w) int labels in the 15-class vocabulary at the
        neural rendering resolution (decode hand-painted masks with
        editing.masks.colors_to_labels + resize).
      edit_mask: optional (B, 1, h, w) float — 1 where the mask was edited
        (preservation loss applies outside it).

    Returns (edited_norm_planes, history).
    """
    out0 = triplane.render_planes(params, norm_planes, None, cam, cfg,
                                  ws_sr=ws, plane_stats=plane_stats)
    rgb0 = jax.lax.stop_gradient(out0["image_raw"])

    opt = optax.adam(ecfg.learning_rate)
    opt_state = opt.init(norm_planes)
    planes0 = norm_planes

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(planes, opt_state):
        def loss_fn(p):
            out = triplane.render_planes(params, p, None, cam, cfg,
                                         ws_sr=ws, plane_stats=plane_stats)
            if edit_mask is not None and ecfg.edit_seg_boost != 1.0:
                # per-pixel CE with the edited region boosted (see config)
                logp = jax.nn.log_softmax(out["image_seg"], axis=1)
                onehot = jax.nn.one_hot(target_labels, logp.shape[1],
                                        axis=1, dtype=logp.dtype)
                ce = -jnp.sum(onehot * logp, axis=1, keepdims=True)
                w = 1.0 + (ecfg.edit_seg_boost - 1.0) * edit_mask
                seg_loss = jnp.mean(w * ce)
            else:
                seg_loss = seg_cross_entropy(out["image_seg"], target_labels)
            if edit_mask is not None:
                keep = 1.0 - edit_mask
                preserve = jnp.mean(keep * jnp.square(out["image_raw"] - rgb0))
            else:
                preserve = jnp.mean(jnp.square(out["image_raw"] - rgb0))
            reg = jnp.mean(jnp.square(p - planes0))
            return (ecfg.seg_weight * seg_loss
                    + ecfg.preserve_weight * preserve
                    + ecfg.plane_reg_weight * reg), seg_loss

        (loss, seg_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(planes)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(planes, updates), opt_state, loss, seg_loss

    losses = []
    planes = jnp.copy(norm_planes)  # step() donates its input buffer
    for i in range(ecfg.num_steps):
        planes, opt_state, loss, seg_loss = step(planes, opt_state)
        if verbose and i % 20 == 0:
            print(f"geometry edit step {i}: loss {float(loss):.4f} "
                  f"seg {float(seg_loss):.4f}")
        losses.append(loss)
    return planes, {"loss": losses}


def labels_from_painted_mask(mask_rgb: jax.Array, resolution: int) -> jax.Array:
    """Hand-painted palette mask (B, 3, H, W) in (−1,1) → labels at the
    neural rendering resolution (ref utils.py:121-128 inverse decoding +
    nearest-neighbour downsample to keep labels crisp)."""
    from .masks import colors_to_labels

    labels = colors_to_labels(mask_rgb)  # (B, 1, H, W) int
    B, _, H, W = labels.shape
    if H != resolution:
        idx = (jnp.arange(resolution) * H) // resolution
        labels = labels[:, :, idx][:, :, :, (jnp.arange(resolution) * W) // resolution]
    return labels[:, 0]
