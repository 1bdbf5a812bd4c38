"""Per-stage TPU timing breakdown of the edited-frame path (VERDICT r1 #2).

Times each stage of bench.py's workload as its own scanned jit (N iterations
inside one program, real dependency, one fetched scalar — tunnel-dispatch
safe):

  render   — 64² two-pass neural render (48+48), the Pallas tri-plane kernel
             + decoder MLPs + ray marcher + unify/sort
  sr       — SuperresolutionHybrid8XDC 64²→512²
  decode   — the full planes→frame program (render + SR + bookkeeping)

Usage: PYTHONPATH=. python scripts/bench_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, iters=8, tag=""):
    """One jit, lax.scan of `iters` calls with a carried checksum."""

    @jax.jit
    def run(*a):
        def body(carry, i):
            out = fn(*a, i)
            return carry + out, None

        acc, _ = lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    float(run(*args))  # compile
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:<28} {dt * 1e3:8.3f} ms/iter")
    return dt


def main():
    from nerffaceediting_tpu.ops import precision as prec

    prec.set_precision(lax.Precision.DEFAULT)

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.editing.api import (
        decode, encode, swap_appearance_stats)
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.models.superresolution import superresolution
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)
    from nerffaceediting_tpu.render.ray_sampler import sample_rays
    from nerffaceediting_tpu.render.renderer import render_rays

    cfg = ffhq_generator_config()
    params = triplane.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    cam = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837))
    ws = triplane.mapping(params, z, cam, cfg)
    planes_src = encode(params, ws, cfg)
    planes_sty = encode(
        params,
        triplane.mapping(params, jax.random.normal(jax.random.key(2), (1, cfg.z_dim)), cam, cfg),
        cfg)
    norm, stats = swap_appearance_stats(planes_src, planes_sty)
    res = cfg.neural_rendering_resolution

    cam2world = cam[:, :16].reshape(-1, 4, 4)
    intrinsics = cam[:, 16:25].reshape(-1, 3, 3)
    ray_o, ray_d = sample_rays(cam2world, intrinsics, res)

    from nerffaceediting_tpu.models.triplane import _decoder_fn
    dec_fn = _decoder_fn(cfg)

    def render_stage(params, norm, ray_o, ray_d, i):
        feats, segs, depths, _ = render_rays(
            dec_fn, params["decoder"], norm, None,
            ray_o + i * 0.0, ray_d, cfg.rendering, rng=None, plane_stats=stats)
        return jnp.sum(feats) + jnp.sum(segs) + jnp.sum(depths)

    # fixed feature image for the SR stage
    feats, _, _, _ = jax.jit(
        lambda: render_rays(dec_fn, params["decoder"], norm, None, ray_o,
                            ray_d, cfg.rendering, rng=None, plane_stats=stats))()
    feat_img = feats.transpose(0, 2, 1).reshape(1, -1, res, res)
    rgb_img = feat_img[:, :3]

    def sr_stage(params, rgb, feat, ws, i):
        out = superresolution(
            params["superresolution"], rgb + i * 0.0, feat, ws,
            variant=cfg.rendering.superresolution_module,
            sr_antialias=cfg.rendering.sr_antialias,
            noise_mode="none", rng=None)
        return jnp.sum(out)

    def decode_stage(params, ws, cam, norm, i):
        out = decode(params, ws, cam + i * 0.0, norm, None, cfg,
                     plane_stats=stats)
        return jnp.sum(out["image"])

    t_render = timed(render_stage, params, norm, ray_o, ray_d, tag="render 64^2 (48+48)")
    t_sr = timed(sr_stage, params, rgb_img, feat_img, ws, tag="superresolution 512^2")
    t_dec = timed(decode_stage, params, ws, cam, norm, tag="decode (full frame)")
    print(f"{'render+sr sum':<28} {(t_render + t_sr) * 1e3:8.3f} ms")
    print(f"{'unaccounted':<28} {(t_dec - t_render - t_sr) * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
