"""Finer split of the 18 ms neural render (scripts/bench_breakdown.py):
run_model (tri-plane sampling + decoder MLPs) per pass, importance-sampling
machinery, and the ray marcher.

Usage: python scripts/bench_render_split.py
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
    @jax.jit
    def run(*a):
        def body(carry, i):
            return carry + fn(*a, i), None
        acc, _ = lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:<34} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    from nerffaceediting_tpu.ops import precision as prec

    prec.set_precision(lax.Precision.DEFAULT)

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.editing.api import encode, swap_appearance_stats
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.models.triplane import _decoder_fn
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)
    from nerffaceediting_tpu.render.ray_sampler import sample_rays
    from nerffaceediting_tpu.render.renderer import (
        run_model, sample_importance, sample_stratified, seg_mip_ray_marcher,
        unify_samples)

    cfg = ffhq_generator_config()
    rcfg = cfg.rendering
    params = triplane.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    cam = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837))
    ws = triplane.mapping(params, z, cam, cfg)
    norm, stats = swap_appearance_stats(encode(params, ws, cfg),
                                        encode(params, ws, cfg))
    res = cfg.neural_rendering_resolution
    ray_o, ray_d = sample_rays(cam[:, :16].reshape(-1, 4, 4),
                               cam[:, 16:25].reshape(-1, 3, 3), res)
    dec_fn = _decoder_fn(cfg)
    B, R = ray_o.shape[:2]
    S = rcfg.depth_resolution

    depths = sample_stratified(None, ray_o, rcfg.ray_start, rcfg.ray_end, S,
                               rcfg.disparity_space_sampling)
    coords = (ray_o[:, :, None] + depths * ray_d[:, :, None]).reshape(B, -1, 3)

    def eval_pass(dp, norm_, coords_, i):
        out = run_model(dec_fn, dp, norm_, None, coords_ + i * 0.0, rcfg,
                        None, plane_stats=stats, ray_shape=(res, res, S))
        return jnp.sum(out["rgb"]) + jnp.sum(out["sigma"]) + jnp.sum(out["seg"])

    t_eval = timed(eval_pass, params["decoder"], norm, coords,
                   tag="run_model 196k pts (one pass)")

    # marcher + importance machinery on fixed tensors
    rngk = jax.random.key(3)
    colors = jax.random.normal(rngk, (B, R, S, 32))
    sigmas = jax.random.normal(jax.random.key(4), (B, R, S, 1))
    segs = jax.random.normal(jax.random.key(5), (B, R, S, 15))

    def march(colors_, segs_, sigmas_, depths_, i):
        rgb, seg, depth, w = seg_mip_ray_marcher(
            colors_ + i * 0.0, segs_, sigmas_, depths_,
            clamp_mode=rcfg.clamp_mode, white_back=rcfg.white_back)
        return jnp.sum(rgb) + jnp.sum(w)

    t_march = timed(march, colors, segs, sigmas, depths, tag="seg marcher (one pass)")

    weights = jax.nn.softmax(jax.random.normal(jax.random.key(6), (B, R, S - 1)), -1)

    def importance(depths_, weights_, i):
        return jnp.sum(sample_importance(None, depths_ + i * 0.0, weights_,
                                         rcfg.depth_resolution_importance))

    t_imp = timed(importance, depths, weights, tag="sample_importance (PDF)")

    d2 = depths + 0.01

    def merge(depths_, d2_, colors_, sigmas_, segs_, i):
        outs = unify_samples(depths_ + i * 0.0, d2_, (colors_, colors_),
                             (sigmas_, sigmas_), (segs_, segs_))
        return jnp.sum(outs[1])

    t_merge = timed(merge, depths, d2, colors, sigmas, segs, tag="unify merge (one-hot)")

    print(f"{'2x eval + 2x march + imp + merge':<34} "
          f"{(2 * t_eval + 2 * t_march + t_imp + t_merge) * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
