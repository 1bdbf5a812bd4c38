"""Micro-bench: Pallas tri-plane sampling alone vs decoder MLPs alone
(the two halves of run_model's 10 ms/pass).

Usage: python scripts/bench_kernel_split.py
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
    from nerffaceediting_tpu.models.decoders import disentangled_osg_decoder
    from nerffaceediting_tpu.models.triplane import init_generator
    from nerffaceediting_tpu.ops.triplane_kernel import triplane_sample
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)
    from nerffaceediting_tpu.render.ray_sampler import sample_rays
    from nerffaceediting_tpu.render.renderer import sample_stratified

    cfg = ffhq_generator_config()
    rcfg = cfg.rendering
    params = init_generator(jax.random.key(0), cfg)
    cam = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837))
    res = cfg.neural_rendering_resolution
    S = rcfg.depth_resolution
    ray_o, ray_d = sample_rays(cam[:, :16].reshape(-1, 4, 4),
                               cam[:, 16:25].reshape(-1, 3, 3), res)
    depths = sample_stratified(None, ray_o, rcfg.ray_start, rcfg.ray_end, S,
                               rcfg.disparity_space_sampling)
    B = 1
    coords = (ray_o[:, :, None] + depths * ray_d[:, :, None]).reshape(B, -1, 3)
    M = coords.shape[1]
    print(f"points per pass: {M}")

    planes_hwc = jax.random.normal(jax.random.key(1), (3, 256, 256, 32))

    def sample_only(planes, coords_, i):
        s, wsum = triplane_sample(planes, coords_ + i * 0.0,
                                  box_warp=rcfg.box_warp,
                                  ray_shape=(res, res, S))
        return jnp.sum(s) + jnp.sum(wsum)

    t_sample = timed(sample_only, planes_hwc, coords,
                     tag="triplane_sample (3 planes)")

    sampled = jax.random.normal(jax.random.key(2), (1, 3, M, 32))

    def decode_only(dp, s_, i):
        out = disentangled_osg_decoder(dp, s_ + i * 0.0, s_)
        return jnp.sum(out["rgb"]) + jnp.sum(out["sigma"]) + jnp.sum(out["seg"])

    t_dec = timed(decode_only, params["decoder"], sampled, tag="decoder MLPs")
    print(f"{'sample+decode':<34} {(t_sample + t_dec) * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
