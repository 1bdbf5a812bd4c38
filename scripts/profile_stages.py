"""Per-stage timing of the 512² edited-frame pipeline on the real TPU.

Measurement methodology (IMPORTANT): on this environment's tunneled TPU
platform, `block_until_ready` can return before device execution completes,
and per-dispatch round-trips cost ~30-40 ms. The only reliable stage timing
is *amortized chained execution*: run the stage k times inside ONE jitted
lax.scan with a data dependency between iterations, force with float(), and
report (t(k2) - t(k1)) / (k2 - k1).

Run: python scripts/profile_stages.py [--bf16]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


K1, K2 = 4, 16


def chain_time(step_fn, x0, k1=K1, k2=K2):
    """step_fn: carry -> (carry, scalar). Returns amortized ms/iter."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(x, k):
        def body(c, _):
            c2, s = step_fn(c)
            return c2, s
        _, sums = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(sums)

    ts = []
    for k in (k1, k2):
        float(chain(x0, k))  # compile + warm
        t0 = time.perf_counter()
        float(chain(x0, k))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (k2 - k1) * 1e3


def main():
    from jax import lax
    from nerffaceediting_tpu.ops import precision as prec
    if "--bf16" in sys.argv:
        prec.set_precision(lax.Precision.DEFAULT)
        print("precision: DEFAULT (bf16 passes)")
    else:
        print("precision: HIGHEST (f32)")

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.models.decoders import disentangled_osg_decoder
    from nerffaceediting_tpu.models.superresolution import superresolution
    from nerffaceediting_tpu.ops.triplane_kernel import triplane_sample
    from nerffaceediting_tpu.render import renderer
    from nerffaceediting_tpu.render.ray_marcher import seg_mip_ray_marcher
    from nerffaceediting_tpu.editing.api import decode, encode, swap_appearance_stats
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    cfg = ffhq_generator_config()
    params = triplane.init_generator(jax.random.key(0), cfg)
    B, R, S = 1, 64 * 64, 48
    M = R * S
    NP, C, H, W = 3, 32, 256, 256
    print(f"shapes: B={B} R={R} S={S} M={M}")

    planes_hwc = jax.random.normal(jax.random.key(1), (NP, H, W, C))

    # --- triplane kernel: chain by perturbing coords from previous output sum
    coords0 = jax.random.uniform(jax.random.key(2), (B, M, 3), minval=-0.45, maxval=0.45)

    def step_kernel(c):
        s, _ = triplane_sample(planes_hwc, c, box_warp=1.0)
        t = jnp.sum(s) * 1e-12
        return c + t, jnp.sum(s)

    print(f"triplane_sample 1 pass: {chain_time(step_kernel, coords0):.3f} ms")

    # --- decoder
    sampled0 = jax.random.normal(jax.random.key(3), (B, NP, M, C))

    def step_dec(x):
        o = disentangled_osg_decoder(params["decoder"], x, x)
        s = jnp.sum(o["rgb"]) + jnp.sum(o["sigma"]) + jnp.sum(o["seg"])
        return x + s * 1e-12, s

    print(f"decoder: {chain_time(step_dec, sampled0):.3f} ms")

    # --- unify_samples
    d1 = jnp.sort(jax.random.uniform(jax.random.key(4), (B, R, S, 1)), axis=-2)
    d2 = jnp.sort(jax.random.uniform(jax.random.key(5), (B, R, S, 1)), axis=-2)
    c1 = jax.random.normal(jax.random.key(6), (B, R, S, 32))
    s1 = jax.random.normal(jax.random.key(8), (B, R, S, 15))
    g1 = jnp.abs(jax.random.normal(jax.random.key(10), (B, R, S, 1)))

    def step_unify(d):
        outs = renderer.unify_samples(d, d2, (c1, c1), (g1, g1), (s1, s1))
        s = sum(jnp.sum(o) for o in outs)
        return d + s * 1e-12, s

    print(f"unify_samples: {chain_time(step_unify, d1):.3f} ms")

    # --- marcher
    allc = jnp.concatenate([c1, c1], axis=-2)
    alls = jnp.concatenate([s1, s1], axis=-2)
    alld = jnp.concatenate([d1, d2], axis=-2)
    allg = jnp.concatenate([g1, g1], axis=-2)

    def step_march(c):
        rgb, seg, dep, w = seg_mip_ray_marcher(c, alls, allg, alld,
                                               clamp_mode="softplus", white_back=False)
        s = jnp.sum(rgb) + jnp.sum(seg) + jnp.sum(dep)
        return c + s * 1e-12, s

    print(f"seg marcher (96): {chain_time(step_march, allc):.3f} ms")

    # --- SR
    x0 = jax.random.normal(jax.random.key(11), (B, 32, 64, 64))
    ws = triplane.mapping(params, jax.random.normal(jax.random.key(12), (1, cfg.z_dim)),
                          jnp.zeros((1, 25)), cfg)

    def step_sr(x):
        out = superresolution(params["superresolution"], x[:, :3], x, ws,
                              variant=cfg.rendering.superresolution_module,
                              sr_antialias=cfg.rendering.sr_antialias)
        s = jnp.sum(out)
        return x + s * 1e-12, s

    print(f"SR 64->512: {chain_time(step_sr, x0):.3f} ms")

    # --- full decode frame
    z = jax.random.normal(jax.random.key(13), (1, cfg.z_dim))
    c0 = camera_params(lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
                       fov_to_intrinsics(18.837))
    ws_full = triplane.mapping(params, z, c0, cfg)
    planes_src = encode(params, ws_full, cfg)
    planes_sty = encode(params, triplane.mapping(
        params, jax.random.normal(jax.random.key(14), (1, cfg.z_dim)), c0, cfg), cfg)
    norm, stats = swap_appearance_stats(planes_src, planes_sty)

    def step_frame(cam):
        out = decode(params, ws_full, cam[None], norm, None, cfg, plane_stats=stats)
        s = jnp.sum(out["image"])
        return cam + s * 1e-12, s

    print(f"full decode frame: {chain_time(step_frame, c0[0]):.3f} ms")


if __name__ == "__main__":
    main()
