"""Measure per-tile plane-window spans for the serving workload (CPU).

The windowed kernel's fast path requires every 256-point tile's footprint
to fit a (WX, WY) plane window (span <= win - 2, ops/triplane_kernel.py
window_of). This script runs bench.py's exact decode path on CPU with
run_model instrumented to capture the coarse/fine sample coords, then
prints the span distribution per plane/axis/pass — so window geometries
for the resident-canvas A/B are chosen from data, not compile-and-pray.

Usage: python scripts/measure_spans.py [n_cams]   (forces the CPU backend)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# The axon sitecustomize pins the TPU backend before this script runs;
# force CPU the way conftest does (the env var alone is ignored).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def tile_spans(coords, box_warp, H, W, ray_shape, tile_p=256):
    """coords (1, M, 3) -> per-plane (u_span, v_span) arrays over tiles."""
    from nerffaceediting_tpu.ops.triplane_kernel import _tile_perm

    s = 2.0 / box_warp
    x, y, z = coords[..., 0] * s, coords[..., 1] * s, coords[..., 2] * s
    xyz = jnp.stack([x, y, z], axis=1).reshape(3, -1)
    xyz_t = _tile_perm(xyz, ray_shape, tile_p)
    xt, yt, zt = xyz_t[0], xyz_t[1], xyz_t[2]
    ut = jnp.stack([xt, xt, zt])
    vt = jnp.stack([yt, zt, xt])
    x0 = jnp.clip(jnp.floor((ut + 1.0) * (W * 0.5) - 0.5), -2, W + 1)
    y0 = jnp.clip(jnp.floor((vt + 1.0) * (H * 0.5) - 0.5), -2, H + 1)
    nt = x0.shape[1] // tile_p
    x0 = x0.reshape(3, nt, tile_p)
    y0 = y0.reshape(3, nt, tile_p)
    return (np.asarray(jnp.max(x0, -1) - jnp.min(x0, -1)),
            np.asarray(jnp.max(y0, -1) - jnp.min(y0, -1)))


def main():
    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.render import renderer as R
    from nerffaceediting_tpu.editing.api import (
        decode, encode, swap_appearance_stats)
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    cfg = ffhq_generator_config()
    params = triplane.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    c0 = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837))
    ws = triplane.mapping(params, z, c0, cfg)
    planes_src = encode(params, ws, cfg)
    planes_sty = encode(
        params,
        triplane.mapping(params, jax.random.normal(jax.random.key(2),
                                                   (1, cfg.z_dim)), c0, cfg),
        cfg)
    norm, stats = swap_appearance_stats(planes_src, planes_sty)
    H, W = norm.shape[-2:]

    captured = []
    orig_run_model = R.run_model

    def spy(decoder_fn, decoder_params, norm_planes, denorm_planes, coords,
            rcfg, rng=None, **kw):
        rs = kw.get("ray_shape")
        # run_model is traced (jax.checkpoint wraps the eval) — capture the
        # concrete coords at execution time via an ordered debug callback.
        jax.debug.callback(
            lambda c: captured.append((np.asarray(c), rs)), coords,
            ordered=True)
        return orig_run_model(decoder_fn, decoder_params, norm_planes,
                              denorm_planes, coords, rcfg, rng, **kw)

    R.run_model = spy

    agg = {}
    for i in range(n_cams):
        cam = camera_params(
            lookat_pose(np.pi / 2 + 0.4 * np.sin(2 * np.pi * i / n_cams),
                        np.pi / 2 - 0.25 * np.cos(2 * np.pi * i / n_cams),
                        (0, 0, 0.2), radius=2.7),
            fov_to_intrinsics(18.837))
        captured.clear()
        decode(params, ws, cam, norm, None, cfg, plane_stats=stats)
        assert len(captured) == 2, len(captured)
        for phase, (coords, rs) in zip(("coarse", "fine"), captured):
            us, vs = tile_spans(coords, cfg.rendering.box_warp, H, W, rs)
            agg.setdefault((phase, "u"), []).append(us)
            agg.setdefault((phase, "v"), []).append(vs)
        print(f"cam {i}: done", flush=True)

    print(f"\nplane layout: H=W={H}")
    print(f"{'pass':<8}{'axis':<6}{'plane':<7}{'max':>6}{'p99.9':>8}"
          f"{'p99':>7}{'p50':>7}")
    for (phase, axis), chunks in agg.items():
        a = np.concatenate(chunks, axis=1)  # (3, total_tiles)
        for p in range(3):
            print(f"{phase:<8}{axis:<6}{p:<7}{a[p].max():>6.0f}"
                  f"{np.percentile(a[p], 99.9):>8.0f}"
                  f"{np.percentile(a[p], 99):>7.0f}"
                  f"{np.percentile(a[p], 50):>7.0f}")


if __name__ == "__main__":
    main()
