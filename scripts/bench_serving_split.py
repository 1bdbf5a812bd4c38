"""Where does the serving frame (bench.py workload) actually go?

Times, inside a lax.scan with the empty-body control subtracted:
  - the full edited frame (render_rays + SR)
  - render only / SR only
  - ONE fused sampling+decode pass on raw coords (prep + kernel + untile)
  - the same pass split into prep-only / kernel-only / untile-only

Usage: cd /root/repo && python scripts/bench_serving_split.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, iters=8, tag="", base=0.0):
    @jax.jit
    def run(*a):
        def body(carry, i):
            return carry + fn(*a, i), None
        acc, _ = lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    float(run(*args))
    t0 = time.perf_counter()
    for _ in range(2):
        float(run(*args))
    dt = (time.perf_counter() - t0) / (2 * iters)
    print(f"{tag:<44} {dt * 1e3:8.3f} ms   (-ctrl {max(dt - base, 0) * 1e3:7.3f})",
          flush=True)
    return dt


def main():
    from nerffaceediting_tpu.ops import precision as prec

    prec.set_precision(lax.Precision.DEFAULT)

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.editing.api import (
        decode, encode, swap_appearance_stats)
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.models.triplane import _decoder_fn
    from nerffaceediting_tpu.models.superresolution import superresolution
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)
    from nerffaceediting_tpu.render.ray_sampler import sample_rays
    from nerffaceediting_tpu.render.renderer import render_rays, sample_stratified
    from nerffaceediting_tpu.ops import triplane_kernel as tk

    cfg = ffhq_generator_config()
    rcfg = cfg.rendering
    params = triplane.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    cam = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837))
    ws = triplane.mapping(params, z, cam, cfg)
    norm, stats = swap_appearance_stats(
        encode(params, ws, cfg),
        encode(params, triplane.mapping(
            params, jax.random.normal(jax.random.key(2), (1, cfg.z_dim)),
            cam, cfg), cfg))
    res = cfg.neural_rendering_resolution
    S = rcfg.depth_resolution
    ray_o, ray_d = sample_rays(cam[:, :16].reshape(-1, 4, 4),
                               cam[:, 16:25].reshape(-1, 3, 3), res)
    B, R = ray_o.shape[:2]
    depths = sample_stratified(None, ray_o, rcfg.ray_start, rcfg.ray_end, S,
                               rcfg.disparity_space_sampling)
    coords = (ray_o[:, :, None] + depths * ray_d[:, :, None]).reshape(B, -1, 3)
    M = coords.shape[1]
    ray_shape = (res, res, S)

    N_, n_p, C_, H_, W_ = norm.shape
    hwc = norm.reshape(N_ * n_p, C_, H_, W_).transpose(0, 2, 3, 1)
    canvas = tk.build_plane_canvas(hwc)
    hwc_dev = jax.device_put(hwc)

    ctrl = timed(lambda i: i * 0.0, tag="control (empty scan body)")

    def full_frame(norm_, cam_, i):
        out = decode(params, ws, cam_ + i * 0.0, norm_, None, cfg,
                     plane_stats=stats, coherent=True, fused_decoder=True)
        return jnp.sum(out["image"])

    timed(full_frame, norm, cam, tag="FULL edited frame (render+SR)", base=ctrl)

    def render_only(norm_, cam_, i):
        cam2world = (cam_ + i * 0.0)[:, :16].reshape(-1, 4, 4)
        intr = cam_[:, 16:25].reshape(-1, 3, 3)
        ro, rd = sample_rays(cam2world, intr, res)
        feats, segs, dpt, wsum = render_rays(
            _decoder_fn(cfg), params["decoder"], norm_, None, ro, rd, rcfg,
            rng=None, plane_stats=stats, coherent=True, fused_decoder=True,
            canvas=canvas)
        return jnp.sum(feats) + jnp.sum(segs)

    timed(render_only, norm, cam, tag="render_rays only (two passes, march)",
          base=ctrl)

    feat_img = jax.random.normal(jax.random.key(7), (1, 32, res, res))
    ws_b = ws

    def sr_only(fi, i):
        img = superresolution(
            params["superresolution"], fi[:, :3] + i * 0.0, fi, ws_b,
            variant=rcfg.superresolution_module,
            sr_antialias=rcfg.sr_antialias,
            noise_mode=rcfg.superresolution_noise_mode, rng=None)
        return jnp.sum(img)

    timed(sr_only, feat_img, tag="SR only (64->512 8XDC)", base=ctrl)

    def one_pass(norm_hwc, coords_, i):
        out = tk.triplane_sample_decode(
            norm_hwc, coords_ + i * 0.0, params["decoder"], stats,
            box_warp=rcfg.box_warp, ray_shape=ray_shape,
            lr_multiplier=rcfg.decoder_lr_mul, canvas=canvas)
        return jnp.sum(out["rgb"]) + jnp.sum(out["sigma"])

    timed(one_pass, hwc_dev, coords, tag="ONE fused pass (prep+kernel+untile)",
          base=ctrl)

    # ----- split the pass into prep / kernel / untile -------------------
    tile_p = tk.DEFAULT_TILE_P

    def prep(coords_):
        s = (2.0 / rcfg.box_warp)
        x, y, zc = (coords_[..., 0] * s, coords_[..., 1] * s,
                    coords_[..., 2] * s)
        xyz = jnp.stack([x, y, zc], axis=1).reshape(3, M)
        xyz_t = tk._tile_perm(xyz, ray_shape, tile_p)
        Mt = xyz_t.shape[1]
        nt = Mt // tile_p
        xt, yt, zt = xyz_t[0], xyz_t[1], xyz_t[2]
        ut = jnp.stack([xt, xt, zt])
        vt = jnp.stack([yt, zt, xt])
        fut = (ut + 1.0) * (W_ * 0.5) - 0.5
        fvt = (vt + 1.0) * (H_ * 0.5) - 0.5
        x0t = jnp.clip(jnp.floor(fut), -2, W_ + 1)
        y0t = jnp.clip(jnp.floor(fvt), -2, H_ + 1)
        wxt = (fut - jnp.floor(fut)).astype(jnp.float32)
        wyt = (fvt - jnp.floor(fvt)).astype(jnp.float32)
        ry_mass = ((1.0 - wyt) * ((y0t >= 0) & (y0t < H_))
                   + wyt * ((y0t + 1 >= 0) & (y0t + 1 < H_)))
        rx_mass = ((1.0 - wxt) * ((x0t >= 0) & (x0t < W_))
                   + wxt * ((x0t + 1 >= 0) & (x0t + 1 < W_)))
        wsum_t = (ry_mass * rx_mass).astype(jnp.float32)
        nbx, nby = tk._canvas_geom(H_, W_)

        def window_of(v, stride, nb):
            vt_ = v.reshape(3, nt, tile_p)
            b = jnp.clip(jnp.floor((jnp.min(vt_, axis=-1) + tk._PADL) / stride),
                         0, nb - 1).astype(jnp.int32)
            ws_ = (b * stride - tk._PADL).astype(jnp.float32)
            return b, (vt_ - ws_[:, :, None]).reshape(3, Mt)

        bx, rel_x = window_of(x0t, tk._SX, nbx)
        by, rel_y = window_of(y0t, tk._SY, nby)
        bidx = bx * nby + by
        pts = jnp.stack([rel_y, rel_x, wyt, wxt, wsum_t], axis=1)
        return bidx, pts

    def prep_only(coords_, i):
        bidx, pts = prep(coords_ + i * 0.0)
        return jnp.sum(pts) + jnp.sum(bidx)

    timed(prep_only, coords, tag="  pass prep (perm+window+stack)", base=ctrl)

    bidx0, pts0 = jax.jit(prep)(coords)
    OUT = 1 + 15 + 32

    def kernel_only(bidx_, pts_, i):
        # mirror triplane_sample_decode's fused_call on fixed pts
        out = tk._decode_call_for_bench(
            bidx_, pts_ + i * 0.0, canvas, params["decoder"], stats,
            lr_multiplier=rcfg.decoder_lr_mul, tile_p=tile_p)
        return jnp.sum(out)

    if hasattr(tk, "_decode_call_for_bench"):
        timed(kernel_only, bidx0, pts0, tag="  pass kernel (pallas only)",
              base=ctrl)

    out0 = jnp.zeros((1, OUT, pts0.shape[2]), jnp.float32)

    def untile_only(o, i):
        return jnp.sum(tk._untile_perm(o + i * 0.0, M, ray_shape))

    timed(untile_only, out0, tag="  pass untile (perm back)", base=ctrl)


if __name__ == "__main__":
    main()
