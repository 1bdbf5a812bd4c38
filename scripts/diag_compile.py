"""Compile-only bisect for the r3 LLO crash (llo::CouldLtS32) on the
serving path. Lowers+compiles each stage separately WITHOUT running, so it
can run while another process owns the chip.

Usage: python scripts/diag_compile.py [stage ...]
stages: fused1 (single fused-decode frame), composite (composite_two_pass
XLA path), marchw (weights-only marcher), windowed (decomposed sampling
kernel), scan1/scan2/scan4 (G-frame scan groups with the hoisted canvas),
scan1nh/scan2nh/scan4nh (same without the canvas hoist — per-frame build).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    want = sys.argv[1:]
    stages = {"fused1", "composite", "marchw", "windowed",
              "scan1", "scan2", "scan4", "scan1nh", "scan2nh", "scan4nh",
              "tiled1", "tiledscan"}
    unknown = [w for w in want if w not in stages]
    if unknown:
        sys.exit(f"unknown stage(s) {unknown}; valid: {sorted(stages)}")
    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.editing.api import decode, plane_canvas
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    cfg = ffhq_generator_config()
    res = cfg.neural_rendering_resolution
    C = 32
    norm = jnp.zeros((1, 3, C, 256, 256), jnp.float32)
    stats = (jnp.zeros((1, 3, C)), jnp.ones((1, 3, C)))
    cam = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837))

    def check(name, fn, *args):
        if want and name not in want:
            return
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"{name}: OK", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

    # --- composite_two_pass XLA path (default since r3) ---
    from nerffaceediting_tpu.render.renderer import composite_two_pass
    R, S1, S2 = res * res, 48, 48
    d1 = jnp.linspace(2.0, 3.0, S1)[None, None, :, None].repeat(R, 1)
    d2 = d1[:, :, :S2] + 0.01
    cols = (jnp.zeros((1, R, S1, 32)), jnp.zeros((1, R, S2, 32)))
    dens = (jnp.zeros((1, R, S1, 1)), jnp.zeros((1, R, S2, 1)))
    segs = (jnp.zeros((1, R, S1, 15)), jnp.zeros((1, R, S2, 15)))
    check("composite",
          lambda a, b, c, d, s: composite_two_pass(a, b, c, d, s),
          d1, d2, cols, dens, segs)

    from nerffaceediting_tpu.render.ray_marcher import march_weights
    check("marchw", lambda dn, dp: march_weights(dn, dp),
          dens[0], d1)

    # --- single fused-decode frame (kernel path) ---
    from nerffaceediting_tpu.models.triplane import num_synthesis_ws
    n_ws = num_synthesis_ws(cfg.backbone_resolution)

    def one_frame(norm, stats, cam):
        params = triplane.init_generator(jax.random.key(0), cfg)
        ws = jnp.zeros((1, n_ws, cfg.w_dim))
        return decode(params, ws, cam, norm, None, cfg, plane_stats=stats,
                      coherent=True, fused_decoder=True)["image"]

    check("fused1", one_frame, norm, stats, cam)

    # --- decomposed windowed sampling kernel ---
    def one_frame_dec(norm, stats, cam):
        params = triplane.init_generator(jax.random.key(0), cfg)
        ws = jnp.zeros((1, n_ws, cfg.w_dim))
        return decode(params, ws, cam, norm, None, cfg, plane_stats=stats,
                      coherent=True, fused_decoder=False)["image"]

    check("windowed", one_frame_dec, norm, stats, cam)

    # --- G-frame scan group over the fused path (bench body shape) ---
    def make_scan(G, hoist: bool, n_frames=8):
        def scanG(norm, stats, cams):
            params = triplane.init_generator(jax.random.key(0), cfg)
            ws = jnp.zeros((1, n_ws, cfg.w_dim))
            canvas = plane_canvas(norm) if hoist else None

            def body(acc, cam_group):
                for k in range(G):
                    out = decode(params, ws, cam_group[k][None], norm, None,
                                 cfg, plane_stats=stats, coherent=True,
                                 fused_decoder=True, canvas=canvas)
                    acc = acc + jnp.sum(out["image"])
                return acc, None

            acc, _ = jax.lax.scan(body, 0.0,
                                  cams.reshape(-1, G, cams.shape[-1]))
            return acc

        return scanG, jnp.concatenate([cam] * n_frames)

    for G in (1, 2, 4):
        fn, cams = make_scan(G, hoist=True)
        check(f"scan{G}", fn, norm, stats, cams)
        fn, cams = make_scan(G, hoist=False)
        check(f"scan{G}nh", fn, norm, stats, cams)

    # --- tiled-composite serving path (NFE_TILED_COMPOSITE=1): the ab4 T1
    # bench leg exceeded its 20-min compile timeout at f128 — compile-only
    # repro to separate "hangs the pipeline emitter" from "slow but finite".
    if {"tiled1", "tiledscan"} & set(want or stages):
        import time as _time

        os.environ["NFE_TILED_COMPOSITE"] = "1"
        for name, fn_, args_ in (
                ("tiled1", one_frame, (norm, stats, cam)),
                ("tiledscan", *(lambda p: (p[0], (norm, stats, p[1])))(
                    make_scan(1, hoist=True)))):
            if want and name not in want:
                continue
            t0 = _time.time()
            check(name, fn_, *args_)
            print(f"{name} compile wall: {_time.time() - t0:.0f}s", flush=True)
        os.environ.pop("NFE_TILED_COMPOSITE", None)


if __name__ == "__main__":
    main()
