"""Benchmark: 512² edited frames/sec on one TPU chip.

Measures the headline workload (BASELINE.json config 4): appearance-edited
tri-plane → full 512² frame, i.e. the fused planes→frame device program
(normalize/denorm-swap planes → 64² two-pass render (48+48) → SR 8XDC).
This is the editing hot path a NeRFFaceEditing user runs per video frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to an estimated 25 frames/sec for the PyTorch
reference on one V100 (the reference publishes no numbers — BASELINE.md;
EG3D reports ~36 fps on an RTX 3090 for the plain model, and
NeRFFaceEditing's dual-decoder + seg rendering roughly halves that on the
slower V100). The ≥5× north star therefore means vs_baseline ≥ 5.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

V100_BASELINE_FPS = 25.0


def main():
    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.editing.api import decode, encode, swap_appearance
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    cfg = ffhq_generator_config()
    params = triplane.init_generator(jax.random.key(0), cfg)

    # Source identity + style identity planes (computed once, outside the
    # timed edit loop — an editing session reuses cached planes).
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    c0 = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837),
    )
    ws = triplane.mapping(params, z, c0, cfg)
    planes_src = encode(params, ws, cfg)
    planes_sty = encode(
        params, triplane.mapping(params, jax.random.normal(jax.random.key(2), (1, cfg.z_dim)), c0, cfg),
        cfg,
    )

    @jax.jit
    def edited_frame(params, planes_src, planes_sty, ws, cam):
        norm, denorm = swap_appearance(planes_src, planes_sty)
        out = decode(params, ws, cam, norm, denorm, cfg)
        # Scalar checksum: forces full execution with a 4-byte host fetch
        # (block_until_ready is unreliable through the axon tunnel).
        return out["image"], jnp.sum(out["image"])

    # camera orbit (gen_videos-style trajectory)
    cams = [
        camera_params(
            lookat_pose(np.pi / 2 + 0.4 * np.sin(2 * np.pi * i / 16),
                        np.pi / 2 - 0.25 * np.cos(2 * np.pi * i / 16),
                        (0, 0, 0.2), radius=2.7),
            fov_to_intrinsics(18.837),
        )
        for i in range(16)
    ]

    # warmup / compile
    _, s = edited_frame(params, planes_src, planes_sty, ws, cams[0])
    float(s)

    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        _, s = edited_frame(params, planes_src, planes_sty, ws, cams[i % len(cams)])
        float(s)  # sync
    dt = (time.perf_counter() - t0) / n_iters

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "512x512 edited frames/sec/chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
