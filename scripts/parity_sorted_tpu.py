"""On-chip value parity: sorted-grid serving kernel vs the fused kernel.

The sorted variant writes samples through a scalar-prefetched OUTPUT index
map (the argsort permutation); interpret-mode tests prove the semantics,
this proves the Mosaic lowering on the real chip produces the same values
(a wrong-but-finite lowering would slip past bench.py's NaN checksum).

Usage: python scripts/parity_sorted_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    from nerffaceediting_tpu.ops import precision as prec

    prec.set_precision(lax.Precision.DEFAULT)

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.editing.api import (
        decode_frames, encode, plane_canvas, swap_appearance_stats)
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.ops import triplane_kernel as tk
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    cfg = ffhq_generator_config()
    params = triplane.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    cam = camera_params(
        lookat_pose(np.pi / 2 + 0.3, np.pi / 2 - 0.2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837))
    ws = triplane.mapping(params, z, cam, cfg)
    norm, stats = swap_appearance_stats(
        encode(params, ws, cfg),
        encode(params, triplane.mapping(
            params, jax.random.normal(jax.random.key(2), (1, cfg.z_dim)),
            cam, cfg), cfg))
    canvas = jax.jit(plane_canvas)(norm)

    def frame(sorted_mode):
        tk._SORTED_FORCE = sorted_mode
        jax.clear_caches()
        out = jax.jit(lambda p, w, c, n, cv: decode_frames(
            p, w, c, n, None, cfg, plane_stats=stats, coherent=True,
            fused_decoder=True, canvas=cv)["image"])(params, ws, cam, norm,
                                                     canvas)
        return np.asarray(out)

    a = frame(False)
    b = frame(True)
    tk._SORTED_FORCE = False
    d = np.abs(a - b).max()
    ok = np.isfinite(b).all() and d < 5e-3
    print(f"maxabs(sorted - fused) = {d:.3e}  finite={np.isfinite(b).all()}"
          f"  -> {'OK' if ok else 'MISMATCH'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
