"""Variant shootout for the serving render's non-kernel stages: ray marcher
(cumprod lowering), coarse+fine merge (one-hot dtype), sample_pdf.

Each candidate runs inside one jitted lax.scan (iters=8) with an empty-body
control subtracted — the axon tunnel adds ~2 ms of fixed cost per scan
iteration (memory: tpu-measurement-gotchas).

Usage: cd /root/repo && python scripts/bench_march_variants.py
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
    print(f"{tag:<40} {dt * 1e3:8.3f} ms   (-ctrl {max(dt - base, 0) * 1e3:8.3f})",
          flush=True)
    return dt


def main():
    from nerffaceediting_tpu.ops import precision as prec

    prec.set_precision(lax.Precision.DEFAULT)

    from nerffaceediting_tpu.render.renderer import (
        sample_importance, unify_samples)
    from nerffaceediting_tpu.render.ray_marcher import seg_mip_ray_marcher

    B, R, S = 1, 4096, 48
    SM = 96  # merged
    key = jax.random.key
    colors = jax.random.normal(key(1), (B, R, SM, 32))
    sigmas = jax.random.normal(key(2), (B, R, SM, 1))
    segs = jax.random.normal(key(3), (B, R, SM, 15))
    depths = jnp.sort(jax.random.uniform(key(4), (B, R, SM, 1)) + 2.25, axis=2)
    d48 = depths[:, :, :S]
    c48, s48, g48 = colors[:, :, :S], sigmas[:, :, :S], segs[:, :, :S]

    ctrl = timed(lambda i: i * 0.0, tag="control (empty scan body)")

    def march_cur(i):
        rgb, seg, depth, w = seg_mip_ray_marcher(
            colors + i * 0.0, segs, sigmas, depths,
            clamp_mode="softplus", white_back=False)
        return jnp.sum(rgb) + jnp.sum(w)

    timed(march_cur, tag="march 96 current (cumprod)", base=ctrl)

    def composite_log(colors_, segs_, densities, depths_, tri=False):
        deltas = depths_[:, :, 1:] - depths_[:, :, :-1]
        colors_mid = (colors_[:, :, :-1] + colors_[:, :, 1:]) / 2
        densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
        depths_mid = (depths_[:, :, :-1] + depths_[:, :, 1:]) / 2
        segs_mid = (segs_[:, :, :-1] + segs_[:, :, 1:]) / 2
        densities_mid = jax.nn.softplus(densities_mid - 1)
        alpha = 1 - jnp.exp(-densities_mid * deltas)
        l = jnp.log(1 - alpha + 1e-10)[..., 0]  # (B,R,S-1)
        n = l.shape[-1]
        if tri:
            M = jnp.asarray(np.tril(np.ones((n, n), np.float32), -1))
            csum = jnp.einsum("brj,sj->brs", l, M,
                              precision=lax.Precision.HIGHEST)
        else:
            csum = jnp.cumsum(l, axis=-1) - l  # exclusive
        T = jnp.exp(csum)[..., None]
        weights = alpha * T
        composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
        wt = jnp.sum(weights, axis=2)
        composite_depth = jnp.sum(weights * depths_mid, axis=-2) / wt
        composite_depth = jnp.where(jnp.isnan(composite_depth), jnp.inf,
                                    composite_depth)
        composite_depth = jnp.clip(composite_depth, jnp.min(depths_),
                                   jnp.max(depths_))
        composite_seg = jnp.sum(weights * segs_mid, axis=-2)
        composite_rgb = composite_rgb * 2 - 1
        return composite_rgb, composite_seg, composite_depth, weights

    def march_logcs(i):
        rgb, seg, depth, w = composite_log(colors + i * 0.0, segs, sigmas,
                                           depths)
        return jnp.sum(rgb) + jnp.sum(w)

    timed(march_logcs, tag="march 96 log-cumsum", base=ctrl)

    def march_logtri(i):
        rgb, seg, depth, w = composite_log(colors + i * 0.0, segs, sigmas,
                                           depths, tri=True)
        return jnp.sum(rgb) + jnp.sum(w)

    timed(march_logtri, tag="march 96 log-trimatmul", base=ctrl)

    # numerical agreement
    r0 = seg_mip_ray_marcher(colors, segs, sigmas, depths,
                             clamp_mode="softplus", white_back=False)
    r1 = composite_log(colors, segs, sigmas, depths)
    r2 = composite_log(colors, segs, sigmas, depths, tri=True)
    for tag, r in (("log-cumsum", r1), ("log-tri", r2)):
        err = max(float(jnp.max(jnp.abs(a - b))) for a, b in
                  [(r0[0], r[0]), (r0[1], r[1]), (r0[3], r[3])])
        print(f"  maxabs vs cumprod [{tag}]: {err:.3e}")

    d2 = d48 + 0.007

    def merge_cur(i):
        outs = unify_samples(d48 + i * 0.0, d2, (c48, c48),
                             (s48, s48), (g48, g48))
        return jnp.sum(outs[1])

    timed(merge_cur, tag="merge current (f32 one-hot)", base=ctrl)

    def merge_bf16(i):
        depths1, depths2 = d48 + i * 0.0, d2
        dd1 = depths1[..., 0]
        dd2 = depths2[..., 0]
        S1, S2 = dd1.shape[-1], dd2.shape[-1]
        SS = S1 + S2
        less = dd2[..., None, :] < dd1[..., :, None]
        rank1 = jnp.arange(S1) + jnp.sum(less, axis=-1)
        leq = dd1[..., None, :] <= dd2[..., :, None]
        rank2 = jnp.arange(S2) + jnp.sum(leq, axis=-1)
        ranks = jnp.concatenate([rank1, rank2], axis=-1)
        out_pos = jnp.arange(SS)
        # depths: fused comparison-reduce in f32 (no P materialization)
        d_all = jnp.concatenate([depths1, depths2], axis=-2)[..., 0]
        eq = out_pos[:, None] == ranks[..., None, :]
        d_merged = jnp.sum(jnp.where(eq, d_all[..., None, :], 0.0), axis=-1)
        # payload: bf16 one-hot MXU contraction (P rows are exact 0/1)
        P = eq.astype(jnp.bfloat16)
        packed = jnp.concatenate(
            [jnp.concatenate([c48, c48], -2), jnp.concatenate([s48, s48], -2),
             jnp.concatenate([g48, g48], -2)], axis=-1).astype(jnp.bfloat16)
        merged = jnp.einsum("brij,brjc->bric", P, packed,
                            preferred_element_type=jnp.float32)
        return jnp.sum(merged) + jnp.sum(d_merged)

    timed(merge_bf16, tag="merge bf16 payload + fused depths", base=ctrl)

    w48 = jax.nn.softmax(jax.random.normal(key(6), (B, R, S - 1)), -1)

    def imp(i):
        return jnp.sum(sample_importance(None, d48 + i * 0.0, w48, 48))

    timed(imp, tag="sample_importance (current)", base=ctrl)


if __name__ == "__main__":
    main()
