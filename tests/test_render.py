"""Render-stack tests: ray sampler vs torch oracle, marcher math, importance
sampling, tri-plane projection semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nerffaceediting_tpu.config import ffhq_rendering_config
from nerffaceediting_tpu.render.ray_sampler import sample_rays
from nerffaceediting_tpu.render.math_utils import get_ray_limits_box, linspace_batch
from nerffaceediting_tpu.render.ray_marcher import mip_ray_marcher, seg_mip_ray_marcher
from nerffaceediting_tpu.render.renderer import (
    project_onto_planes,
    sample_from_planes,
    sample_stratified,
    sample_pdf,
    sample_importance,
    unify_samples,
    render_rays,
)
from nerffaceediting_tpu.render.cameras import (
    lookat_pose,
    fov_to_intrinsics,
    camera_params,
)


def torch_ray_sampler(cam2world, intrinsics, resolution):
    """Oracle transcribing the documented ray contract with torch ops."""
    c2w = torch.tensor(np.asarray(cam2world))
    K = torch.tensor(np.asarray(intrinsics))
    N, M = c2w.shape[0], resolution**2
    cam_locs = c2w[:, :3, 3]
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy, sk = K[:, 0, 2], K[:, 1, 2], K[:, 0, 1]
    uv = torch.stack(
        torch.meshgrid(
            torch.arange(resolution, dtype=torch.float32),
            torch.arange(resolution, dtype=torch.float32),
            indexing="ij",
        )
    ) * (1.0 / resolution) + (0.5 / resolution)
    uv = uv.flip(0).reshape(2, -1).transpose(1, 0)[None].repeat(N, 1, 1)
    x_cam, y_cam = uv[:, :, 0], uv[:, :, 1]
    z_cam = torch.ones((N, M))
    x_lift = (x_cam - cx[:, None] + cy[:, None] * sk[:, None] / fy[:, None]
              - sk[:, None] * y_cam / fy[:, None]) / fx[:, None] * z_cam
    y_lift = (y_cam - cy[:, None]) / fy[:, None] * z_cam
    cam_rel = torch.stack((x_lift, y_lift, z_cam, torch.ones_like(z_cam)), dim=-1)
    world = torch.bmm(c2w, cam_rel.permute(0, 2, 1)).permute(0, 2, 1)[:, :, :3]
    dirs = F.normalize(world - cam_locs[:, None, :], dim=2)
    origins = cam_locs[:, None, :].repeat(1, M, 1)
    return origins.numpy(), dirs.numpy()


class TestRaySampler:
    def test_matches_oracle(self):
        cam2world = np.asarray(
            lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7, batch_size=2)
        )
        intr = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (2, 1, 1))
        o, d = sample_rays(jnp.asarray(cam2world), jnp.asarray(intr), 16)
        o_ref, d_ref = torch_ray_sampler(cam2world, intr, 16)
        np.testing.assert_allclose(np.asarray(o), o_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-5)

    def test_dirs_normalized(self):
        cam2world = np.asarray(lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0), radius=2.7))
        intr = np.asarray(fov_to_intrinsics(18.837))[None]
        _, d = sample_rays(jnp.asarray(cam2world), jnp.asarray(intr), 8)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, rtol=1e-5)


class TestCameras:
    def test_lookat_frontal(self):
        """Frontal pose (h=v=π/2, radius r) places the camera at ~(0,0,r)
        looking at -z... i.e. toward the origin."""
        m = np.asarray(lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0), radius=2.7))[0]
        np.testing.assert_allclose(m[:3, 3], [0, 0, 2.7], atol=1e-5)
        # forward (third column of rotation) points from camera to origin (-z)
        np.testing.assert_allclose(m[:3, 2], [0, 0, -1], atol=1e-5)

    def test_camera_params_shape(self):
        m = lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7, batch_size=3)
        c = camera_params(m, fov_to_intrinsics(18.837))
        assert c.shape == (3, 25)


class TestRayBox:
    def test_through_origin_hits(self):
        o = jnp.asarray([[[0.0, 0.0, -2.0]]])
        d = jnp.asarray([[[0.0, 0.0, 1.0]]])
        t0, t1 = get_ray_limits_box(o, d, 1.0)
        np.testing.assert_allclose(np.asarray(t0)[0, 0, 0], 1.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t1)[0, 0, 0], 2.5, atol=1e-6)

    def test_miss_returns_sentinels(self):
        o = jnp.asarray([[[0.0, 5.0, -2.0]]])
        d = jnp.asarray([[[0.0, 0.0, 1.0]]])
        t0, t1 = get_ray_limits_box(o, d, 1.0)
        assert float(t0[0, 0, 0]) == -1.0
        assert float(t1[0, 0, 0]) == -2.0

    def test_linspace_batch(self):
        start = jnp.zeros((2, 3))
        stop = jnp.ones((2, 3)) * 4
        out = linspace_batch(start, stop, 5)
        assert out.shape == (5, 2, 3)
        np.testing.assert_allclose(np.asarray(out)[:, 0, 0], [0, 1, 2, 3, 4], atol=1e-6)


def torch_mip_marcher(colors, densities, depths, white_back=False):
    """Oracle for the MipNeRF marcher (independent transcription of the
    documented compositing contract)."""
    c = torch.tensor(np.asarray(colors), dtype=torch.float64)
    s = torch.tensor(np.asarray(densities), dtype=torch.float64)
    t = torch.tensor(np.asarray(depths), dtype=torch.float64)
    deltas = t[:, :, 1:] - t[:, :, :-1]
    c_mid = (c[:, :, :-1] + c[:, :, 1:]) / 2
    s_mid = F.softplus((s[:, :, :-1] + s[:, :, 1:]) / 2 - 1)
    t_mid = (t[:, :, :-1] + t[:, :, 1:]) / 2
    alpha = 1 - torch.exp(-s_mid * deltas)
    shifted = torch.cat([torch.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], -2)
    weights = alpha * torch.cumprod(shifted, -2)[:, :, :-1]
    rgb = (weights * c_mid).sum(-2)
    wt = weights.sum(2)
    depth = (weights * t_mid).sum(-2) / wt
    depth = torch.nan_to_num(depth, float("inf")).clamp(t.min(), t.max())
    if white_back:
        rgb = rgb + 1 - wt
    return (rgb * 2 - 1).numpy(), depth.numpy(), weights.numpy()


class TestRayMarcher:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        B, R, S = 2, 7, 12
        colors = rng.uniform(0, 1, (B, R, S, 3)).astype(np.float32)
        densities = rng.normal(0, 2, (B, R, S, 1)).astype(np.float32)
        depths = np.sort(rng.uniform(2.0, 3.5, (B, R, S, 1)).astype(np.float32), axis=2)
        rgb, depth, weights = mip_ray_marcher(
            jnp.asarray(colors), jnp.asarray(densities), jnp.asarray(depths)
        )
        rgb_ref, depth_ref, w_ref = torch_mip_marcher(colors, densities, depths)
        np.testing.assert_allclose(np.asarray(rgb), rgb_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(weights), w_ref, rtol=1e-4, atol=1e-5)

    def test_march_weights_matches_full_composite(self):
        """The weights-only marcher (coarse importance driver) must emit
        exactly the weights of the full composite."""
        from nerffaceediting_tpu.render.ray_marcher import march_weights

        rng = np.random.default_rng(7)
        B, R, S = 2, 6, 11
        colors = rng.uniform(0, 1, (B, R, S, 3)).astype(np.float32)
        densities = rng.normal(0, 2, (B, R, S, 1)).astype(np.float32)
        depths = np.sort(rng.uniform(2.0, 3.5, (B, R, S, 1)).astype(np.float32), axis=2)
        _, _, w_full = mip_ray_marcher(
            jnp.asarray(colors), jnp.asarray(densities), jnp.asarray(depths))
        w_only = march_weights(jnp.asarray(densities), jnp.asarray(depths))
        np.testing.assert_array_equal(np.asarray(w_only), np.asarray(w_full))

    def test_seg_composited_with_same_weights(self):
        rng = np.random.default_rng(1)
        B, R, S, K = 1, 5, 9, 15
        colors = rng.uniform(0, 1, (B, R, S, 3)).astype(np.float32)
        segs = rng.normal(size=(B, R, S, K)).astype(np.float32)
        densities = rng.normal(0, 2, (B, R, S, 1)).astype(np.float32)
        depths = np.sort(rng.uniform(2.0, 3.5, (B, R, S, 1)).astype(np.float32), axis=2)
        rgb, seg, depth, weights = seg_mip_ray_marcher(
            jnp.asarray(colors), jnp.asarray(segs), jnp.asarray(densities), jnp.asarray(depths)
        )
        assert seg.shape == (B, R, K)
        segs_mid = (segs[:, :, :-1] + segs[:, :, 1:]) / 2
        expected = (np.asarray(weights) * segs_mid).sum(axis=-2)
        np.testing.assert_allclose(np.asarray(seg), expected, rtol=1e-4, atol=1e-5)


class TestPlaneProjection:
    def test_projection_shuffles_match_reference_matrices(self):
        """Verify the hardcoded shuffles equal bmm with the inverse of the
        reference axis matrices (ref renderer.py:23-53)."""
        planes = torch.tensor(
            [[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
             [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
             [[0, 0, 1], [1, 0, 0], [0, 1, 0]]],
            dtype=torch.float32,
        )
        rng = np.random.default_rng(2)
        coords = rng.normal(size=(2, 50, 3)).astype(np.float32)
        N, M, _ = coords.shape
        ct = torch.tensor(coords)[:, None].expand(-1, 3, -1, -1).reshape(N * 3, M, 3)
        inv = torch.linalg.inv(planes)[None].expand(N, -1, -1, -1).reshape(N * 3, 3, 3)
        expected = torch.bmm(ct, inv)[..., :2].reshape(N, 3, M, 2).numpy()
        out = np.asarray(project_onto_planes(jnp.asarray(coords)))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_sample_from_planes_matches_torch(self):
        rng = np.random.default_rng(3)
        planes = rng.normal(size=(2, 3, 8, 16, 16)).astype(np.float32)
        coords = rng.uniform(-0.4, 0.4, size=(2, 30, 3)).astype(np.float32)
        out = np.asarray(sample_from_planes(jnp.asarray(planes), jnp.asarray(coords), box_warp=1.0))

        pt = torch.tensor(planes).reshape(6, 8, 16, 16)
        proj = np.asarray(project_onto_planes(jnp.asarray(coords * 2.0))).reshape(6, 30, 2)
        grid = torch.tensor(proj)[:, None]
        ref = F.grid_sample(pt, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)
        ref = ref.squeeze(2).permute(0, 2, 1).reshape(2, 3, 30, 8).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestImportanceSampling:
    def test_stratified_deterministic_bounds(self):
        origins = jnp.zeros((1, 4, 3))
        d = sample_stratified(None, origins, 2.25, 3.3, 48)
        assert d.shape == (1, 4, 48, 1)
        arr = np.asarray(d)[0, 0, :, 0]
        assert arr[0] >= 2.25 and arr[-1] <= 3.3 + (3.3 - 2.25) / 47
        assert np.all(np.diff(arr) > 0)

    def test_stratified_jitter_within_bins(self):
        origins = jnp.zeros((1, 4, 3))
        d = np.asarray(sample_stratified(jax.random.key(0), origins, 2.0, 3.0, 10))
        base = np.linspace(2.0, 3.0, 10)
        delta = 1.0 / 9
        assert np.all(d[0, :, :, 0] >= base - 1e-6)
        assert np.all(d[0, :, :, 0] <= base + delta + 1e-6)

    def test_sample_pdf_deterministic_concentrates(self):
        """Importance samples should land in the high-weight bin."""
        bins = jnp.tile(jnp.linspace(0.0, 1.0, 11)[None], (1, 1))
        weights = jnp.zeros((1, 10)).at[0, 4].set(100.0)
        out = np.asarray(sample_pdf(None, bins, weights, 16))
        frac_inside = np.mean((out >= 0.35) & (out <= 0.55))
        assert frac_inside > 0.8

    def test_sample_pdf_matches_torch_searchsorted(self):
        rng = np.random.default_rng(4)
        N, S = 6, 20
        bins = np.sort(rng.uniform(2, 3, (N, S + 1)).astype(np.float32), axis=1)
        weights = rng.uniform(0, 1, (N, S)).astype(np.float32)
        n_imp = 12
        out = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), n_imp))

        wt = torch.tensor(weights) + 1e-5
        pdf = wt / wt.sum(-1, keepdim=True)
        cdf = torch.cumsum(pdf, -1)
        cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], -1)
        u = torch.linspace(0, 1, n_imp).expand(N, n_imp).contiguous()
        inds = torch.searchsorted(cdf, u, right=True)
        below = torch.clamp_min(inds - 1, 0)
        above = torch.clamp_max(inds, S)
        sel = torch.stack([below, above], -1).view(N, 2 * n_imp)
        cdf_g = torch.gather(cdf, 1, sel).view(N, n_imp, 2)
        bins_g = torch.gather(torch.tensor(bins), 1, sel).view(N, n_imp, 2)
        denom = cdf_g[..., 1] - cdf_g[..., 0]
        denom[denom < 1e-5] = 1
        expected = (bins_g[..., 0] + (u - cdf_g[..., 0]) / denom
                    * (bins_g[..., 1] - bins_g[..., 0])).numpy()
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_sample_importance_shape(self):
        rng_np = np.random.default_rng(5)
        z = np.sort(rng_np.uniform(2, 3, (1, 8, 48, 1)).astype(np.float32), axis=2)
        w = rng_np.uniform(0, 1, (1, 8, 47, 1)).astype(np.float32)
        out = sample_importance(jax.random.key(0), jnp.asarray(z), jnp.asarray(w), 48)
        assert out.shape == (1, 8, 48, 1)
        arr = np.asarray(out)
        assert np.all(arr >= 2.0 - 1e-4) and np.all(arr <= 3.0 + 1e-4)

    def test_unify_samples_sorted(self):
        rng_np = np.random.default_rng(6)
        d1 = np.sort(rng_np.uniform(2, 3, (1, 4, 5, 1)).astype(np.float32), axis=2)
        d2 = np.sort(rng_np.uniform(2, 3, (1, 4, 5, 1)).astype(np.float32), axis=2)
        c1 = rng_np.normal(size=(1, 4, 5, 3)).astype(np.float32)
        c2 = rng_np.normal(size=(1, 4, 5, 3)).astype(np.float32)
        depths, colors = unify_samples(jnp.asarray(d1), jnp.asarray(d2),
                                       (jnp.asarray(c1), jnp.asarray(c2)))
        darr = np.asarray(depths)
        assert darr.shape == (1, 4, 10, 1)
        assert np.all(np.diff(darr[..., 0], axis=-1) >= 0)
        # colors follow their depths
        all_d = np.concatenate([d1, d2], axis=2)
        all_c = np.concatenate([c1, c2], axis=2)
        order = np.argsort(all_d, axis=2)
        expected_c = np.take_along_axis(all_c, np.broadcast_to(order, all_c.shape), axis=2)
        np.testing.assert_allclose(np.asarray(colors), expected_c, atol=1e-6)


class TestRenderRays:
    def test_end_to_end_shapes_and_finiteness(self):
        """Two-pass disentangled render over random planes + decoder."""
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder, disentangled_osg_decoder)
        cfg = ffhq_rendering_config(depth_resolution=12, depth_resolution_importance=12)
        key = jax.random.key(0)
        params = init_disentangled_osg_decoder(key)
        planes = jax.random.normal(jax.random.key(1), (1, 3, 32, 32, 32)) * 0.1
        origins = jnp.zeros((1, 16, 3)).at[..., 2].set(-2.7)
        dirs = jnp.zeros((1, 16, 3)).at[..., 2].set(1.0)
        rgb, seg, depth, wsum = render_rays(
            lambda p, xn, xd: disentangled_osg_decoder(p, xn, xd),
            params, planes, planes, origins, dirs, cfg,
        )
        assert rgb.shape == (1, 16, 32)
        assert seg.shape == (1, 16, 15)
        assert depth.shape == (1, 16, 1)
        for t in (rgb, seg, depth, wsum):
            assert np.all(np.isfinite(np.asarray(t)))

    @pytest.mark.parametrize("train", [False, True])
    def test_kernel_path_integration(self, monkeypatch, train):
        """render_rays with the composite/importance Pallas kernels engaged
        (interpret mode, backend gate monkeypatched) must match the XLA
        path end-to-end — serving (rng=None) and training (rng) wiring."""
        import nerffaceediting_tpu.ops.composite_kernel as ck
        import nerffaceediting_tpu.render.renderer as rr
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder, disentangled_osg_decoder)

        cfg = ffhq_rendering_config(depth_resolution=12,
                                    depth_resolution_importance=12)
        params = init_disentangled_osg_decoder(jax.random.key(0))
        planes = jax.random.normal(jax.random.key(1), (1, 3, 32, 32, 32)) * 0.1
        origins = jnp.zeros((1, 16, 3)).at[..., 2].set(-2.7)
        dirs = jnp.zeros((1, 16, 3)).at[..., 2].set(1.0)
        rng = jax.random.key(7) if train else None
        dec = lambda p, xn, xd: disentangled_osg_decoder(p, xn, xd)

        base = render_rays(dec, params, planes, planes, origins, dirs, cfg,
                           rng=rng)

        monkeypatch.setattr(rr, "_kernel_backend_ok", lambda: True)
        monkeypatch.setenv("NFE_COMPOSITE_KERNEL", "1")
        if train:
            monkeypatch.setenv("NFE_COMPOSITE_KERNEL_TRAIN", "1")
        orig_pb = ck.pullback_weights
        monkeypatch.setattr(
            ck, "pullback_weights",
            lambda *a, **k: orig_pb(*a, **{**k, "interpret": True}))
        orig_imp = ck.importance_depths
        monkeypatch.setattr(
            ck, "importance_depths",
            lambda *a, **k: orig_imp(*a, **{**k, "interpret": True}))
        got = render_rays(dec, params, planes, planes, origins, dirs, cfg,
                          rng=rng)
        for a, b in zip(got, base):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_tiled_composite_matches_fused(self, monkeypatch):
        """NFE_TILED_COMPOSITE=1 (XLA contraction of the pull-back weights
        against the TILED fused-decode output, no payload untile) and =2
        (static-schedule Pallas composite kernel, the r5 default) must both
        match the untiled fused serving path (=0) up to reduce order."""
        import nerffaceediting_tpu.ops.triplane_kernel as tk
        import nerffaceediting_tpu.render.renderer as rr
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder, disentangled_osg_decoder)

        cfg = ffhq_rendering_config(depth_resolution=8,
                                    depth_resolution_importance=8)
        params = init_disentangled_osg_decoder(jax.random.key(0))
        planes = jax.random.normal(jax.random.key(1), (1, 3, 32, 64, 64)) * 0.1
        mean = jnp.mean(planes, axis=(-1, -2))
        var = jnp.ones_like(mean)
        rh = rw = 16
        ys, xs = np.meshgrid(np.linspace(-0.2, 0.2, rh),
                             np.linspace(-0.2, 0.2, rw), indexing="ij")
        origins = jnp.asarray(np.stack(
            [xs, ys, np.full_like(xs, -2.7)], -1
        ).reshape(1, rh * rw, 3).astype(np.float32))
        dirs = jnp.zeros((1, rh * rw, 3)).at[..., 2].set(1.0)
        dec = lambda p, xn, xd: disentangled_osg_decoder(p, xn, xd)

        orig = tk.triplane_sample_decode
        monkeypatch.setattr(
            tk, "triplane_sample_decode",
            lambda *a, **k: orig(*a, **{**k, "interpret": True,
                                        "compute_dtype": jnp.float32}))
        monkeypatch.setattr(rr, "_kernel_backend_ok", lambda: True)
        monkeypatch.setattr(rr.jax, "default_backend", lambda: "tpu")
        kw = dict(plane_stats=(mean, var), ray_grid=(rh, rw),
                  fused_decoder=True, coherent=True)
        monkeypatch.setenv("NFE_TILED_COMPOSITE", "0")
        fused = render_rays(dec, params, planes, None, origins, dirs, cfg,
                            **kw)
        monkeypatch.setenv("NFE_TILED_COMPOSITE", "1")
        tiled = render_rays(dec, params, planes, None, origins, dirs, cfg,
                            **kw)
        for a, b in zip(tiled, fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        # "2": the Pallas composite kernel (interpret on CPU), forced on
        # so the backend check inside composite_payload_tiled can't silently
        # fall back to the XLA contraction and mask a kernel bug.
        orig_cpt = tk.composite_payload_tiled
        monkeypatch.setattr(
            tk, "composite_payload_tiled",
            lambda *a, **k: orig_cpt(*a, **{**k, "use_kernel": True,
                                            "interpret": True}))
        monkeypatch.setenv("NFE_TILED_COMPOSITE", "2")
        kern = render_rays(dec, params, planes, None, origins, dirs, cfg,
                           **kw)
        for a, b in zip(kern, fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestCompositeTwoPass:
    """composite_two_pass (fused merge+march via weight pull-back) must be
    numerically equivalent to unify_samples → seg_mip_ray_marcher."""

    def _inputs(self, seed=0, B=2, R=17, S1=9, S2=7, C=5, K=4):
        key = jax.random.key(seed)
        ks = jax.random.split(key, 8)
        d1 = jnp.sort(jax.random.uniform(ks[0], (B, R, S1, 1)) + 2.0, axis=2)
        d2 = jnp.sort(jax.random.uniform(ks[1], (B, R, S2, 1)) + 2.0, axis=2)
        c1 = jax.random.normal(ks[2], (B, R, S1, C))
        c2 = jax.random.normal(ks[3], (B, R, S2, C))
        s1 = jax.random.normal(ks[4], (B, R, S1, 1))
        s2 = jax.random.normal(ks[5], (B, R, S2, 1))
        g1 = jax.random.normal(ks[6], (B, R, S1, K))
        g2 = jax.random.normal(ks[7], (B, R, S2, K))
        return d1, d2, (c1, c2), (s1, s2), (g1, g2)

    @pytest.mark.parametrize("white_back", [False, True])
    def test_matches_unify_plus_march(self, white_back):
        from nerffaceediting_tpu.render.renderer import (composite_two_pass,
                                                         unify_samples)
        from nerffaceediting_tpu.render.ray_marcher import seg_mip_ray_marcher

        d1, d2, colors, densities, segs = self._inputs()
        all_d, all_c, all_s, all_g = unify_samples(
            d1, d2, colors, densities, segs, assume_sorted=True)
        rgb0, seg0, dep0, w0 = seg_mip_ray_marcher(
            all_c, all_g, all_s, all_d, clamp_mode="softplus",
            white_back=white_back)
        rgb1, seg1, dep1, wt1 = composite_two_pass(
            d1, d2, colors, densities, segs, clamp_mode="softplus",
            white_back=white_back)
        np.testing.assert_allclose(rgb1, rgb0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(seg1, seg0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(dep1, dep0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(wt1, jnp.sum(w0, axis=2), rtol=1e-5,
                                   atol=1e-5)

    @pytest.mark.parametrize("tie", [False, True])
    def test_pullback_kernel_matches_xla_path(self, tie):
        """ops/composite_kernel.pullback_weights (interpret mode) must emit
        the same pull-back weights as composite_two_pass's XLA rank path —
        verified through the composite outputs, including exact cross-list
        depth ties and a non-128-multiple ray count."""
        from nerffaceediting_tpu.ops.composite_kernel import pullback_weights
        from nerffaceediting_tpu.render.renderer import composite_two_pass

        d1, d2, colors, densities, segs = self._inputs(seed=5, B=2, R=17)
        if tie:
            d2 = jnp.sort(d2.at[:, :, 0].set(d1[:, :, 4]), axis=2)
        rgb0, seg0, dep0, wt0 = composite_two_pass(
            d1, d2, colors, densities, segs, clamp_mode="softplus")

        u = pullback_weights(d1[..., 0], densities[0][..., 0],
                             d2[..., 0], densities[1][..., 0],
                             interpret=True)
        S1 = d1.shape[2]
        u1, u2 = u[..., :S1], u[..., S1:]
        rgb1 = (jnp.einsum("brs,brsc->brc", u1, colors[0])
                + jnp.einsum("brs,brsc->brc", u2, colors[1])) * 2 - 1
        seg1 = (jnp.einsum("brs,brsc->brc", u1, segs[0])
                + jnp.einsum("brs,brsc->brc", u2, segs[1]))
        wt1 = jnp.sum(u, axis=-1, keepdims=True)
        np.testing.assert_allclose(rgb1, rgb0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(seg1, seg0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(wt1, wt0, rtol=1e-5, atol=1e-5)

    def test_pullback_kernel_gradients_match_xla_path(self):
        """The custom-VJP backward kernel must reproduce the XLA path's
        density and payload gradients (depth grads are zero by contract —
        callers stop-gradient depths)."""
        from nerffaceediting_tpu.render.renderer import composite_two_pass

        d1, d2, colors, densities, segs = self._inputs(seed=9, B=1, R=13)

        def loss(dens, cols, use_kernel):
            rgb, seg, dep, wt = composite_two_pass(
                jax.lax.stop_gradient(d1), jax.lax.stop_gradient(d2),
                cols, dens, segs, clamp_mode="softplus",
                use_kernel=use_kernel)
            return (jnp.sum(rgb * jnp.cos(rgb)) + jnp.sum(seg)
                    + jnp.sum(dep) + jnp.sum(wt * wt))

        # interpret-mode Pallas on CPU: route through the kernel explicitly
        import nerffaceediting_tpu.ops.composite_kernel as ck

        orig = ck.pullback_weights
        try:
            ck.pullback_weights = lambda *a, **k: orig(*a, interpret=True, **k)
            gk = jax.grad(loss, argnums=(0, 1))(densities, colors, True)
        finally:
            ck.pullback_weights = orig
        g0 = jax.grad(loss, argnums=(0, 1))(densities, colors, False)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(g0)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_importance_kernel_matches_xla_path(self):
        """ops/composite_kernel.importance_depths (interpret mode) must equal
        march_weights → sample_importance at rng=None."""
        from nerffaceediting_tpu.ops.composite_kernel import importance_depths
        from nerffaceediting_tpu.render.ray_marcher import march_weights
        from nerffaceediting_tpu.render.renderer import sample_importance

        key = jax.random.key(11)
        B, R, S, n_imp = 2, 17, 12, 7
        d = jnp.sort(jax.random.uniform(jax.random.split(key)[0],
                                        (B, R, S, 1)) + 2.0, axis=2)
        s = jax.random.normal(jax.random.split(key)[1], (B, R, S, 1))
        w = march_weights(s, d)
        ref = sample_importance(None, d, w, n_imp)
        got = importance_depths(d[..., 0], s[..., 0], n_imp,
                                interpret=True)[..., None]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

        # rng path: pass the order-statistics draw in (sample_pdf rng path)
        rng = jax.random.key(3)
        ref_r = sample_importance(rng, d, w, n_imp)
        e = -jnp.log(1.0 - jax.random.uniform(rng, (B * R, n_imp + 1),
                                              jnp.float32))
        s_cum = jnp.cumsum(e, axis=-1)
        u = (s_cum[:, :-1] / s_cum[:, -1:]).reshape(B, R, n_imp)
        got_r = importance_depths(d[..., 0], s[..., 0], n_imp, u=u,
                                  interpret=True)[..., None]
        np.testing.assert_allclose(got_r, ref_r, rtol=1e-5, atol=1e-6)

    def test_no_seg_and_duplicate_depths(self):
        from nerffaceediting_tpu.render.renderer import (composite_two_pass,
                                                         unify_samples)
        from nerffaceediting_tpu.render.ray_marcher import mip_ray_marcher

        d1, d2, colors, densities, _ = self._inputs(seed=3)
        # exact tie across the lists (re-sorted to keep d2 monotone)
        d2 = jnp.sort(d2.at[:, :, 0].set(d1[:, :, 4]), axis=2)
        all_d, all_c, all_s = unify_samples(
            d1, d2, colors, densities, assume_sorted=True)
        rgb0, dep0, w0 = mip_ray_marcher(all_c, all_s, all_d,
                                         clamp_mode="softplus")
        rgb1, seg1, dep1, wt1 = composite_two_pass(
            d1, d2, colors, densities, None, clamp_mode="softplus")
        assert seg1 is None
        np.testing.assert_allclose(rgb1, rgb0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(dep1, dep0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(wt1, jnp.sum(w0, axis=2), rtol=1e-5,
                                   atol=1e-5)
