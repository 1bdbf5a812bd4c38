"""Golden tests for the fused Pallas tri-plane sampling kernel (interpret
mode on CPU) against the XLA grid_sample reference path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerffaceediting_tpu.ops.triplane_kernel import (
    sample_from_planes_fused,
    triplane_sample,
)
from nerffaceediting_tpu.render.renderer import sample_from_planes


class TestTriplaneKernel:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_golden_inside(self, seed):
        rng = np.random.default_rng(seed)
        planes = jnp.asarray(rng.normal(size=(2, 3, 32, 64, 64)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-0.45, 0.45, size=(2, 777, 3)).astype(np.float32))
        ref = sample_from_planes(planes, coords, box_warp=1.0)
        out = sample_from_planes_fused(planes, coords, box_warp=1.0,
                                       interpret=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_matches_golden_out_of_bounds(self):
        """zeros padding: OOB taps contribute nothing — identical to
        grid_sample(padding_mode='zeros')."""
        rng = np.random.default_rng(2)
        planes = jnp.asarray(rng.normal(size=(1, 3, 32, 32, 32)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-1.5, 1.5, size=(1, 500, 3)).astype(np.float32))
        ref = sample_from_planes(planes, coords, box_warp=1.0)
        out = sample_from_planes_fused(planes, coords, box_warp=1.0,
                                       interpret=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_wsum_semantics(self):
        rng = np.random.default_rng(3)
        hwc = jnp.asarray(rng.normal(size=(3, 32, 32, 8)).astype(np.float32))
        inside = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 64, 3)).astype(np.float32))
        outside = jnp.asarray(rng.uniform(2.0, 3.0, (1, 64, 3)).astype(np.float32))
        _, ws_in = triplane_sample(hwc, inside, interpret=True, compute_dtype=jnp.float32)
        _, ws_out = triplane_sample(hwc, outside, interpret=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(ws_in), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ws_out), 0.0, atol=1e-6)

    def test_wsum_enables_denorm_remat(self):
        """denorm sampling ≡ σ·sample(norm) + μ·wsum — the VMEM-halving
        identity used by the renderer (SURVEY §7 hard parts)."""
        rng = np.random.default_rng(4)
        N, C, H = 1, 8, 32
        norm = rng.normal(size=(N, 3, C, H, H)).astype(np.float32)
        mean = rng.normal(size=(1, 3, C, 1, 1)).astype(np.float32)
        sigma = rng.uniform(0.5, 2.0, size=(1, 3, C, 1, 1)).astype(np.float32)
        denorm = norm * sigma + mean
        coords = jnp.asarray(rng.uniform(-0.8, 0.8, (N, 256, 3)).astype(np.float32))

        hwc_n = jnp.asarray(norm.reshape(3, C, H, H).transpose(0, 2, 3, 1))
        s_norm, wsum = triplane_sample(hwc_n, coords, interpret=True,
                                       compute_dtype=jnp.float32)
        remat = (s_norm.reshape(N, 3, 256, C)
                 * jnp.asarray(sigma[..., 0, 0])[:, :, None, :]
                 + jnp.asarray(mean[..., 0, 0])[:, :, None, :]
                 * wsum.reshape(N, 3, 256, 1))
        direct = sample_from_planes(jnp.asarray(denorm), coords, box_warp=1.0)
        np.testing.assert_allclose(np.asarray(remat), np.asarray(direct),
                                   rtol=1e-4, atol=1e-5)

    def test_nonmultiple_block_padding(self):
        rng = np.random.default_rng(5)
        planes = jnp.asarray(rng.normal(size=(1, 3, 16, 16, 16)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 130, 3)).astype(np.float32))
        ref = sample_from_planes(planes, coords, box_warp=1.0)
        out = sample_from_planes_fused(planes, coords, box_warp=1.0,
                                       interpret=True, compute_dtype=jnp.float32,
                                       block_p=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestKernelGradients:
    def test_plane_gradient_matches_golden(self):
        """d(loss)/d(planes) through the custom-VJP kernel must match the
        gather-based golden path (coordinate grads are zero by design, so
        compare plane grads only)."""
        rng = np.random.default_rng(7)
        planes = jnp.asarray(rng.normal(size=(1, 3, 8, 16, 16)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 200, 3)).astype(np.float32))
        g_out = jnp.asarray(rng.normal(size=(1, 3, 200, 8)).astype(np.float32))

        def loss_fused(p):
            out = sample_from_planes_fused(p, coords, box_warp=1.0,
                                           interpret=True,
                                           compute_dtype=jnp.float32)
            return jnp.sum(out * g_out)

        def loss_golden(p):
            return jnp.sum(sample_from_planes(p, coords, box_warp=1.0) * g_out)

        g_fused = jax.grad(loss_fused)(planes)
        g_gold = jax.grad(loss_golden)(planes)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_gold),
                                   rtol=1e-4, atol=1e-5)

    def test_wsum_gradient_path_is_finite(self):
        """The denorm-remat consumes wsum; grads through that path must be
        finite (wsum itself has zero plane grad)."""
        rng = np.random.default_rng(8)
        hwc = jnp.asarray(rng.normal(size=(3, 16, 16, 8)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 64, 3)).astype(np.float32))
        mu = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

        def loss(h):
            s, wsum = triplane_sample(h, coords, interpret=True,
                                      compute_dtype=jnp.float32)
            denorm = s * 2.0 + mu[None, None] * wsum[..., None]
            return jnp.sum(jnp.square(denorm))

        g = jax.grad(loss)(hwc)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0


class TestWindowedFastPath:
    """The windowed (binned) fast path: spatially-coherent point tiles
    contract a WIN×WIN plane window instead of the full plane."""

    @staticmethod
    def _ray_coords(rng, rh=16, rw=16, S=8, spread=0.04):
        """Synthetic ray-major coherent points: an rh×rw pixel grid marching
        along slightly-divergent rays (small per-patch plane footprint)."""
        px = np.linspace(-0.4, 0.4, rw)
        py = np.linspace(-0.4, 0.4, rh)
        yy, xx = np.meshgrid(py, px, indexing="ij")
        origins = np.stack([xx, yy, np.full_like(xx, -0.45)], -1).reshape(-1, 3)
        dirs = np.stack([xx * spread, yy * spread, np.ones_like(xx)], -1).reshape(-1, 3)
        t = np.linspace(0.0, 0.9, S)
        pts = origins[:, None, :] + t[None, :, None] * dirs[:, None, :]
        pts = pts + rng.normal(scale=1e-3, size=pts.shape)
        return jnp.asarray(pts.reshape(1, rh * rw * S, 3).astype(np.float32))

    def test_fast_path_taken_and_matches_golden(self):
        from nerffaceediting_tpu.ops.triplane_kernel import fast_path_pred

        rng = np.random.default_rng(11)
        coords = self._ray_coords(rng)
        planes = jnp.asarray(rng.normal(size=(1, 3, 32, 64, 64)).astype(np.float32))
        assert bool(fast_path_pred(
            planes.reshape(3, 32, 64, 64).transpose(0, 2, 3, 1), coords,
            ray_shape=(16, 16, 8)))
        ref = sample_from_planes(planes, coords, box_warp=1.0)
        out = sample_from_planes_fused(planes, coords, box_warp=1.0,
                                       ray_shape=(16, 16, 8),
                                       interpret=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_fast_path_partially_out_of_bounds(self):
        """Coherent rays marching off the plane edge: zeros padding must be
        preserved on the windowed path."""
        rng = np.random.default_rng(12)
        coords = self._ray_coords(rng) + jnp.asarray([0.45, 0.0, 0.0])
        planes = jnp.asarray(rng.normal(size=(1, 3, 16, 64, 64)).astype(np.float32))
        ref = sample_from_planes(planes, coords, box_warp=1.0)
        out = sample_from_planes_fused(planes, coords, box_warp=1.0,
                                       ray_shape=(16, 16, 8),
                                       interpret=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_incoherent_points_fall_back(self):
        from nerffaceediting_tpu.ops.triplane_kernel import fast_path_pred

        rng = np.random.default_rng(13)
        planes = jnp.asarray(rng.normal(size=(1, 3, 16, 64, 64)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 2048, 3)).astype(np.float32))
        hwc = planes.reshape(3, 16, 64, 64).transpose(0, 2, 3, 1)
        assert not bool(fast_path_pred(hwc, coords))
        # and the dispatch still returns golden results via the slow branch
        ref = sample_from_planes(planes, coords, box_warp=1.0)
        out = sample_from_planes_fused(planes, coords, box_warp=1.0,
                                       interpret=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_pinned_coherent_violation_fails_loudly(self):
        """coherent=True on a predicate-violating point set must NaN-poison
        the output (ADVICE r2) — never silently decode zero samples."""
        from nerffaceediting_tpu.ops.triplane_kernel import fast_path_pred

        rng = np.random.default_rng(15)
        planes = jnp.asarray(rng.normal(size=(1, 3, 16, 64, 64)).astype(np.float32))
        # incoherent points + a ray_shape claim: tiles span the whole plane
        coords = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 2048, 3)).astype(np.float32))
        hwc = planes.reshape(3, 16, 64, 64).transpose(0, 2, 3, 1)
        assert not bool(fast_path_pred(hwc, coords, ray_shape=(16, 16, 8)))
        out = sample_from_planes_fused(planes, coords, box_warp=1.0,
                                       ray_shape=(16, 16, 8), coherent=True,
                                       interpret=True, compute_dtype=jnp.float32)
        assert np.isnan(np.asarray(out)).all()
        # and a coherent set under the same pin stays finite + golden
        good = self._ray_coords(np.random.default_rng(16))
        ref = sample_from_planes(planes, good, box_warp=1.0)
        out2 = sample_from_planes_fused(planes, good, box_warp=1.0,
                                        ray_shape=(16, 16, 8), coherent=True,
                                        interpret=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grid_order_coords_fall_back_correctly(self):
        """G.sample()-style full-line shape grids span the whole plane per
        256-point run — the dispatch must fall back and stay golden."""
        from nerffaceediting_tpu.ops.triplane_kernel import fast_path_pred

        rng = np.random.default_rng(14)
        planes = jnp.asarray(rng.normal(size=(1, 3, 8, 128, 128)).astype(np.float32))
        n = 32
        g = np.linspace(-0.5, 0.5, n).astype(np.float32)
        zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
        coords = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(1, -1, 3))
        hwc = planes.reshape(3, 8, 128, 128).transpose(0, 2, 3, 1)
        assert not bool(fast_path_pred(hwc, coords))
        ref = sample_from_planes(planes, coords, box_warp=1.0)
        out = sample_from_planes_fused(planes, coords, box_warp=1.0,
                                       interpret=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestFusedDecode:
    def test_fused_equals_decomposed(self):
        """triplane_sample_decode (sampling + plane mean + decoder MLPs in
        one kernel) == decomposed path, interpret mode."""
        from nerffaceediting_tpu.models.decoders import (
            disentangled_osg_decoder, init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample, triplane_sample_decode)

        rng = np.random.default_rng(0)
        H = W = 64
        C = 32
        rh, rw, S = 8, 8, 4
        M = rh * rw * S
        planes = jnp.asarray(rng.normal(size=(3, H, W, C)).astype(np.float32))
        base = np.stack(np.meshgrid(
            np.linspace(-0.4, 0.4, rh), np.linspace(-0.4, 0.4, rw),
            np.linspace(-0.2, 0.2, S), indexing="ij"), -1)
        coords = jnp.asarray(
            (base.reshape(1, M, 3)
             + rng.normal(size=(1, M, 3)) * 0.003).astype(np.float32))
        dec = init_disentangled_osg_decoder(jax.random.key(1))
        mean = jnp.asarray(rng.normal(size=(1, 3, C)).astype(np.float32))
        var = jnp.asarray(np.abs(rng.normal(size=(1, 3, C))).astype(np.float32))

        samples, wsum = triplane_sample(
            planes, coords, ray_shape=(rh, rw, S), tile_p=64,
            compute_dtype=jnp.float32, interpret=True, coherent=True)
        sn = samples.reshape(1, 3, M, C)
        sd = (sn * var[:, :, None, :]
              + mean[:, :, None, :] * wsum.reshape(1, 3, M, 1))
        want = disentangled_osg_decoder(dec, sn, sd)
        got = triplane_sample_decode(
            planes, coords, dec, (mean, var), ray_shape=(rh, rw, S),
            tile_p=64, compute_dtype=jnp.float32, interpret=True)
        for k in ("sigma", "seg", "rgb"):
            np.testing.assert_allclose(np.asarray(want[k]), np.asarray(got[k]),
                                       atol=1e-4, rtol=1e-4)

    def test_fused_with_prebuilt_canvas(self):
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops.triplane_kernel import (
            build_plane_canvas, triplane_sample_decode)

        rng = np.random.default_rng(1)
        planes = jnp.asarray(rng.normal(size=(3, 64, 64, 32)).astype(np.float32))
        base = np.stack(np.meshgrid(
            np.linspace(-0.3, 0.3, 8), np.linspace(-0.3, 0.3, 8),
            np.linspace(-0.1, 0.1, 4), indexing="ij"), -1)
        coords = jnp.asarray(base.reshape(1, 256, 3).astype(np.float32))
        dec = init_disentangled_osg_decoder(jax.random.key(2))
        mean = jnp.zeros((1, 3, 32))
        var = jnp.ones((1, 3, 32))
        canvas = build_plane_canvas(planes, jnp.float32)
        a = triplane_sample_decode(planes, coords, dec, (mean, var),
                                   ray_shape=(8, 8, 4), tile_p=64,
                                   compute_dtype=jnp.float32, interpret=True)
        b = triplane_sample_decode(planes, coords, dec, (mean, var),
                                   ray_shape=(8, 8, 4), tile_p=64,
                                   compute_dtype=jnp.float32, interpret=True,
                                   canvas=canvas)
        for k in ("sigma", "seg", "rgb"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-5)


class TestCoordsTransposed:
    def test_decode_matches_points_major(self):
        """triplane_sample_decode(coords_transposed=True) on the (1, 3, M)
        layout must equal the (1, M, 3) path exactly."""
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample_decode)

        rng = np.random.default_rng(3)
        planes = jnp.asarray(rng.normal(size=(3, 64, 64, 32)).astype(np.float32))
        base = np.stack(np.meshgrid(
            np.linspace(-0.3, 0.3, 8), np.linspace(-0.3, 0.3, 8),
            np.linspace(-0.1, 0.1, 4), indexing="ij"), -1)
        coords = jnp.asarray(base.reshape(1, 256, 3).astype(np.float32))
        dec = init_disentangled_osg_decoder(jax.random.key(4))
        mean = jnp.asarray(rng.normal(size=(1, 3, 32)).astype(np.float32))
        var = jnp.asarray(np.abs(rng.normal(size=(1, 3, 32))).astype(np.float32))
        kw = dict(ray_shape=(8, 8, 4), tile_p=64,
                  compute_dtype=jnp.float32, interpret=True)
        a = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        b = triplane_sample_decode(planes, coords.transpose(0, 2, 1), dec,
                                   (mean, var), coords_transposed=True, **kw)
        for k in ("sigma", "seg", "rgb"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestParkedGate:
    """Parked variants must refuse loudly on a fingerprinted-bad libtpu
    build instead of hanging the compiler (VERDICT r4 weak #6)."""

    def _fake_backend(self, monkeypatch, version):
        from jax._src import xla_bridge

        class B:
            platform = "tpu"
            platform_version = version

        monkeypatch.setattr(xla_bridge, "get_backend", lambda *a, **k: B())

    def test_refuses_on_bad_build(self, monkeypatch):
        import pytest
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        self._fake_backend(monkeypatch, "libtpu x; cl/831091709 y")
        monkeypatch.delenv("NFE_PARKED_OK", raising=False)
        with pytest.raises(RuntimeError, match="parked"):
            tk._parked_gate("NFE_SORTED_KERNEL")
        # interpret mode and the explicit override always pass
        tk._parked_gate("NFE_SORTED_KERNEL", interpret=True)
        monkeypatch.setenv("NFE_PARKED_OK", "1")
        tk._parked_gate("NFE_SORTED_KERNEL")

    def test_passes_on_other_build(self, monkeypatch):
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        self._fake_backend(monkeypatch, "libtpu x; cl/999999999 y")
        monkeypatch.delenv("NFE_PARKED_OK", raising=False)
        tk._parked_gate("NFE_SORTED_KERNEL")
        tk._parked_gate("NFE_RESIDENT_CANVAS")
        tk._parked_gate("NFE_TILED_COMPOSITE=1")


class TestCompositeStaticKernel:
    """The static-schedule Pallas composite (NFE_TILED_COMPOSITE=2) must
    match the XLA reshape/reduce contraction exactly: same u pull-back,
    same depth-minor lane grouping, same patch-major output order."""

    def test_kernel_matches_xla(self):
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        if tk._TILE_ORDER != "patch" or tk._PATCH != (8, 8, 4):
            import pytest
            pytest.skip("non-default tile layout env override")

        rng = np.random.default_rng(7)
        rh, rw, S = 16, 16, 8            # npatch=4, nk=2, nt=8 tiles
        M = rh * rw * S
        OUT = 48
        tiled = jnp.asarray(rng.normal(size=(1, OUT, M)).astype(np.float32))
        u = jnp.asarray(
            np.abs(rng.normal(size=(1, rh * rw, S))).astype(np.float32))
        a = tk.composite_payload_tiled(tiled, u, (rh, rw, S),
                                       use_kernel=False)
        b = tk.composite_payload_tiled(tiled, u, (rh, rw, S),
                                       use_kernel=True, interpret=True)
        assert a.shape == b.shape == (1, rh * rw, OUT)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    def test_kernel_multi_frame_rows(self):
        """decode_frames stacks F frames as extra ray-grid rows — the
        kernel path must match there too (more patches, same tiles)."""
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        if tk._TILE_ORDER != "patch" or tk._PATCH != (8, 8, 4):
            import pytest
            pytest.skip("non-default tile layout env override")

        rng = np.random.default_rng(8)
        rh, rw, S = 2 * 16, 16, 4        # 2 stacked 16x16 frames
        M = rh * rw * S
        OUT = 5
        tiled = jnp.asarray(rng.normal(size=(1, OUT, M)).astype(np.float32))
        u = jnp.asarray(rng.normal(size=(1, rh * rw, S)).astype(np.float32))
        a = tk.composite_payload_tiled(tiled, u, (rh, rw, S),
                                       use_kernel=False)
        b = tk.composite_payload_tiled(tiled, u, (rh, rw, S),
                                       use_kernel=True, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


class TestSortedKernel:
    """The sorted-grid serving variant (NFE_SORTED_KERNEL — per-plane
    sampling in canvas-block order + separate decode-epilogue kernel) must
    be numerically identical to the streaming fused path."""

    @staticmethod
    def _case(rng, rh=16, rw=16, S=4):
        # rays spread wide enough to span MANY canvas blocks so the argsort
        # permutation is non-trivial
        M = rh * rw * S
        base = np.stack(np.meshgrid(
            np.linspace(-0.85, 0.85, rh), np.linspace(-0.85, 0.85, rw),
            np.linspace(-0.2, 0.2, S), indexing="ij"), -1)
        coords = jnp.asarray(
            (base.reshape(1, M, 3)
             + rng.normal(size=(1, M, 3)) * 0.002).astype(np.float32))
        planes = jnp.asarray(rng.normal(size=(3, 64, 64, 32)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(1, 3, 32)).astype(np.float32))
        var = jnp.asarray(np.abs(rng.normal(size=(1, 3, 32))).astype(np.float32))
        return planes, coords, mean, var, (rh, rw, S)

    def test_sorted_matches_fused(self, monkeypatch):
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample_decode)

        rng = np.random.default_rng(41)
        planes, coords, mean, var, rs = self._case(rng)
        dec = init_disentangled_osg_decoder(jax.random.key(5))
        kw = dict(ray_shape=rs, tile_p=64,
                  compute_dtype=jnp.float32, interpret=True)
        a = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        monkeypatch.setattr(tk, "_SORTED_FORCE", True)
        jax.clear_caches()
        b = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        jax.clear_caches()
        for k in ("sigma", "seg", "rgb"):
            assert np.all(np.isfinite(np.asarray(b[k]))), k
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-5, atol=1e-5)

    def test_inkernel_pts_matches_fused(self, monkeypatch):
        """NFE_INKERNEL_PTS rebuilds the projection/floor/frac/mass rows
        inside the kernel body from the raw xyz tile; its decode must be
        bit-identical to the streaming fused path (same f32 ops, same
        order), including the per-tile window choice derived from the tile
        min instead of the per-point floors."""
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample_decode)

        rng = np.random.default_rng(47)
        planes, coords, mean, var, rs = self._case(rng)
        dec = init_disentangled_osg_decoder(jax.random.key(5))
        kw = dict(ray_shape=rs, tile_p=64,
                  compute_dtype=jnp.float32, interpret=True)
        a = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        a_tiled = triplane_sample_decode(planes, coords, dec, (mean, var),
                                         return_tiled=True, **kw)
        monkeypatch.setattr(tk, "_INKERNEL_FORCE", True)
        jax.clear_caches()
        b = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        b_tiled = triplane_sample_decode(planes, coords, dec, (mean, var),
                                         return_tiled=True, **kw)
        jax.clear_caches()
        for k in ("sigma", "seg", "rgb"):
            assert np.all(np.isfinite(np.asarray(b[k]))), k
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        np.testing.assert_array_equal(np.asarray(a_tiled["tiled"]),
                                      np.asarray(b_tiled["tiled"]))

    def test_inkernel_ilp_matches(self, monkeypatch):
        """NFE_KERNEL_ILP reorders the ik body (all point math + one-hots,
        then the 3 window dots, then the rx epilogues) — the values must be
        bit-identical to the per-plane chain: same ops, same reduce order,
        only the issue order changes."""
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample_decode)

        rng = np.random.default_rng(48)
        planes, coords, mean, var, rs = self._case(rng)
        dec = init_disentangled_osg_decoder(jax.random.key(5))
        kw = dict(ray_shape=rs, tile_p=64,
                  compute_dtype=jnp.float32, interpret=True)
        monkeypatch.setattr(tk, "_INKERNEL_FORCE", True)
        jax.clear_caches()
        a = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        monkeypatch.setenv("NFE_KERNEL_ILP", "1")
        jax.clear_caches()
        b = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        jax.clear_caches()
        for k in ("sigma", "seg", "rgb"):
            assert np.all(np.isfinite(np.asarray(b[k]))), k
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_inkernel_pts_chunked_and_oob(self, monkeypatch):
        """The ik variant under point-axis chunking (NFE_MAX_MT) and with
        out-of-plane coords (zeros-padding semantics) matches the default."""
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample_decode)

        rng = np.random.default_rng(48)
        planes, coords, mean, var, rs = self._case(rng)
        # push a patch of rays outside the plane: OOB taps must still
        # contribute exactly zero mass in both derivations
        coords = coords.at[0, :256].set(coords[0, :256] * 1.6)
        dec = init_disentangled_osg_decoder(jax.random.key(5))
        kw = dict(ray_shape=rs, tile_p=64,
                  compute_dtype=jnp.float32, interpret=True)
        a = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        monkeypatch.setattr(tk, "_INKERNEL_FORCE", True)
        monkeypatch.setenv("NFE_MAX_MT", "256")
        jax.clear_caches()
        b = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        jax.clear_caches()
        for k in ("sigma", "seg", "rgb"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_patch_outer_tile_order_exact(self, monkeypatch):
        """NFE_TILE_ORDER=patch (pixel-patch-outermost sweep) is a pure
        iteration-order change: windowed sampling AND the fused decode must
        stay bit-identical to the depth-outer default."""
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample_decode)

        rng = np.random.default_rng(47)
        planes, coords, mean, var, rs = self._case(rng)
        dec = init_disentangled_osg_decoder(jax.random.key(9))
        kw = dict(ray_shape=rs, tile_p=64,
                  compute_dtype=jnp.float32, interpret=True)
        a = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        a2 = sample_from_planes_fused(planes[None].transpose(0, 1, 4, 2, 3),
                                      coords, box_warp=1.0, ray_shape=rs,
                                      interpret=True,
                                      compute_dtype=jnp.float32)
        monkeypatch.setattr(tk, "_TILE_ORDER", "patch")
        jax.clear_caches()
        b = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        b2 = sample_from_planes_fused(planes[None].transpose(0, 1, 4, 2, 3),
                                      coords, box_warp=1.0, ray_shape=rs,
                                      interpret=True,
                                      compute_dtype=jnp.float32)
        jax.clear_caches()
        for k in ("sigma", "seg", "rgb"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                                   rtol=1e-6, atol=1e-6)

    def test_sorted_chunked_point_axis(self, monkeypatch):
        """Point-axis chunking (the 2^18 Mosaic cap) must compose with the
        sort: the argsort runs per chunk. Exercised with a tiny synthetic
        cap via tile_p so the test stays fast."""
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample_decode)

        rng = np.random.default_rng(43)
        planes, coords, mean, var, rs = self._case(rng, rh=32, rw=16, S=4)
        dec = init_disentangled_osg_decoder(jax.random.key(7))
        kw = dict(ray_shape=rs, tile_p=256,
                  compute_dtype=jnp.float32, interpret=True)
        a = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        monkeypatch.setattr(tk, "_SORTED_FORCE", True)
        jax.clear_caches()
        b = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        jax.clear_caches()
        for k in ("sigma", "seg", "rgb"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-5, atol=1e-5)


class TestResidentCanvas:
    """The resident-canvas windowed variant (NFE_RESIDENT_CANVAS — whole
    per-plane canvas in VMEM, dynamic in-kernel window select) must be
    numerically identical to the streaming windowed path."""

    def test_resident_matches_streaming(self, monkeypatch):
        from nerffaceediting_tpu.ops import triplane_kernel as tk

        rng = np.random.default_rng(23)
        coords = TestWindowedFastPath._ray_coords(rng)
        planes = jnp.asarray(rng.normal(size=(1, 3, 32, 64, 64)).astype(np.float32))
        kw = dict(box_warp=1.0, ray_shape=(16, 16, 8), interpret=True,
                  compute_dtype=jnp.float32)
        base = sample_from_planes_fused(planes, coords, **kw)
        monkeypatch.setattr(tk, "_RESIDENT_FORCE", True)
        jax.clear_caches()  # the flag is read at trace time
        res = sample_from_planes_fused(planes, coords, **kw)
        jax.clear_caches()
        np.testing.assert_allclose(np.asarray(res), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)

    def test_nondefault_window_geometry(self, monkeypatch):
        """NFE_WIN_GEOM alternates (here 32,8,64,32) must stay exact — the
        windowed path is an optimization whose geometry never changes
        results (fallback predicate handles violations)."""
        from nerffaceediting_tpu.ops import triplane_kernel as tk

        rng = np.random.default_rng(29)
        coords = TestWindowedFastPath._ray_coords(rng)
        planes = jnp.asarray(rng.normal(size=(1, 3, 32, 64, 64)).astype(np.float32))
        kw = dict(box_warp=1.0, ray_shape=(16, 16, 8), interpret=True,
                  compute_dtype=jnp.float32)
        base = sample_from_planes_fused(planes, coords, **kw)
        monkeypatch.setattr(tk, "_WX", 32)
        monkeypatch.setattr(tk, "_SX", 8)
        monkeypatch.setattr(tk, "_WY", 64)
        monkeypatch.setattr(tk, "_SY", 32)
        jax.clear_caches()
        alt = sample_from_planes_fused(planes, coords, **kw)
        jax.clear_caches()
        np.testing.assert_allclose(np.asarray(alt), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)

    def test_resident_fused_decode_matches_streaming(self, monkeypatch):
        """The resident-canvas variant of the FUSED sampling+decode kernel
        (3-plane canvas VMEM-resident, dynamic window select) must equal the
        streaming fused path."""
        from nerffaceediting_tpu.models.decoders import (
            init_disentangled_osg_decoder)
        from nerffaceediting_tpu.ops import triplane_kernel as tk
        from nerffaceediting_tpu.ops.triplane_kernel import (
            triplane_sample_decode)

        rng = np.random.default_rng(31)
        planes = jnp.asarray(rng.normal(size=(3, 64, 64, 32)).astype(np.float32))
        base = np.stack(np.meshgrid(
            np.linspace(-0.3, 0.3, 8), np.linspace(-0.3, 0.3, 8),
            np.linspace(-0.1, 0.1, 4), indexing="ij"), -1)
        coords = jnp.asarray(base.reshape(1, 256, 3).astype(np.float32))
        dec = init_disentangled_osg_decoder(jax.random.key(3))
        mean = jnp.asarray(rng.normal(size=(1, 3, 32)).astype(np.float32))
        var = jnp.asarray(np.abs(rng.normal(size=(1, 3, 32))).astype(np.float32))
        kw = dict(ray_shape=(8, 8, 4), tile_p=64,
                  compute_dtype=jnp.float32, interpret=True)
        a = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        monkeypatch.setattr(tk, "_RESIDENT_FORCE", True)
        jax.clear_caches()
        b = triplane_sample_decode(planes, coords, dec, (mean, var), **kw)
        jax.clear_caches()
        for k in ("sigma", "seg", "rgb"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-6, atol=1e-6)
