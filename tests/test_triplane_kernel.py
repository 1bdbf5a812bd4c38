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
