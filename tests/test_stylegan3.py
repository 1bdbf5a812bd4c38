"""StyleGAN3 (alias-free) generator + filtered_lrelu tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nerffaceediting_tpu.ops.filtered_lrelu import filtered_lrelu
from nerffaceediting_tpu.ops import setup_filter
from nerffaceediting_tpu.models.stylegan3 import (
    design_lowpass_filter,
    init_sg3_generator,
    sg3_generate,
    sg3_schedule,
)


class TestFilteredLrelu:
    def test_matches_composed_torch(self):
        """filtered_lrelu ≡ upsample2d → bias+lrelu·gain → downsample2d with
        a torch oracle of the same composition."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
        b = rng.normal(size=(4,)).astype(np.float32)
        taps = np.asarray([1, 3, 3, 1], np.float64)
        f = (taps / taps.sum()).astype(np.float32)
        fu = setup_filter([1, 3, 3, 1], separable=True)
        out = np.asarray(filtered_lrelu(
            jnp.asarray(x), fu=fu, fd=fu, b=jnp.asarray(b), up=2, down=2,
            padding=3, gain=np.sqrt(2), slope=0.2))

        # oracle (ref filtered_lrelu.py:146-150): bias → up+pad+FIR(gain 4)
        # → lrelu·√2 → valid FIR + down
        from tests.test_ops import torch_upfirdn2d

        xt = x + b.reshape(1, -1, 1, 1)
        up = torch_upfirdn2d(xt, f, up=2, padding=3, gain=4.0)
        act = np.where(up >= 0, up, up * 0.2) * np.sqrt(2)
        down = torch_upfirdn2d(act, f, down=2, padding=0)
        np.testing.assert_allclose(out, down, rtol=1e-4, atol=1e-4)

    def test_identity_filters(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 6, 6)).astype(np.float32))
        out = filtered_lrelu(x, fu=None, fd=None, up=1, down=1, gain=1.0, slope=0.2)
        expected = np.where(np.asarray(x) >= 0, np.asarray(x), np.asarray(x) * 0.2)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


class TestSG3:
    def test_schedule_matches_reference_formula(self):
        s = sg3_schedule(64, num_layers=8, num_critical=2)
        assert len(s["cutoffs"]) == 9
        assert s["cutoffs"][0] == 2.0
        assert s["cutoffs"][-1] == 32.0  # img_resolution / 2
        assert s["sizes"][-1] == 64 and s["sizes"][-2] == 64
        assert s["channels"][-1] == 3

    def test_kaiser_filter_design(self):
        f = design_lowpass_filter(12, cutoff=4.0, width=2.0, fs=32.0)
        assert f.shape == (12,)
        np.testing.assert_allclose(f.sum(), 1.0, atol=1e-3)
        assert design_lowpass_filter(1, 1, 1, 4) is None
        fr = design_lowpass_filter(8, cutoff=4.0, width=2.0, fs=32.0, radial=True)
        assert fr.shape == (8, 8)

    def test_generator_end_to_end(self):
        params, static = init_sg3_generator(
            jax.random.key(0), z_dim=16, c_dim=0, w_dim=16, img_resolution=32,
            channel_base=1024, channel_max=32, num_layers=6, num_critical=2)
        z = jax.random.normal(jax.random.key(1), (2, 16))
        img = sg3_generate(params, static, z, None)
        assert img.shape == (2, 3, 32, 32)
        assert np.all(np.isfinite(np.asarray(img)))

    def test_translation_equivariance_smoke(self):
        """The alias-free design's signature property: transforming the input
        Fourier features translates the image. Smoke-level: output changes
        smoothly with the transform buffer."""
        params, static = init_sg3_generator(
            jax.random.key(0), z_dim=8, c_dim=0, w_dim=8, img_resolution=32,
            channel_base=512, channel_max=16, num_layers=4, num_critical=2)
        z = jax.random.normal(jax.random.key(1), (1, 8))
        img0 = np.asarray(sg3_generate(params, static, z, None))
        shifted = dict(params)
        t = jnp.eye(3).at[0, 2].set(0.5)
        shifted["synthesis"] = dict(params["synthesis"])
        shifted["synthesis"]["input"] = dict(params["synthesis"]["input"])
        shifted["synthesis"]["input"]["transform"] = t
        img1 = np.asarray(sg3_generate(shifted, static, z, None))
        assert np.abs(img1 - img0).max() > 1e-4  # transform has an effect
        assert np.all(np.isfinite(img1))
