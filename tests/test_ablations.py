"""Ablation-mode generator paths + w_avg training update."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_apps import tiny_config
from nerffaceediting_tpu.models import triplane


class TestAblations:
    @pytest.mark.slow  # heavy compile (r3 durations); full tier only
    def test_disable_disentangle_with_segmentation_decoder(self):
        """disable_alignment ablation (ref triplane.py:48-51):
        SegmentationOSGDecoder on raw planes, both decoder inputs equal."""
        import dataclasses

        cfg = dataclasses.replace(tiny_config(), disable_disentangle=True,
                                  disable_alignment=True)
        params = triplane.init_generator(jax.random.key(0), cfg)
        assert "seg_net" in params["decoder"]  # segmentation variant
        z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
        from nerffaceediting_tpu.render.cameras import (
            camera_params, fov_to_intrinsics, lookat_pose)

        cam = camera_params(
            lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
            fov_to_intrinsics(18.837))
        out = triplane.generate(params, z, cam, cfg)
        assert out["image"].shape[1] == 3
        assert out["image_seg"].shape[1] == 15
        assert out["plane_mean"] is None  # no disentanglement statistics

    @pytest.mark.slow  # heavy compile (r3 durations); full tier only
    def test_w_avg_updates_in_dmain(self):
        from nerffaceediting_tpu.config import DiscriminatorConfig
        from nerffaceediting_tpu.models.discriminator import init_dual_discriminator
        from nerffaceediting_tpu.train.loss import LossConfig
        from nerffaceediting_tpu.train.step import (
            OptimizerConfig, dmain_step, init_train_state)
        from tests.test_train import tiny_setup

        g_cfg, d_cfg = tiny_setup()
        state = init_train_state(
            triplane.init_generator(jax.random.key(0), g_cfg),
            init_dual_discriminator(jax.random.key(1), d_cfg),
            OptimizerConfig())
        w_avg_before = np.asarray(state.g_params["mapping"]["w_avg"]).copy()
        B = 4
        new_state, _ = dmain_step(
            state,
            jax.random.normal(jax.random.key(2), (B, 3, 128, 128)),
            jax.random.normal(jax.random.key(3), (B, 25)),
            jax.random.normal(jax.random.key(4), (B, g_cfg.z_dim)),
            jax.random.normal(jax.random.key(5), (B, 25)),
            jax.random.key(6),
            g_cfg=g_cfg, d_cfg=d_cfg, loss_cfg=LossConfig(gpc_reg_prob=0.5),
            opt_cfg=OptimizerConfig())
        w_avg_after = np.asarray(new_state.g_params["mapping"]["w_avg"])
        assert np.abs(w_avg_after - w_avg_before).max() > 1e-6
