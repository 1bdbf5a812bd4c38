"""training_loop orchestration test: 3 real steps end-to-end on the CPU mesh
(dataset → sharded steps → stats → snapshot machinery)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerffaceediting_tpu.config import DiscriminatorConfig
from nerffaceediting_tpu.train.loop import TrainingConfig, training_loop
from nerffaceediting_tpu.train.loss import LossConfig
from nerffaceediting_tpu.train.step import OptimizerConfig
from tests.test_train import tiny_setup


def synthetic_iter(batch_size, z_dim):
    rng = np.random.default_rng(0)
    while True:
        yield {
            "image": rng.uniform(-1, 1, (batch_size, 3, 128, 128)).astype(np.float32),
            "label": (rng.normal(size=(batch_size, 25)) * 0.1).astype(np.float32),
        }


class TestTrainingLoop:
    def test_three_steps_and_snapshot(self, tmp_path):
        g_cfg, d_cfg = tiny_setup()
        tcfg = TrainingConfig(
            run_dir=str(tmp_path), total_kimg=1, kimg_per_tick=1,
            snapshot_ticks=0, batch_size=8, seed=0)
        state = training_loop(
            g_cfg, d_cfg, LossConfig(gpc_reg_prob=0.5), OptimizerConfig(),
            tcfg, synthetic_iter(8, g_cfg.z_dim), max_steps=3)
        assert int(state.cur_nimg) == 24
        # stats got logged
        assert os.path.exists(os.path.join(tmp_path, "stats.jsonl"))

    def test_resume_from_snapshot(self, tmp_path):
        from nerffaceediting_tpu.train.loop import restore_snapshot, save_snapshot

        g_cfg, d_cfg = tiny_setup()
        opt_cfg = OptimizerConfig()
        tcfg = TrainingConfig(run_dir=str(tmp_path / "a"), total_kimg=1,
                              kimg_per_tick=1, snapshot_ticks=0, batch_size=8)
        state = training_loop(
            g_cfg, d_cfg, LossConfig(gpc_reg_prob=0.5), opt_cfg,
            tcfg, synthetic_iter(8, g_cfg.z_dim), max_steps=2)
        save_snapshot(str(tmp_path / "a"), state, int(state.cur_nimg))

        resume_state = restore_snapshot(
            os.path.join(tmp_path / "a", "network-snapshot-000000"),
            g_cfg, d_cfg, opt_cfg)
        assert int(resume_state.cur_nimg) == 16
        # one more step from the restored state
        tcfg2 = TrainingConfig(run_dir=str(tmp_path / "b"), total_kimg=1,
                               kimg_per_tick=1, snapshot_ticks=0, batch_size=8)
        state2 = training_loop(
            g_cfg, d_cfg, LossConfig(gpc_reg_prob=0.5), OptimizerConfig(),
            tcfg2, synthetic_iter(8, g_cfg.z_dim),
            resume_state=resume_state, max_steps=1)
        assert int(state2.cur_nimg) == 24
