"""Geometry editing workflow: seg-driven plane optimization (BASELINE cfg 3)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_apps import tiny_config
from nerffaceediting_tpu.models import triplane
from nerffaceediting_tpu.editing.api import encode
from nerffaceediting_tpu.editing.geometry import (
    GeometryEditConfig,
    edit_geometry,
    labels_from_painted_mask,
)
from nerffaceediting_tpu.editing.masks import labels_to_colors
from nerffaceediting_tpu.render.cameras import camera_params, fov_to_intrinsics, lookat_pose

# optimization loop ~70 s (measured r3) — excluded from the default dev tier
# (pytest -m 'not slow' tests/); the full tier still runs everything.
pytestmark = pytest.mark.slow


class TestGeometryEdit:
    def test_seg_loss_decreases_and_planes_move(self):
        cfg = tiny_config()
        params = triplane.init_generator(jax.random.key(0), cfg)
        cam = camera_params(
            lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
            fov_to_intrinsics(18.837))
        z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
        ws = triplane.mapping(params, z, cam, cfg)
        planes = encode(params, ws, cfg)
        flat = planes.reshape(1, -1, *planes.shape[-2:])
        norm, mean, var = triplane.normalize_plane(flat)
        norm_planes = triplane.split_planes(norm, cfg)
        stats = (mean.reshape(1, 3, cfg.plane_channels),
                 (var + 1e-8).reshape(1, 3, cfg.plane_channels))

        res = cfg.neural_rendering_resolution
        # target: everything label 1 (skin) — a synthetic extreme edit
        target = jnp.ones((1, res, res), jnp.int32)
        out, hist = edit_geometry(
            params, ws, cam, norm_planes, stats, target, cfg,
            GeometryEditConfig(num_steps=8, learning_rate=5e-2))
        losses = [float(l) for l in hist["loss"]]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert np.abs(np.asarray(out) - np.asarray(norm_planes)).max() > 1e-4

    def test_painted_mask_roundtrip(self):
        rng = np.random.default_rng(0)
        labels = jnp.asarray(rng.integers(0, 15, (1, 1, 32, 32)), jnp.int32)
        painted = labels_to_colors(labels, argmax=False)
        back = labels_from_painted_mask(painted, resolution=16)
        assert back.shape == (1, 16, 16)
        # nearest-neighbour downsample keeps values in the label set
        assert set(np.unique(np.asarray(back))) <= set(range(15))


class TestCommittedDemoArtifact:
    """Gate the committed on-chip geometry-edit demonstration numbers
    (VERDICT r4 #6): the demo (scripts/demo_geometry_edit.py, 300 steps
    against the 5-kimg snapshot, runs/hw_r5/geom_edit_300b.log) must show
    the edited region actually reaching the painted label while the
    un-edited region's RGB stays put. If a rerun regresses either number,
    this fails instead of silently committing a worse artifact."""

    def test_artifact_metrics(self):
        import json
        import os

        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "debug", "geom_edit_metrics.json")
        with open(path) as f:
            m = json.load(f)
        assert m["edited_frac"] > 0.02, "degenerate edit (nothing painted)"
        assert m["seg_match_in_edit_after"] >= 0.7, m
        assert m["keep_region_psnr_db"] > 25.0, m
        assert m["loss_last"] < m["loss_first"], m
