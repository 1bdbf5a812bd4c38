"""SPMD serving parity: sharded orbit/frame rendering must match the
single-device renderer on the 8-device CPU mesh (parallel/serving.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerffaceediting_tpu.editing.api import (
    decode_frames, encode, swap_appearance_stats)
from nerffaceediting_tpu.models import triplane
from nerffaceediting_tpu.parallel.mesh import make_mesh
from nerffaceediting_tpu.parallel.serving import frame_sharded, orbit_sharded
from nerffaceediting_tpu.render.cameras import (
    camera_params, fov_to_intrinsics, lookat_pose)

from tests.test_apps import tiny_config


def _setup():
    cfg = tiny_config()
    params = triplane.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    c = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837))
    ws = triplane.mapping(params, z, c, cfg)
    planes = encode(params, ws, cfg)
    planes_sty = encode(
        params,
        triplane.mapping(
            params, jax.random.normal(jax.random.key(2), (1, cfg.z_dim)), c, cfg),
        cfg)
    norm, stats = swap_appearance_stats(planes, planes_sty)
    return cfg, params, ws, norm, stats


def _orbit_cams(n):
    return jnp.concatenate([
        camera_params(
            lookat_pose(np.pi / 2 + 0.3 * np.sin(2 * np.pi * i / n),
                        np.pi / 2 - 0.2 * np.cos(2 * np.pi * i / n),
                        (0, 0, 0.2), radius=2.7),
            fov_to_intrinsics(18.837))
        for i in range(n)
    ])


class TestOrbitSharded:
    def test_matches_single_device(self):
        cfg, params, ws, norm, stats = _setup()
        mesh = make_mesh(n_data=8)
        cams = _orbit_cams(8)

        ref = decode_frames(params, ws, cams, norm, None, cfg,
                            plane_stats=stats)
        out = orbit_sharded(params, ws, cams, norm, None, cfg, mesh,
                            plane_stats=stats)
        assert out["image"].shape == ref["image"].shape
        for k in ("image", "image_raw", "image_seg", "image_depth"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), atol=2e-4,
                err_msg=k)

    def test_rejects_indivisible_orbit(self):
        cfg, params, ws, norm, stats = _setup()
        mesh = make_mesh(n_data=8)
        cams = _orbit_cams(6)
        try:
            orbit_sharded(params, ws, cams, norm, None, cfg, mesh,
                          plane_stats=stats)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "divide" in str(e)


class TestFrameSharded:
    def test_matches_single_device(self):
        cfg, params, ws, norm, stats = _setup()
        mesh = make_mesh(n_data=8)
        cam = _orbit_cams(1)

        ref = decode_frames(params, ws, cam, norm, None, cfg,
                            plane_stats=stats)
        out = frame_sharded(params, ws, cam, norm, None, cfg, mesh,
                            plane_stats=stats)
        for k in ("image", "image_raw", "image_seg", "image_depth"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), atol=2e-4,
                err_msg=k)

    @pytest.mark.slow  # ~95 s duplicate compile of the frame-sharded
    # program under jit; the eager variant above keeps in-tier coverage
    def test_jitted_with_band_shardings(self):
        """Under jit the feature image really is band-sharded over 'data'."""
        cfg, params, ws, norm, stats = _setup()
        mesh = make_mesh(n_data=8)
        cam = _orbit_cams(1)

        @jax.jit
        def f(params, ws, cam, norm, stats):
            return frame_sharded(params, ws, cam, norm, None, cfg, mesh,
                                 plane_stats=stats)

        out = f(params, ws, cam, norm, stats)
        ref = decode_frames(params, ws, cam, norm, None, cfg,
                            plane_stats=stats)
        np.testing.assert_allclose(np.asarray(out["image"]),
                                   np.asarray(ref["image"]), atol=2e-4)
        shard_axes = out["image_raw"].sharding.spec
        assert "data" in str(shard_axes)


class TestOrbitScanGroup:
    @pytest.mark.slow  # ~95 s: 16-frame compile — the heaviest serving
    # test; orbit sharding itself stays covered in-tier by TestOrbitSharded
    def test_scan_group_matches_unrolled(self):
        """16 frames / 8 devices / scan_group=1: the per-device lax.scan
        path (TPU compiler-limit workaround) must match plain decode."""
        cfg, params, ws, norm, stats = _setup()
        mesh = make_mesh(n_data=8)
        cams = _orbit_cams(16)

        ref = decode_frames(params, ws, cams, norm, None, cfg,
                            plane_stats=stats)
        out = orbit_sharded(params, ws, cams, norm, None, cfg, mesh,
                            plane_stats=stats, scan_group=1)
        np.testing.assert_allclose(np.asarray(out["image"]),
                                   np.asarray(ref["image"]), atol=2e-4)

    def test_rejects_bad_group(self):
        cfg, params, ws, norm, stats = _setup()
        mesh = make_mesh(n_data=8)
        cams = _orbit_cams(24)  # F_local = 3
        try:
            orbit_sharded(params, ws, cams, norm, None, cfg, mesh,
                          plane_stats=stats, scan_group=2)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "scan groups" in str(e)
