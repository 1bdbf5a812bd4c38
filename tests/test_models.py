"""Model-layer tests: FC/mapping vs torch oracle, synthesis network shapes,
full TriPlaneGenerator end-to-end forward (BASELINE config 1 & 2 smoke)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from nerffaceediting_tpu.config import ffhq_generator_config, ffhq_rendering_config
from nerffaceediting_tpu.models.layers import (
    fully_connected,
    init_fully_connected,
    minibatch_std_layer,
    normalize_2nd_moment,
)
from nerffaceediting_tpu.models.stylegan2 import (
    block_resolutions,
    channels_dict,
    init_mapping,
    init_synthesis_network,
    mapping_apply,
    mapping_update_w_avg,
    num_synthesis_ws,
    synthesis_network,
)
from nerffaceediting_tpu.models import triplane
from nerffaceediting_tpu.render.cameras import (
    camera_params,
    fov_to_intrinsics,
    lookat_pose,
)


class TestFullyConnected:
    def test_matches_torch_equalized_lr(self):
        """Equalized-lr semantics: y = x @ (wᵀ·lr/√in) + b·lr, then lrelu·√2
        (ref networks_stylegan2.py:96-127)."""
        rng = np.random.default_rng(0)
        w = rng.normal(size=(8, 16)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        x = rng.normal(size=(4, 16)).astype(np.float32)
        lr = 0.01

        params = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
        out = np.asarray(fully_connected(params, jnp.asarray(x), activation="lrelu",
                                         lr_multiplier=lr))

        wt = torch.tensor(w) * (lr / np.sqrt(16))
        bt = torch.tensor(b) * lr
        y = torch.tensor(x) @ wt.t() + bt
        expected = (torch.nn.functional.leaky_relu(y, 0.2) * np.sqrt(2)).numpy()
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_normalize_2nd_moment(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 512)).astype(np.float32))
        y = np.asarray(normalize_2nd_moment(x))
        np.testing.assert_allclose((y**2).mean(axis=1), 1.0, rtol=1e-4)


class TestMapping:
    def test_shapes_and_truncation(self):
        key = jax.random.key(0)
        params = init_mapping(key, z_dim=64, c_dim=25, w_dim=64, num_ws=14, num_layers=2)
        z = jax.random.normal(jax.random.key(1), (3, 64))
        c = jax.random.normal(jax.random.key(2), (3, 25))
        ws = mapping_apply(params, z, c, num_ws=14, num_layers=2)
        assert ws.shape == (3, 14, 64)
        # full truncation to psi=0 collapses to w_avg
        ws0 = mapping_apply(params, z, c, num_ws=14, num_layers=2, truncation_psi=0.0)
        np.testing.assert_allclose(
            np.asarray(ws0), np.broadcast_to(np.asarray(params["w_avg"]), ws0.shape), atol=1e-6
        )
        # cutoff: only first k layers truncated
        ws_cut = mapping_apply(params, z, c, num_ws=14, num_layers=2,
                               truncation_psi=0.0, truncation_cutoff=7)
        np.testing.assert_allclose(np.asarray(ws_cut[:, 7:]), np.asarray(ws[:, 7:]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ws_cut[:, :7]),
            np.broadcast_to(np.asarray(params["w_avg"]), (3, 7, 64)), atol=1e-6)

    def test_w_avg_update(self):
        key = jax.random.key(0)
        params = init_mapping(key, z_dim=8, c_dim=0, w_dim=8, num_ws=2, num_layers=2)
        w = jnp.ones((4, 2, 8))
        updated = mapping_update_w_avg(params, w, beta=0.5)
        np.testing.assert_allclose(np.asarray(updated["w_avg"]), 0.5, atol=1e-6)


class TestSynthesisNetwork:
    def test_channel_schedule_matches_reference(self):
        """ffhq backbone: 256² output, channel_base 32768, max 512
        (ref networks_stylegan2.py:487)."""
        cd = channels_dict(256)
        assert cd == {4: 512, 8: 512, 16: 512, 32: 512, 64: 512, 128: 256, 256: 128}
        assert block_resolutions(256) == [4, 8, 16, 32, 64, 128, 256]
        assert num_synthesis_ws(256) == 14

    def test_forward_shapes_small(self):
        key = jax.random.key(0)
        params = init_synthesis_network(key, w_dim=32, img_resolution=32, img_channels=6,
                                        channel_base=1024, channel_max=64)
        num_ws = num_synthesis_ws(32)
        ws = jax.random.normal(jax.random.key(1), (2, num_ws, 32))
        img = synthesis_network(params, ws, img_resolution=32)
        assert img.shape == (2, 6, 32, 32)
        assert img.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(img)))

    def test_noise_modes(self):
        key = jax.random.key(0)
        params = init_synthesis_network(key, w_dim=16, img_resolution=16, img_channels=3,
                                        channel_base=512, channel_max=32)
        ws = jax.random.normal(jax.random.key(1), (1, num_synthesis_ws(16), 16))
        img_const = synthesis_network(params, ws, img_resolution=16, noise_mode="const")
        img_const2 = synthesis_network(params, ws, img_resolution=16, noise_mode="const")
        np.testing.assert_allclose(np.asarray(img_const), np.asarray(img_const2), atol=1e-6)
        img_none = synthesis_network(params, ws, img_resolution=16, noise_mode="none")
        # noise_strength initializes to 0 so const == none at init
        np.testing.assert_allclose(np.asarray(img_const), np.asarray(img_none), atol=1e-6)
        img_rand = synthesis_network(params, ws, img_resolution=16, noise_mode="random",
                                     rng=jax.random.key(2))
        assert np.all(np.isfinite(np.asarray(img_rand)))


class TestMinibatchStd:
    def test_appends_channel(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 4, 4)).astype(np.float32))
        y = minibatch_std_layer(x, group_size=4, num_channels=1)
        assert y.shape == (4, 9, 4, 4)
        # the appended channel is constant within the group
        arr = np.asarray(y[:, 8])
        np.testing.assert_allclose(arr, np.broadcast_to(arr[0:1], arr.shape), atol=1e-6)


def tiny_config():
    """A scaled-down ffhq config that runs fast on CPU."""
    rendering = ffhq_rendering_config(
        image_resolution=128,
        depth_resolution=8,
        depth_resolution_importance=8,
        superresolution_module="SuperresolutionHybrid2X",
    )
    return ffhq_generator_config(
        z_dim=32, c_dim=25, w_dim=32, img_resolution=128,
        backbone_resolution=64, channel_base=2048, channel_max=64,
        neural_rendering_resolution=32, rendering=rendering,
    )


class TestTriPlaneGenerator:
    def test_plane_stats_roundtrip(self):
        planes = jax.random.normal(jax.random.key(0), (2, 96, 16, 16)) * 3 + 1
        norm, mean, var = triplane.normalize_plane(planes)
        np.testing.assert_allclose(np.asarray(jnp.mean(norm, axis=(-1, -2))), 0.0, atol=1e-4)
        recon = triplane.denormalize_plane(norm, mean, var)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(planes), rtol=1e-3, atol=1e-4)

    def test_end_to_end_generate(self):
        cfg = tiny_config()
        params = triplane.init_generator(jax.random.key(0), cfg)
        z = jax.random.normal(jax.random.key(1), (2, cfg.z_dim))
        cam = lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7, batch_size=2)
        c = camera_params(cam, fov_to_intrinsics(18.837))
        out = triplane.generate(params, z, c, cfg)
        assert out["image"].shape == (2, 3, 128, 128)
        assert out["image_raw"].shape == (2, 3, 32, 32)
        assert out["image_seg"].shape == (2, 15, 32, 32)
        assert out["image_depth"].shape == (2, 1, 32, 32)
        assert out["plane_mean"].shape == (2, 96, 1, 1)
        for k in ("image", "image_raw", "image_seg", "image_depth"):
            assert np.all(np.isfinite(np.asarray(out[k]))), k

    def test_appearance_stats_swap_changes_image_not_geometry(self):
        """Swapping plane statistics (appearance transfer) must keep σ/seg
        (driven by normalized planes) identical while changing rgb."""
        cfg = tiny_config()
        params = triplane.init_generator(jax.random.key(0), cfg)
        z = jax.random.normal(jax.random.key(1), (2, cfg.z_dim))
        cam = lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7, batch_size=2)
        c = camera_params(cam, fov_to_intrinsics(18.837))
        ws = triplane.mapping(params, z, c, cfg)
        out = triplane.synthesis(params, ws, c, cfg)
        swapped = triplane.synthesis(params, ws, c, cfg, stats_from_index=0)

        # sample 0 keeps its own stats → identical output
        np.testing.assert_allclose(
            np.asarray(swapped["image_raw"][0]), np.asarray(out["image_raw"][0]),
            rtol=1e-4, atol=1e-5)
        # sample 1 now wears sample 0's appearance → rgb differs
        assert np.abs(np.asarray(swapped["image_raw"][1]) - np.asarray(out["image_raw"][1])).max() > 1e-3
        # geometry (seg logits volume) is appearance-invariant
        np.testing.assert_allclose(
            np.asarray(swapped["image_seg"][1]), np.asarray(out["image_seg"][1]),
            rtol=1e-3, atol=1e-4)

    def test_sample_points(self):
        cfg = tiny_config()
        params = triplane.init_generator(jax.random.key(0), cfg)
        z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
        c = jnp.zeros((1, 25))
        ws = triplane.mapping(params, z, c, cfg)
        coords = jax.random.uniform(jax.random.key(2), (1, 100, 3), minval=-0.4, maxval=0.4)
        out = triplane.sample_points(params, coords, ws, cfg)
        assert out["sigma"].shape == (1, 100, 1)
        assert out["rgb"].shape == (1, 100, 32)
        assert out["seg"].shape == (1, 100, 15)

    def test_jit_compiles_once(self):
        cfg = tiny_config()
        params = triplane.init_generator(jax.random.key(0), cfg)
        z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
        cam = lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7)
        c = camera_params(cam, fov_to_intrinsics(18.837))

        calls = {"n": 0}

        @jax.jit
        def fwd(params, z, c):
            calls["n"] += 1
            return triplane.generate(params, z, c, cfg)["image"]

        img1 = fwd(params, z, c)
        img2 = fwd(params, z, c)
        assert calls["n"] == 1  # traced exactly once
        np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)
