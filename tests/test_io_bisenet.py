"""Checkpoint converter round-trips + BiSeNet parity spot checks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nerffaceediting_tpu.config import ffhq_generator_config, ffhq_rendering_config
from nerffaceediting_tpu.models import triplane
from nerffaceediting_tpu.models.bisenet import (
    _basic_block,
    _bn,
    _conv_bn_relu,
    _resize_bilinear_ac,
    bisenet_apply,
    init_bisenet,
)
from nerffaceediting_tpu.io.torch_converter import (
    convert_bisenet_state_dict,
    convert_generator_state_dict,
    merge_with_init,
    nest_state_dict,
)

# BiSeNet forward + converter roundtrip ~55 s (measured r3) — excluded from the default dev tier
# (pytest -m 'not slow' tests/); the full tier still runs everything.
pytestmark = pytest.mark.slow


def flatten_to_state_dict(tree, prefix=""):
    """Flatten our pytree back into torch-style dotted names."""
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_to_state_dict(v, name + "."))
        else:
            out[name] = np.asarray(v)
    return out


class TestConverter:
    def test_generator_roundtrip(self):
        """init → rename to torch layout → convert back == identity."""
        cfg = ffhq_generator_config(
            z_dim=16, w_dim=16, img_resolution=128, backbone_resolution=32,
            channel_base=512, channel_max=32,
            rendering=ffhq_rendering_config(
                image_resolution=128, superresolution_module="SuperresolutionHybrid2X",
                depth_resolution=4, depth_resolution_importance=4),
        )
        params = triplane.init_generator(jax.random.key(0), cfg)

        sd = {}
        sd.update({f"backbone.mapping.{k}": v for k, v in
                   flatten_to_state_dict(params["mapping"]).items()})
        sd.update({f"backbone.synthesis.{k}": v for k, v in
                   flatten_to_state_dict(params["synthesis"]).items()})
        sd.update({f"superresolution.{k}": v for k, v in
                   flatten_to_state_dict(params["superresolution"]).items()})
        # decoder Sequential naming: fc0→0, fc1→2
        for net in ("geo_net", "app_net"):
            for ours, theirs in (("fc0", "0"), ("fc1", "2")):
                for leaf in ("weight", "bias"):
                    sd[f"decoder.{net}.{theirs}.{leaf}"] = np.asarray(
                        params["decoder"][net][ours][leaf])

        converted = convert_generator_state_dict(sd)
        flat_a = flatten_to_state_dict(params)
        flat_b = flatten_to_state_dict(converted)
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)

    def test_eg3d_decoder_split(self):
        """EG3D single-decoder checkpoints split σ/rgb rows
        (ref training_loop.py:202-214)."""
        rng = np.random.default_rng(0)
        sd = {
            "decoder.net.0.weight": rng.normal(size=(64, 32)).astype(np.float32),
            "decoder.net.0.bias": rng.normal(size=(64,)).astype(np.float32),
            "decoder.net.2.weight": rng.normal(size=(33, 64)).astype(np.float32),
            "decoder.net.2.bias": rng.normal(size=(33,)).astype(np.float32),
        }
        p = convert_generator_state_dict(sd)["decoder"]
        np.testing.assert_array_equal(np.asarray(p["geo_net"]["fc1"]["weight"])[0],
                                      sd["decoder.net.2.weight"][0])
        assert p["geo_net"]["fc1"]["weight"].shape == (16, 64)
        np.testing.assert_array_equal(np.asarray(p["app_net"]["fc1"]["weight"]),
                                      sd["decoder.net.2.weight"][1:])
        np.testing.assert_array_equal(np.asarray(p["app_net"]["fc0"]["weight"]),
                                      sd["decoder.net.0.weight"])

    def test_merge_with_init_partial(self):
        init = {"a": {"w": jnp.zeros((2, 2)), "b": jnp.zeros((2,))}, "c": jnp.ones((3,))}
        partial = {"a": {"w": jnp.ones((2, 2))}}
        merged = merge_with_init(partial, init)
        np.testing.assert_array_equal(np.asarray(merged["a"]["w"]), 1.0)
        np.testing.assert_array_equal(np.asarray(merged["a"]["b"]), 0.0)
        np.testing.assert_array_equal(np.asarray(merged["c"]), 1.0)
        with pytest.raises(ValueError):
            merge_with_init({"c": jnp.ones((4,))}, init)


class TestBiSeNet:
    def test_frozen_bn_matches_torch(self):
        rng = np.random.default_rng(1)
        c = 8
        p = {
            "weight": jnp.asarray(rng.normal(size=(c,)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=(c,)).astype(np.float32)),
            "running_mean": jnp.asarray(rng.normal(size=(c,)).astype(np.float32)),
            "running_var": jnp.asarray(rng.uniform(0.5, 2, (c,)).astype(np.float32)),
        }
        x = rng.normal(size=(2, c, 4, 4)).astype(np.float32)
        out = np.asarray(_bn(p, jnp.asarray(x)))
        bn = torch.nn.BatchNorm2d(c).eval()
        with torch.no_grad():
            bn.weight.copy_(torch.tensor(np.asarray(p["weight"])))
            bn.bias.copy_(torch.tensor(np.asarray(p["bias"])))
            bn.running_mean.copy_(torch.tensor(np.asarray(p["running_mean"])))
            bn.running_var.copy_(torch.tensor(np.asarray(p["running_var"])))
            expected = bn(torch.tensor(x)).numpy()
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_basic_block_matches_torch(self):
        rng = np.random.default_rng(2)

        def conv_p(o, i, k):
            return {"weight": jnp.asarray(rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.1)}

        def bn_p(c):
            return {"weight": jnp.asarray(rng.uniform(0.5, 1.5, (c,)).astype(np.float32)),
                    "bias": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
                    "running_mean": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
                    "running_var": jnp.asarray(rng.uniform(0.5, 2, (c,)).astype(np.float32))}

        p = {"conv1": conv_p(16, 8, 3), "bn1": bn_p(16),
             "conv2": conv_p(16, 16, 3), "bn2": bn_p(16),
             "downsample": {"0": conv_p(16, 8, 1), "1": bn_p(16)}}
        x = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
        out = np.asarray(_basic_block(p, jnp.asarray(x), stride=2))

        def t_bn(pp, t):
            w, b = torch.tensor(np.asarray(pp["weight"])), torch.tensor(np.asarray(pp["bias"]))
            m, v = torch.tensor(np.asarray(pp["running_mean"])), torch.tensor(np.asarray(pp["running_var"]))
            return F.batch_norm(t, m, v, w, b, training=False)

        xt = torch.tensor(x)
        r = F.relu(t_bn(p["bn1"], F.conv2d(xt, torch.tensor(np.asarray(p["conv1"]["weight"])), stride=2, padding=1)))
        r = t_bn(p["bn2"], F.conv2d(r, torch.tensor(np.asarray(p["conv2"]["weight"])), padding=1))
        sc = t_bn(p["downsample"]["1"], F.conv2d(xt, torch.tensor(np.asarray(p["downsample"]["0"]["weight"])), stride=2))
        expected = F.relu(sc + r).numpy()
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_align_corners_resize_matches_torch(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 4, 7, 5)).astype(np.float32)
        out = np.asarray(_resize_bilinear_ac(jnp.asarray(x), (14, 10)))
        expected = F.interpolate(torch.tensor(x), size=(14, 10), mode="bilinear",
                                 align_corners=True).numpy()
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_full_forward_shapes(self):
        params = init_bisenet(jax.random.key(0))
        img = jax.random.uniform(jax.random.key(1), (1, 3, 64, 64), minval=-1, maxval=1)
        out = bisenet_apply(params, img)
        assert out.shape == (1, 19, 64, 64)
        assert np.all(np.isfinite(np.asarray(out)))
        o, o16, o32 = bisenet_apply(params, img, main_only=False)
        assert o16.shape == (1, 19, 64, 64) and o32.shape == (1, 19, 64, 64)

    def test_state_dict_conversion_nesting(self):
        params = init_bisenet(jax.random.key(0))
        sd = flatten_to_state_dict(params)
        sd["cp.resnet.bn1.num_batches_tracked"] = np.asarray(7)  # dropped
        back = convert_bisenet_state_dict(sd)
        flat_a = flatten_to_state_dict(params)
        flat_b = flatten_to_state_dict(back)
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)
