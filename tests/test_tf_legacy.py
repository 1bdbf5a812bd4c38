"""TF-era legacy pickle conversion (io/tf_legacy.py vs ref legacy.py:24-291).

Builds a synthetic TensorFlow StyleGAN2 pickle (the dnnlib.tflib Network
triple) for a tiny 16×16 config and checks that conversion produces pytrees
whose leaves merge shape-exactly into our initializers, with the documented
layout transforms (fc transpose, conv transpose, up-conv flip, mod_bias+1)
applied.
"""

import pickle
import sys
import types

import numpy as np
import jax
import pytest

from nerffaceediting_tpu.models import discriminator as disc_mod
from nerffaceediting_tpu.models import stylegan2 as sg2


RES = 16
W_DIM = 32
Z_DIM = 32
CBASE = 1024
CMAX = 64


def _chan(res):
    return min(CBASE // res, CMAX)


_FAKE_MODS = ("dnnlib", "dnnlib.tflib", "dnnlib.tflib.network")


def _fake_network_class():
    """Register a dnnlib.tflib.network.Network lookalike so pickling by
    reference produces the legacy module path."""
    mod_name = "dnnlib.tflib.network"
    if mod_name in sys.modules:
        return sys.modules[mod_name].Network
    dnnlib = types.ModuleType("dnnlib")
    tflib = types.ModuleType("dnnlib.tflib")
    network = types.ModuleType(mod_name)

    class Network:
        pass

    network.Network = Network
    Network.__module__ = mod_name
    Network.__qualname__ = "Network"
    dnnlib.tflib = tflib
    tflib.network = network
    for m in (dnnlib, tflib, network):
        m.__nfe_fake__ = True
    sys.modules["dnnlib"] = dnnlib
    sys.modules["dnnlib.tflib"] = tflib
    sys.modules[mod_name] = network
    return Network


@pytest.fixture(scope="module", autouse=True)
def _unregister_fake_dnnlib():
    """Drop the fake modules after this file's tests: a stale fake `dnnlib`
    in sys.modules shadows the reference's real one and breaks
    test_torch_parity.py when both run in the same process."""
    yield
    for name in _FAKE_MODS:
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__nfe_fake__", False):
            del sys.modules[name]


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _tf_generator_variables(rng):
    v = []
    v.append(("dlatent_avg", _rand(rng, W_DIM)))
    for i in range(2):
        v.append((f"mapping/Dense{i}/weight", _rand(rng, Z_DIM, W_DIM)))
        v.append((f"mapping/Dense{i}/bias", _rand(rng, W_DIM)))
    c4 = _chan(4)
    v.append(("synthesis/4x4/Const/const", _rand(rng, 1, c4, 4, 4)))
    v.append(("synthesis/noise0", _rand(rng, 1, 1, 4, 4)))

    def conv(prefix, cin, cout, res_noise=None):
        v.append((f"{prefix}/weight", _rand(rng, 3, 3, cin, cout)))
        v.append((f"{prefix}/bias", _rand(rng, cout)))
        v.append((f"{prefix}/noise_strength", np.float32(0.1)))
        v.append((f"{prefix}/mod_weight", _rand(rng, W_DIM, cin)))
        v.append((f"{prefix}/mod_bias", _rand(rng, cin)))

    def torgb(prefix, cin):
        v.append((f"{prefix}/weight", _rand(rng, 1, 1, cin, 3)))
        v.append((f"{prefix}/bias", _rand(rng, 3)))
        v.append((f"{prefix}/mod_weight", _rand(rng, W_DIM, cin)))
        v.append((f"{prefix}/mod_bias", _rand(rng, cin)))

    conv("synthesis/4x4/Conv", c4, c4)
    torgb("synthesis/4x4/ToRGB", c4)
    for res in (8, 16):
        cin, cout = _chan(res // 2), _chan(res)
        k = int(np.log2(res))
        conv(f"synthesis/{res}x{res}/Conv0_up", cin, cout)
        v.append((f"synthesis/noise{2 * k - 5}", _rand(rng, 1, 1, res, res)))
        conv(f"synthesis/{res}x{res}/Conv1", cout, cout)
        v.append((f"synthesis/noise{2 * k - 4}", _rand(rng, 1, 1, res, res)))
        torgb(f"synthesis/{res}x{res}/ToRGB", cout)
    return v


def _tf_discriminator_variables(rng):
    v = []
    top = _chan(RES)
    v.append((f"{RES}x{RES}/FromRGB/weight", _rand(rng, 1, 1, 3, top)))
    v.append((f"{RES}x{RES}/FromRGB/bias", _rand(rng, top)))
    for res in (16, 8):
        tmp, cout = _chan(res), _chan(res // 2)
        v.append((f"{res}x{res}/Conv0/weight", _rand(rng, 3, 3, tmp, tmp)))
        v.append((f"{res}x{res}/Conv0/bias", _rand(rng, tmp)))
        v.append((f"{res}x{res}/Conv1_down/weight", _rand(rng, 3, 3, tmp, cout)))
        v.append((f"{res}x{res}/Conv1_down/bias", _rand(rng, cout)))
        v.append((f"{res}x{res}/Skip/weight", _rand(rng, 1, 1, tmp, cout)))
    c4 = _chan(4)
    v.append(("4x4/Conv/weight", _rand(rng, 3, 3, c4 + 1, c4)))
    v.append(("4x4/Conv/bias", _rand(rng, c4)))
    v.append(("4x4/Dense0/weight", _rand(rng, c4 * 16, c4)))
    v.append(("4x4/Dense0/bias", _rand(rng, c4)))
    v.append(("Output/weight", _rand(rng, c4, 1)))
    v.append(("Output/bias", _rand(rng, 1)))
    return v


def _make_pickle(tmp_path):
    Network = _fake_network_class()
    rng = np.random.default_rng(0)

    def net(variables, **static_kwargs):
        n = Network()
        n.version = 4
        n.static_kwargs = static_kwargs
        n.variables = variables
        n.components = {}
        return n

    g_kwargs = dict(latent_size=Z_DIM, dlatent_size=W_DIM, resolution=RES,
                    num_channels=3, fmap_base=CBASE // 2, fmap_max=CMAX,
                    mapping_layers=2)
    d_kwargs = dict(resolution=RES, num_channels=3, fmap_base=CBASE // 2,
                    fmap_max=CMAX)
    g_vars = _tf_generator_variables(rng)
    tf_G = net(g_vars, **g_kwargs)
    tf_D = net(_tf_discriminator_variables(rng), **d_kwargs)
    tf_Gs = net(g_vars, **g_kwargs)
    path = tmp_path / "legacy.pkl"
    with open(path, "wb") as f:
        pickle.dump((tf_G, tf_D, tf_Gs), f)
    return path


class TestTFLegacy:
    def test_convert_and_merge(self, tmp_path):
        from nerffaceediting_tpu.io.tf_legacy import (load_network_pkl,
                                                      merge_with_init)

        data = load_network_pkl(str(_make_pickle(tmp_path)))
        assert set(data) >= {"G", "D", "G_ema", "G_kwargs", "D_kwargs"}
        assert data["G_kwargs"]["img_resolution"] == RES
        assert data["G_kwargs"]["channel_base"] == CBASE

        # shape-exact merge into our initializers
        key = jax.random.key(0)
        g_init = {
            "mapping": sg2.init_mapping(key, Z_DIM, 0, W_DIM,
                                        sg2.num_synthesis_ws(RES),
                                        num_layers=2),
            "synthesis": sg2.init_synthesis_network(
                key, W_DIM, RES, 3, channel_base=CBASE, channel_max=CMAX),
        }
        merged = merge_with_init(data["G"], g_init)
        # every converted leaf must exist in the init with the same shape
        leaves_conv = jax.tree_util.tree_leaves_with_path(data["G"])
        flat_init = dict(jax.tree_util.tree_leaves_with_path(g_init))
        assert len(leaves_conv) > 30
        for path, leaf in leaves_conv:
            assert path in flat_init, path
            assert np.shape(leaf) == np.shape(flat_init[path]), path
        assert jax.tree_util.tree_structure(merged) == \
            jax.tree_util.tree_structure(g_init)

        from nerffaceediting_tpu.config import DiscriminatorConfig
        d_cfg = DiscriminatorConfig(c_dim=0, img_resolution=RES,
                                    img_channels=3, channel_base=CBASE,
                                    channel_max=CMAX, mbstd_num_channels=1)
        d_init = disc_mod.init_single_discriminator(key, d_cfg)
        flat_d = dict(jax.tree_util.tree_leaves_with_path(d_init))
        for path, leaf in jax.tree_util.tree_leaves_with_path(data["D"]):
            assert path in flat_d, path
            assert np.shape(leaf) == np.shape(flat_d[path]), path

    def test_layout_transforms(self, tmp_path):
        from nerffaceediting_tpu.io.tf_legacy import (LegacyUnpickler,
                                                      convert_tf_generator)

        path = _make_pickle(tmp_path)
        with open(path, "rb") as f:
            tf_G, _, _ = LegacyUnpickler(f).load()
        tfp = {n: v for n, v in tf_G.variables}
        G, _ = convert_tf_generator(tf_G)

        # fc transpose
        np.testing.assert_array_equal(
            G["mapping"]["fc0"]["weight"],
            tfp["mapping/Dense0/weight"].transpose())
        # conv transpose (kh,kw,in,out) -> (out,in,kh,kw)
        np.testing.assert_array_equal(
            G["synthesis"]["b4"]["conv1"]["weight"],
            tfp["synthesis/4x4/Conv/weight"].transpose(3, 2, 0, 1))
        # up-conv spatial flip
        np.testing.assert_array_equal(
            G["synthesis"]["b8"]["conv0"]["weight"],
            tfp["synthesis/8x8/Conv0_up/weight"][::-1, ::-1].transpose(3, 2, 0, 1))
        # mod_bias +1
        np.testing.assert_allclose(
            G["synthesis"]["b8"]["conv1"]["affine"]["bias"],
            tfp["synthesis/8x8/Conv1/mod_bias"] + 1)
        # noise routing: conv0@8 -> noise1, conv1@8 -> noise2
        np.testing.assert_array_equal(
            G["synthesis"]["b8"]["conv0"]["noise_const"],
            tfp["synthesis/noise1"][0, 0])
        np.testing.assert_array_equal(
            G["synthesis"]["b8"]["conv1"]["noise_const"],
            tfp["synthesis/noise2"][0, 0])

    def test_unpickler_rejects_arbitrary_classes(self):
        import io as _io
        import subprocess

        from nerffaceediting_tpu.io.tf_legacy import LegacyUnpickler

        ok = pickle.dumps(("os", "system"))  # harmless data loads fine
        assert LegacyUnpickler(_io.BytesIO(ok)).load() == ("os", "system")

        bad = pickle.dumps(subprocess.Popen)  # class-by-reference payload
        with pytest.raises(pickle.UnpicklingError):
            LegacyUnpickler(_io.BytesIO(bad)).load()
