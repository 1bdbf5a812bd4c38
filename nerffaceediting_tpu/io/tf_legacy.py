"""TF-era (StyleGAN2 / StyleGAN2-ADA TensorFlow) pickle conversion.

Rebuild of ref legacy.py:24-291: the reference unpickles legacy TensorFlow
`dnnlib.tflib.network.Network` triples (G, D, Gs) with a stub class, then
maps TF variable names onto torch module parameters. Our parameter pytrees
keep torch-style names, so the same mapping lands TF variables directly in
pytree paths — no module reflection needed.

Layout conversions (ref legacy.py:173-205, 273-290):

  TF tensor                      ours
  ─────────────────────────────  ──────────────────────────────────────────
  fc / mod weights  (in, out)    transpose → (out, in)
  conv weights  (kh, kw, in, out) transpose(3, 2, 0, 1) → (out, in, kh, kw)
  up-conv (Conv0_up/Skip)        spatial flip [::-1, ::-1] before transpose
                                 (TF stores transposed-conv taps)
  mod_bias                       +1 (TF's style bias convention is 0-centred)
  Const/const, noise{k}          squeeze the leading singleton axes

The unpickler is restricted: only numpy reconstructors, python builtins and
collections are resolved; anything under `dnnlib.` maps to an inert stub —
a legacy pickle cannot execute arbitrary classes here.
"""

from __future__ import annotations

import io
import pickle
import re
from typing import Dict, Mapping, Tuple

import numpy as np

from .torch_converter import merge_with_init, nest_state_dict


class TFNetworkStub:
    """Inert stand-in for dnnlib.tflib.network.Network (ref legacy.py:64-71):
    captures the pickled state (version, static_kwargs, variables,
    components) without importing TensorFlow-era code."""

    def __setstate__(self, state):
        self.__dict__.update(state)

    # legacy pickles may build the object via __reduce__ with a dict arg
    def __init__(self, *args, **kwargs):
        for a in args:
            if isinstance(a, dict):
                self.__dict__.update(a)
        self.__dict__.update(kwargs)


class _DictStub(dict):
    """Stand-in for dnnlib.EasyDict and friends."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


_ALLOWED_MODULE_PREFIXES = (
    "numpy", "collections", "builtins", "copyreg", "_codecs",
)


class LegacyUnpickler(pickle.Unpickler):
    """ref legacy.py:67-71, hardened: resolve the TF Network stub, map any
    other dnnlib class to a dict stub, and refuse everything outside
    numpy/builtins — a malicious "legacy pickle" cannot name arbitrary
    importables."""

    def find_class(self, module, name):
        if module == "dnnlib.tflib.network" and name == "Network":
            return TFNetworkStub
        if module.split(".")[0] in ("dnnlib", "torch_utils", "training"):
            return _DictStub
        if module.split(".")[0] in [p.split(".")[0] for p in
                                    _ALLOWED_MODULE_PREFIXES]:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"legacy pickle references disallowed class {module}.{name}")


def collect_tf_params(tf_net) -> Dict[str, np.ndarray]:
    """Flatten a TF network stub's (sub)component variables into
    {scoped/name: array} (ref legacy.py:75-84)."""
    out: Dict[str, np.ndarray] = {}

    def recurse(prefix, net):
        for name, value in getattr(net, "variables", []):
            out[prefix + name] = np.asarray(value)
        for name, comp in getattr(net, "components", {}).items():
            recurse(prefix + name + "/", comp)

    recurse("", tf_net)
    return out


def _t_fc(v):
    return np.asarray(v).transpose()


def _t_conv(v):
    return np.asarray(v).transpose(3, 2, 0, 1)


def _t_conv_up(v):
    return np.asarray(v)[::-1, ::-1].transpose(3, 2, 0, 1)


def convert_tf_generator(tf_G) -> Tuple[Dict, Dict]:
    """TF StyleGAN2 generator stub → (params pytree for models/stylegan2.py,
    config kwargs dict). Mirrors ref legacy.py:109-206.

    Returns a pytree {mapping: ..., synthesis: ...} whose leaf names/layouts
    match init_mapping/init_synthesis_network, plus the network kwargs the
    TF pickle pins (z_dim, img_resolution, channel_base, ...).
    """
    if getattr(tf_G, "version", 0) < 4:
        raise ValueError("TensorFlow pickle version too low (ref legacy.py:110)")
    tf_kwargs = dict(getattr(tf_G, "static_kwargs", {}))

    def kw(name, default=None):
        v = tf_kwargs.get(name, default)
        return default if v is None else v

    kwargs = dict(
        z_dim=kw("latent_size", 512),
        c_dim=kw("label_size", 0),
        w_dim=kw("dlatent_size", 512),
        img_resolution=kw("resolution", 1024),
        img_channels=kw("num_channels", 3),
        channel_base=kw("fmap_base", 16384) * 2,
        channel_max=kw("fmap_max", 512),
        num_mapping_layers=kw("mapping_layers", 8),
        mapping_lr_multiplier=kw("mapping_lrmul", 0.01),
    )

    tf_params = collect_tf_params(tf_G)
    # Progressive-growing ToRGB_lod{i} staging buffers → per-resolution names
    # (ref legacy.py:161-166).
    for name, value in list(tf_params.items()):
        m = re.fullmatch(r"ToRGB_lod(\d+)/(.*)", name)
        if m:
            r = kwargs["img_resolution"] // (2 ** int(m.group(1)))
            tf_params[f"{r}x{r}/ToRGB/{m.group(2)}"] = value

    sd: Dict[str, np.ndarray] = {}

    def put(ours, theirs, fn=np.asarray):
        if theirs in tf_params:
            sd[ours] = fn(tf_params[theirs])

    put("mapping.w_avg", "dlatent_avg")
    put("mapping.embed.weight", "mapping/LabelEmbed/weight", _t_fc)
    put("mapping.embed.bias", "mapping/LabelEmbed/bias")
    for name in tf_params:
        m = re.fullmatch(r"mapping/Dense(\d+)/(weight|bias)", name)
        if m:
            i, leaf = m.groups()
            put(f"mapping.fc{i}.{leaf}", name,
                _t_fc if leaf == "weight" else np.asarray)

    # 4×4 block: const input + one conv (ref legacy.py:179-185).
    put("synthesis.b4.const", "synthesis/4x4/Const/const",
        lambda v: np.asarray(v)[0])
    noise_of = {("4", "conv1"): "noise0"}

    def conv_maps(res, our_conv, tf_conv, up=False):
        base = f"synthesis/{res}x{res}/{tf_conv}"
        ours = f"synthesis.b{res}.{our_conv}"
        put(f"{ours}.weight", f"{base}/weight", _t_conv_up if up else _t_conv)
        put(f"{ours}.bias", f"{base}/bias")
        put(f"{ours}.noise_strength", f"{base}/noise_strength")
        put(f"{ours}.affine.weight", f"{base}/mod_weight", _t_fc)
        put(f"{ours}.affine.bias", f"{base}/mod_bias",
            lambda v: np.asarray(v) + 1)
        nk = noise_of.get((str(res), our_conv))
        if nk is None and our_conv in ("conv0", "conv1"):
            # noise index scheme: conv0@r → 2·log2(r)−5, conv1@r → 2·log2(r)−4
            # (ref legacy.py:188,194)
            k = int(np.log2(int(res))) * 2 - (5 if our_conv == "conv0" else 4)
            nk = f"noise{k}"
        if nk is not None:
            put(f"{ours}.noise_const", f"synthesis/{nk}",
                lambda v: np.asarray(v)[0, 0])

    conv_maps(4, "conv1", "Conv")
    put("synthesis.b4.torgb.weight", "synthesis/4x4/ToRGB/weight", _t_conv)
    put("synthesis.b4.torgb.bias", "synthesis/4x4/ToRGB/bias")
    put("synthesis.b4.torgb.affine.weight", "synthesis/4x4/ToRGB/mod_weight",
        _t_fc)
    put("synthesis.b4.torgb.affine.bias", "synthesis/4x4/ToRGB/mod_bias",
        lambda v: np.asarray(v) + 1)

    for name in tf_params:
        m = re.fullmatch(r"synthesis/(\d+)x\1/Conv0_up/weight", name)
        if not m:
            continue
        res = int(m.group(1))
        conv_maps(res, "conv0", "Conv0_up", up=True)
        conv_maps(res, "conv1", "Conv1")
        for leaf_t, leaf_o, fn in (("weight", "weight", _t_conv),
                                   ("bias", "bias", np.asarray),
                                   ("mod_weight", "affine.weight", _t_fc),
                                   ("mod_bias", "affine.bias",
                                    lambda v: np.asarray(v) + 1)):
            put(f"synthesis.b{res}.torgb.{leaf_o}",
                f"synthesis/{res}x{res}/ToRGB/{leaf_t}", fn)
        put(f"synthesis.b{res}.skip.weight",
            f"synthesis/{res}x{res}/Skip/weight", _t_conv_up)

    return nest_state_dict(sd), kwargs


def convert_tf_discriminator(tf_D) -> Tuple[Dict, Dict]:
    """TF StyleGAN2 discriminator stub → (params pytree for
    models/discriminator.py, config kwargs). Mirrors ref legacy.py:210-291."""
    if getattr(tf_D, "version", 0) < 4:
        raise ValueError("TensorFlow pickle version too low (ref legacy.py:211)")
    tf_kwargs = dict(getattr(tf_D, "static_kwargs", {}))

    def kw(name, default=None):
        v = tf_kwargs.get(name, default)
        return default if v is None else v

    kwargs = dict(
        c_dim=kw("label_size", 0),
        img_resolution=kw("resolution", 1024),
        img_channels=kw("num_channels", 3),
        channel_base=kw("fmap_base", 16384) * 2,
        channel_max=kw("fmap_max", 512),
        mbstd_group_size=kw("mbstd_group_size", 4),
        mbstd_num_channels=kw("mbstd_num_features", 1),
    )

    tf_params = collect_tf_params(tf_D)
    for name, value in list(tf_params.items()):
        m = re.fullmatch(r"FromRGB_lod(\d+)/(.*)", name)
        if m:
            r = kwargs["img_resolution"] // (2 ** int(m.group(1)))
            tf_params[f"{r}x{r}/FromRGB/{m.group(2)}"] = value

    sd: Dict[str, np.ndarray] = {}

    def put(ours, theirs, fn=np.asarray):
        if theirs in tf_params:
            sd[ours] = fn(tf_params[theirs])

    for name in tf_params:
        m = re.fullmatch(r"(\d+)x\1/(FromRGB|Conv0|Conv1_down|Skip)/(weight|bias)",
                         name)
        if not m:
            continue
        res, comp, leaf = m.groups()
        if res == "4":
            continue
        ours = {"FromRGB": "fromrgb", "Conv0": "conv0",
                "Conv1_down": "conv1", "Skip": "skip"}[comp]
        fn = (np.asarray if leaf == "bias"
              else _t_conv)
        put(f"b{res}.{ours}.{leaf}", name, fn)

    put("mapping.embed.weight", "LabelEmbed/weight", _t_fc)
    put("mapping.embed.bias", "LabelEmbed/bias")
    for name in tf_params:
        m = re.fullmatch(r"Mapping(\d+)/(weight|bias)", name)
        if m:
            i, leaf = m.groups()
            put(f"mapping.fc{i}.{leaf}", name,
                _t_fc if leaf == "weight" else np.asarray)
    put("b4.conv.weight", "4x4/Conv/weight", _t_conv)
    put("b4.conv.bias", "4x4/Conv/bias")
    put("b4.fc.weight", "4x4/Dense0/weight", _t_fc)
    put("b4.fc.bias", "4x4/Dense0/bias")
    put("b4.out.weight", "Output/weight", _t_fc)
    put("b4.out.bias", "Output/bias")

    return nest_state_dict(sd), kwargs


def load_network_pkl(f_or_path) -> Dict:
    """Load a reference snapshot pickle; legacy TF triples convert in place
    (ref legacy.py:24-46). Returns {"G": pytree|stub, "D": ..., "G_ema": ...,
    "G_kwargs": ..., "D_kwargs": ...}; torch-era pickles come back as the
    raw unpickled mapping for io.torch_converter to handle."""
    if isinstance(f_or_path, (str, bytes)):
        with open(f_or_path, "rb") as f:
            data = LegacyUnpickler(f).load()
    else:
        data = LegacyUnpickler(f_or_path).load()

    if (isinstance(data, tuple) and len(data) == 3
            and all(isinstance(n, TFNetworkStub) for n in data)):
        tf_G, tf_D, tf_Gs = data
        G, g_kwargs = convert_tf_generator(tf_G)
        D, d_kwargs = convert_tf_discriminator(tf_D)
        G_ema, _ = convert_tf_generator(tf_Gs)
        return {"G": G, "D": D, "G_ema": G_ema,
                "G_kwargs": g_kwargs, "D_kwargs": d_kwargs}
    return data


__all__ = [
    "TFNetworkStub", "LegacyUnpickler", "collect_tf_params",
    "convert_tf_generator", "convert_tf_discriminator", "load_network_pkl",
    "merge_with_init",
]
