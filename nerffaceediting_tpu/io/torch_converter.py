"""Convert reference PyTorch checkpoints → our parameter pytrees.

The reference snapshots are source-embedding pickles
(ref torch_utils/persistence.py:37-130) loaded by legacy.load_network_pkl
(ref legacy.py:24-60). This converter operates on the torch *state_dict*
level — the universal interchange: run `state_dict()` on the unpickled
module (or load a plain .pt state_dict) and map names.

Our pytrees deliberately keep torch tensor layouts (conv (O,I,kh,kw), FC
(out,in)) and attribute names ('weight', 'bias', 'noise_const', ...), so the
mapping is a pure re-nesting:

  torch                                      ours
  ─────────────────────────────────────────  ─────────────────────────────
  backbone.mapping.fc0.weight                mapping.fc0.weight
  backbone.mapping.w_avg                     mapping.w_avg
  backbone.synthesis.b256.conv1.affine.bias  synthesis.b256.conv1.affine.bias
  decoder.geo_net.0.weight (Sequential)      decoder.geo_net.fc0.weight
  superresolution.block0.torgb.weight        superresolution.block0.torgb.weight

Also performs the EG3D→NeRFFaceEditing decoder split when given an
EG3D-format dict (single `decoder.net`): σ row → geo_net.fc1 row 0,
rgb rows → app_net.fc1 (ref training/training_loop.py:202-214).
"""

from __future__ import annotations

import pickle
import re
from typing import Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp


_SEQ_FC = {"0": "fc0", "2": "fc1"}  # torch Sequential indices → our names


def _set(tree: Dict, path, value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = jnp.asarray(value)


def _to_numpy(v):
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def convert_generator_state_dict(sd: Mapping[str, object]) -> Dict:
    """Map a TriPlaneGenerator (or EG3D generator) state_dict to our
    generator pytree."""
    params: Dict = {}
    eg3d_decoder: Dict[str, np.ndarray] = {}

    for name, value in sd.items():
        v = _to_numpy(value)
        parts = name.split(".")

        if name.endswith("resample_filter") or ".magnitude_ema" in name:
            continue  # static buffers we re-derive

        if parts[0] == "backbone":
            parts = parts[1:]
            if parts[0] == "mapping":
                _set(params, ["mapping"] + parts[1:], v)
            elif parts[0] == "synthesis":
                _set(params, ["synthesis"] + parts[1:], v)
            continue

        if parts[0] == "decoder":
            if parts[1] == "net":  # EG3D single decoder → split below
                eg3d_decoder[".".join(parts[2:])] = v
            else:  # geo_net / app_net Sequential
                net, idx = parts[1], parts[2]
                _set(params, ["decoder", net, _SEQ_FC[idx], parts[3]], v)
            continue

        if parts[0] == "superresolution":
            _set(params, parts, v)
            continue

        if parts[0] in ("mapping", "synthesis"):  # already-flat layout
            _set(params, parts, v)
            continue

    if eg3d_decoder:
        params.setdefault("decoder", {})
        w = eg3d_decoder["2.weight"]
        b = eg3d_decoder["2.bias"]
        fc0 = {"weight": jnp.asarray(eg3d_decoder["0.weight"]),
               "bias": jnp.asarray(eg3d_decoder["0.bias"])}
        # σ row (row 0) seeds geo_net's first output row; seg rows stay at
        # their fresh init (the surgery only copies row 0 —
        # ref training_loop.py:205-206). We zero-init the seg rows here; use
        # merge_with_init to overlay a fresh init instead.
        seg_dim = 15
        geo_w = np.zeros((1 + seg_dim, w.shape[1]), w.dtype)
        geo_b = np.zeros((1 + seg_dim,), b.dtype)
        geo_w[:1] = w[:1]
        geo_b[:1] = b[:1]
        params["decoder"]["geo_net"] = {"fc0": dict(fc0),
                                        "fc1": {"weight": jnp.asarray(geo_w),
                                                "bias": jnp.asarray(geo_b)}}
        params["decoder"]["app_net"] = {"fc0": dict(fc0),
                                        "fc1": {"weight": jnp.asarray(w[1:]),
                                                "bias": jnp.asarray(b[1:])}}
    return params


def nest_state_dict(sd: Mapping[str, object], skip=("resample_filter",)) -> Dict:
    """Re-nest a flat torch state_dict on '.' into a pytree."""
    params: Dict = {}
    for name, value in sd.items():
        if any(name.endswith(s) for s in skip):
            continue
        _set(params, name.split("."), _to_numpy(value))
    return params


def convert_discriminator_state_dict(sd: Mapping[str, object]) -> Dict:
    """Map a DualDiscriminator state_dict to our pytree (names coincide)."""
    return nest_state_dict(sd)


def convert_bisenet_state_dict(sd: Mapping[str, object]) -> Dict:
    """Map the published face-parsing checkpoint (79999_iter.pth, a plain
    state_dict — ref loss.py:203) to models/bisenet.py's pytree: names
    coincide, only nesting differs. num_batches_tracked buffers drop."""
    return nest_state_dict(sd, skip=("resample_filter", "num_batches_tracked"))


def merge_with_init(converted: Dict, init: Dict) -> Dict:
    """Overlay converted weights onto a freshly initialized pytree —
    the analogue of copy_params_and_buffers(require_all=False)
    (ref torch_utils/misc.py:157-178). Missing leaves keep their init;
    shape mismatches raise."""
    import jax

    def merge(path, a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(b)
            for k, v in a.items():
                out[k] = merge(path + (k,), v, b.get(k))
            return out
        if b is None:
            return a
        if a is None:
            return b
        if tuple(np.shape(a)) != tuple(np.shape(b)):
            raise ValueError(f"shape mismatch at {'.'.join(path)}: "
                             f"{np.shape(a)} vs {np.shape(b)}")
        return a

    return merge((), converted, init)


def load_torch_checkpoint(path: str, key: str = "G_ema") -> Dict:
    """Best-effort load of a reference pickle/state_dict file WITHOUT the
    reference codebase: a plain torch.save'd state_dict loads directly; a
    persistence pickle needs torch to reconstruct modules and may fail —
    in that case convert offline via state_dict() first."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        with open(path, "rb") as f:
            obj = pickle.load(f)

    if isinstance(obj, Mapping) and key in obj:
        obj = obj[key]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    assert isinstance(obj, Mapping), f"cannot interpret checkpoint {path}"
    return convert_generator_state_dict(obj)
