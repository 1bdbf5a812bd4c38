"""Native checkpointing via orbax (replaces the reference's source-embedding
pickles, ref torch_utils/persistence.py:37-130 + training_loop.py:448-460).

A snapshot stores {g_params, d_params, g_ema, g_opt_state, d_opt_state,
cur_nimg} plus a JSON config record — the same recovery granularity as the
reference's network-snapshot-XXXXXX.pkl, minus the embedded source (configs
are data, the code is the repo)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, state: Any, config: Optional[Dict] = None) -> None:
    """Save a train-state pytree (and an optional JSON-able config dict)."""
    path = os.path.abspath(path)
    ocp = _ocp()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a pytree checkpoint; pass `target` (a matching pytree of arrays)
    to restore with correct structure/dtypes."""
    path = os.path.abspath(path)
    ocp = _ocp()
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, item=jax.tree.map(np.asarray, target))
        return ckptr.restore(path)


def config_to_json(cfg) -> Dict:
    if dataclasses.is_dataclass(cfg):
        return dataclasses.asdict(cfg)
    return dict(cfg)
