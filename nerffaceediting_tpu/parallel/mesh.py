"""Device mesh + sharding helpers.

TPU-native replacement for the reference's hand-rolled multiprocessing DP
(ref: train.py:32-103 spawn + NCCL, training_loop.py:240-347 broadcast /
flat-grad all_reduce — see SURVEY §2.5). Here parallelism is declarative:

* one JAX process per host (`jax.distributed.initialize` for multi-host),
* a `Mesh` with a `data` axis (DP) and a `model` axis reserved for sharding
  the ray/sample dimension of the renderer (the model has no attention; its
  long axis is rays×samples, SURVEY §5),
* params replicated, batches sharded on `data`; XLA inserts the psum for
  gradient averaging — the explicit `all_reduce` of the reference
  (training_loop.py:338-347) has no hand-written equivalent.

The reference's rank-0 param broadcast is subsumed by replicated sharding;
`check_ddp_consistency` (misc.py:182-193) becomes `assert_replica_consistency`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices. Defaults to
    all devices on the data axis (pure DP, the reference's only strategy)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{len(devices)} devices cannot form a ({n_data}, {n_model}) mesh"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading axis sharded over `data`."""
    sharding = data_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a param/state pytree across the mesh (the reference's
    rank-0 broadcast, training_loop.py:240-244)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def assert_replica_consistency(tree) -> None:
    """Debug check that replicated arrays agree across devices (the
    reference's check_ddp_consistency, misc.py:182-193). Call outside jit."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards") or len(leaf.addressable_shards) < 2:
            continue
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            if not np.array_equal(shards[0], s, equal_nan=True):
                name = jax.tree_util.keystr(path)
                raise AssertionError(f"replica mismatch at {name}")
