"""Runtime utilities (rebuild of ref torch_utils/misc.py essentials)."""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Shape contract assertion (ref torch_utils/misc.py:84-97): None
    entries are wildcards."""
    shape = tuple(x.shape)
    if len(shape) != len(ref_shape):
        raise AssertionError(f"wrong ndim: got {len(shape)}, expected {len(ref_shape)}")
    for i, (s, r) in enumerate(zip(shape, ref_shape)):
        if r is not None and s != r:
            raise AssertionError(f"wrong size for dim {i}: got {s}, expected {r}")


class InfiniteSampler:
    """Infinite shuffled index stream sharded by replica
    (ref torch_utils/misc.py:113-144): each host/replica takes every
    num_replicas-th index of a per-epoch shuffle, with optional window-based
    local shuffling."""

    def __init__(self, dataset_size: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0, window_size: float = 0.5):
        assert dataset_size > 0
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))

        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                if window >= 2:
                    j = (i - rnd.randint(window)) % order.size
                    order[i], order[j] = order[j], order[i]
                yield int(order[i])
            idx += 1


def nan_to_num_tree(tree, nan=0.0, posinf=1e5, neginf=-1e5):
    """Grad scrub (ref training_loop.py:344)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda g: jnp.nan_to_num(g, nan=nan, posinf=posinf, neginf=neginf), tree)


def print_module_summary(params, name: str = "params") -> int:
    """Parameter-count table (the reference's print_module_summary dry-run,
    misc.py:198-266, minus the forward trace — shape errors surface at jit
    time in JAX)."""
    import jax

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    print(f"{name:<60s} {'shape':<20s} {'params':>12s}")
    for path, leaf in leaves:
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        print(f"{jax.tree_util.keystr(path):<60s} {str(tuple(leaf.shape)):<20s} {n:>12d}")
    print(f"{'TOTAL':<60s} {'':<20s} {total:>12d}")
    return total
