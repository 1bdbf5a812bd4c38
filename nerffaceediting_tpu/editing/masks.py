"""Semantic-mask palette utilities (rebuild of ref utils.py:91-128 and the
19→15 label remap of ref training/loss.py:29-54).

The 15-label edit vocabulary merges BiSeNet's left/right part pairs; the
palette is the one hand-edited masks are drawn in (decoded back to labels
with `colors_to_labels`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ref utils.py:92-108 (index 15 is an unused white sentinel)
PART_COLORS = np.asarray(
    [
        [0, 0, 0],        # 0  Background
        [127, 212, 255],  # 1  Skin
        [255, 212, 255],  # 2  Eye Brow
        [255, 255, 170],  # 3  Eye
        [255, 255, 130],  # 4  Glass
        [76, 153, 0],     # 5  Ear
        [0, 255, 170],    # 6  Ear Ring
        [244, 124, 244],  # 7  Nose
        [30, 162, 230],   # 8  Mouth
        [127, 255, 255],  # 9  Lip
        [127, 170, 255],  # 10 Neck
        [85, 0, 255],     # 11 Neck-lace
        [255, 170, 127],  # 12 Cloth
        [212, 127, 255],  # 13 Hair
        [0, 170, 255],    # 14 Hat
        [255, 255, 255],  # 15 (sentinel)
    ],
    dtype=np.float32,
)

# BiSeNet 19-class → 15-label merge (ref loss.py:29-51).
SEG_MAPPING = np.asarray(
    [0, 1, 2, 2, 3, 3, 4, 5, 5, 6, 7, 8, 9, 9, 10, 11, 12, 13, 14], dtype=np.int32
)


def remap_seg(seg: jax.Array) -> jax.Array:
    """19-class BiSeNet labels → 15-label vocabulary (ref loss.py:52-54)."""
    return jnp.asarray(SEG_MAPPING)[seg]


def labels_to_colors(seg: jax.Array, argmax: bool = True) -> jax.Array:
    """Label map (B, K, H, W) logits or (B, 1, H, W) ids → RGB in (−1, 1)
    (ref utils.py:110-119)."""
    if argmax:
        seg = jnp.argmax(seg, axis=1, keepdims=True)
    palette = jnp.asarray(PART_COLORS) / 255.0 * 2 - 1  # (16, 3)
    colors = palette[seg[:, 0]]  # (B, H, W, 3)
    return colors.transpose(0, 3, 1, 2)


def colors_to_labels(img: jax.Array, tol: float = 1e-2) -> jax.Array:
    """RGB mask in (−1, 1) → integer labels (B, 1, H, W); the inverse=True
    decoding used for hand-edited masks (ref utils.py:121-128). Pixels not
    matching any palette color (within tol) map to 0."""
    palette = jnp.asarray(PART_COLORS) / 255.0 * 2 - 1  # (16, 3)
    x = img.transpose(0, 2, 3, 1)[..., None, :]  # (B, H, W, 1, 3)
    match = jnp.all(jnp.abs(x - palette) <= tol, axis=-1)  # (B, H, W, 16)
    # last matching index wins, like the reference's sequential overwrites
    idx = jnp.arange(palette.shape[0])
    labels = jnp.max(jnp.where(match, idx, 0), axis=-1)
    return labels[:, None].astype(jnp.int32)
