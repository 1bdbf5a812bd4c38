"""Fused Pallas tri-plane sampling kernel — the signature kernel of this
framework (SURVEY §7 "hard parts").

Replaces the grid_sample gathers of the render hot path
(ref renderer.py:55-65 → F.grid_sample): XLA's TPU gather lowering runs the
4-tap × 3-plane × 32-channel lookup at <1% of HBM bandwidth (~45 ms per
196k-point pass, measured). This kernel reformulates bilinear sampling as a
**double one-hot contraction on the MXU**:

    sample[p, c] = Σ_y Σ_x  Ry[p, y] · Rx[p, x] · plane[y, x, c]

with Ry/Rx the 2-tap bilinear row/column weight matrices (built in-kernel by
iota comparison — never materialized in HBM). Per point-block:

    T   = Ry @ plane.reshape(H, W·C)      # MXU, (P, W·C), lives in VMEM
    out = Σ_x Rx[p, x] · T[p, x, :]       # VPU reduction

The plane stays VMEM-resident across all point blocks (grid iterates points
fastest), so HBM traffic is one plane read + the sampled outputs — the
intermediate T (the killer in an XLA einsum formulation: ~6 GB in HBM) never
leaves VMEM.

Out-of-bounds handling matches grid_sample(padding='zeros',
align_corners=False): taps outside the plane match no iota row and
contribute exactly 0. The in-bounds bilinear weight-sum (needed to
rematerialize denormalized samples as σ·s + μ·wsum, see
models/triplane.py) is the separable product rowsum(Ry)·rowsum(Rx) — free.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_BLOCK_P = 4096  # points DMA'd per grid cell
DEFAULT_TILE_P = 256    # points per inner MXU tile


def _sample_kernel(y0_ref, x0_ref, wy_ref, wx_ref, plane_ref, out_ref, wsum_ref, *,
                   H: int, W: int, C: int, tile_p: int, compute_dtype):
    """One (plane, point-block) grid cell; inner fori_loop over MXU tiles.

    Large blocks with an inner tile loop amortize the per-invocation cost
    (~10 µs each — a 2304-cell grid costs ~25 ms in overhead alone).

    y0/x0: (1, 1, P) int32 floor indices; wy/wx: (1, 1, P) f32 fractional
    weights (weight of the +1 tap); plane: (1, H, C·W); out: (1, P, C);
    wsum: (1, 1, P)."""
    P = y0_ref.shape[2]
    plane = plane_ref[0]  # (H, C·W), already compute_dtype (cast by caller)

    def tile(k, _):
        sl = pl.ds(k * tile_p, tile_p)
        y0 = y0_ref[0, 0, sl]
        x0 = x0_ref[0, 0, sl]
        wy1 = wy_ref[0, 0, sl]
        wx1 = wx_ref[0, 0, sl]

        def onehot2(i0, w1, size):
            # (tile_p, size): (1-w1) at i0, w1 at i0+1; OOB taps match no
            # iota row and vanish — exactly grid_sample zeros padding.
            iota = lax.broadcasted_iota(jnp.int32, (tile_p, size), 1)
            i0 = i0[:, None]
            w1 = w1[:, None]
            m0 = (iota == i0).astype(jnp.float32)
            m1 = (iota == i0 + 1).astype(jnp.float32)
            return m0 * (1.0 - w1) + m1 * w1

        ry = onehot2(y0, wy1, H)  # (tile_p, H) f32
        rx = onehot2(x0, wx1, W)  # (tile_p, W) f32

        # In-bounds bilinear weight mass (separable).
        wsum_ref[0, 0, sl] = jnp.sum(ry, axis=1) * jnp.sum(rx, axis=1)

        # Plane is laid out (H, C·W) so the post-matmul reshape splits the
        # minor axis into (C, W) with W lane-aligned (Mosaic rejects a
        # (W, C) split because C=32 < the 128-lane tile).
        t = jnp.dot(ry.astype(compute_dtype), plane,
                    preferred_element_type=jnp.float32)  # (tile_p, C·W)
        t = t.reshape(tile_p, C, W)
        out_ref[0, sl, :] = jnp.sum(t * rx[:, None, :], axis=2)  # (tile_p, C)
        return _

    lax.fori_loop(0, P // tile_p, tile, None)


@functools.partial(jax.jit, static_argnames=("block_p", "tile_p", "compute_dtype", "interpret"))
def triplane_sample(planes_hwc: jax.Array, coords: jax.Array, *,
                    box_warp: float = 1.0,
                    block_p: int = DEFAULT_BLOCK_P,
                    tile_p: int = DEFAULT_TILE_P,
                    compute_dtype=jnp.bfloat16,
                    interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Bilinearly sample the three EG3D planes at 3-D points.

    Args:
      planes_hwc: (NP, H, W, C) plane features, NP = N·3 stacked plane sets
        (the three planes of each batch sample, HWC layout).
      coords: (N, M, 3) xyz sample points in world units (box_warp scaling
        applied here, ref renderer.py:61).

    Returns:
      samples: (NP, M, C) float32 — per-plane bilinear samples;
      wsum:    (NP, M)  float32 — in-bounds bilinear weight mass per sample
               (1 inside, →0 outside; for μ/σ denormalization remat).
    """
    NP, H, W, C = planes_hwc.shape
    N, M, _ = coords.shape
    n_planes = NP // N
    assert n_planes * N == NP
    tile_p = min(tile_p, block_p)
    # shrink the block for small point counts, keeping it a tile multiple
    block_p = min(block_p, max(tile_p, -(-M // tile_p) * tile_p))
    block_p = (block_p // tile_p) * tile_p

    # Plane projections (ref renderer.py:23-53 reduces to shuffles):
    # plane0 (x,y), plane1 (x,z), plane2 (z,x); grid_sample convention maps
    # coords[...,0]→x (width) and coords[...,1]→y (height).
    s = (2.0 / box_warp)
    x, y, z = coords[..., 0] * s, coords[..., 1] * s, coords[..., 2] * s
    u = jnp.stack([x, x, z], axis=1).reshape(NP, M)  # width-axis coordinate
    v = jnp.stack([y, z, x], axis=1).reshape(NP, M)  # height-axis coordinate

    # align_corners=False unnormalization (ref grid_sample semantics).
    fu = (u + 1.0) * (W * 0.5) - 0.5
    fv = (v + 1.0) * (H * 0.5) - 0.5
    x0 = jnp.floor(fu)
    y0 = jnp.floor(fv)
    wx = (fu - x0).astype(jnp.float32)
    wy = (fv - y0).astype(jnp.float32)
    # Clamp floor indices into a representable range so iota comparison (not
    # the clamp) decides in-bounds-ness: shift fully-OOB taps to -2/size.
    x0 = jnp.clip(x0, -2, W + 1).astype(jnp.int32)
    y0 = jnp.clip(y0, -2, H + 1).astype(jnp.int32)

    # Pad points to a block multiple.
    n_blocks = -(-M // block_p)
    Mp = n_blocks * block_p
    pad = Mp - M

    def pad_pts(a):
        # (NP, 1, Mp) layout: keeps Pallas block tiling legal (the minor two
        # dims of each block are (1, block_p)).
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=-2)[:, None, :]

    y0p, x0p = pad_pts(y0), pad_pts(x0)
    wyp, wxp = pad_pts(wy), pad_pts(wx)

    kernel = functools.partial(_sample_kernel, H=H, W=W, C=C, tile_p=tile_p,
                               compute_dtype=compute_dtype)
    grid = (NP, n_blocks)
    pt_spec = pl.BlockSpec((1, 1, block_p), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    samples, wsum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pt_spec, pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, H, C * W), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_p, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pt_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, Mp, C), jnp.float32),
            jax.ShapeDtypeStruct((NP, 1, Mp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MiB VMEM; the default 16 MiB scoped limit rejects
            # the (tile_p, C·W) f32 intermediate + resident plane.
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(y0p, x0p, wyp, wxp,
      # cast ONCE here — an in-kernel cast would re-convert the whole plane
      # on every grid cell (~8 MB × n_blocks of VPU work)
      planes_hwc.transpose(0, 1, 3, 2).reshape(NP, H, C * W).astype(compute_dtype))

    return samples[:, :M], wsum[:, 0, :M]


def sample_from_planes_fused(plane_features: jax.Array, coordinates: jax.Array,
                             box_warp: float, **kw) -> jax.Array:
    """Drop-in for render.renderer.sample_from_planes using the Pallas
    kernel: (N, 3, C, H, W) + (N, M, 3) → (N, 3, M, C)."""
    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    hwc = plane_features.reshape(N * n_planes, C, H, W).transpose(0, 2, 3, 1)
    samples, _ = triplane_sample(hwc, coordinates, box_warp=box_warp, **kw)
    return samples.reshape(N, n_planes, M, C)
