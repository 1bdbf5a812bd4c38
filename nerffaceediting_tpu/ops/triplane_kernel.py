"""Fused Pallas tri-plane sampling kernel — the signature kernel of this
framework (SURVEY §7 "hard parts").

Replaces the grid_sample gathers of the render hot path
(ref renderer.py:55-65 → F.grid_sample): XLA's TPU gather lowering runs the
4-tap × 3-plane × 32-channel lookup at <1% of HBM bandwidth (~28 ms per
196k-point pass, measured). This kernel reformulates bilinear sampling as a
**double one-hot contraction**, transposed so every intermediate keeps a
lane-aligned minor axis:

    t[(c,x), p] = Σ_y planeᵀ[(c,x), y] · RyT[y, p]     (MXU matmul)
    out[c, p]   = Σ_x t[(c,x), p] · RxT[x, p]          (VPU reduce)

RyT/RxT are the 2-tap bilinear one-hot matrices, built in-kernel by iota
comparison (never materialized in HBM). Design notes from measurement:

* transposed layout: the (C·W, P) → (C, W, P) view splits the SUBLANE dim
  (layout-preserving); the straight (P, C·W) → (P, C, W) split retiles the
  lane dim and costs a full VMEM relayout (~2× slower end to end);
* the plane is pre-cast to the compute dtype OUTSIDE the kernel (an
  in-kernel cast reconverts 8 MB per grid cell);
* large point blocks with an inner tile loop amortize per-invocation cost;
* the plane block index is constant across point blocks, so it stays
  VMEM-resident for the whole sweep.

Differentiation: a custom VJP with a mirrored backward Pallas kernel — the
plane gradient is the transposed contraction accumulated across point
blocks (d_planeᵀ += (g ⊗ RxT) @ Ry, the exact adjoint of the forward, same
cost). Coordinate gradients are defined as ZERO: no supported workload
differentiates through sample positions (ray geometry has no parameters,
importance depths are stop-gradient'ed — ref renderer.py:198; the torch
grid_sample coord-grad exists but is unused by the reference's losses).

Out-of-bounds handling matches grid_sample(padding='zeros',
align_corners=False): OOB taps match no iota row and contribute exactly 0.
The in-bounds bilinear weight mass (for the σ/μ denormalization remat, see
models/triplane.py) is the separable product of per-axis tap masses.
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


def _onehot2_t(i0, w1, size, tile_p, dt):
    """Transposed 2-tap one-hot (size, tile_p): (1-w1) at row i0, w1 at
    row i0+1; OOB taps match no row — grid_sample zeros padding."""
    iota = lax.broadcasted_iota(jnp.int32, (size, tile_p), 0)
    m0 = (iota == i0[None, :]).astype(dt)
    m1 = (iota == i0[None, :] + 1).astype(dt)
    return m0 * (1.0 - w1[None, :]).astype(dt) + m1 * w1[None, :].astype(dt)


def _sample_kernel(y0_ref, x0_ref, wy_ref, wx_ref, plane_ref, out_ref, wsum_ref, *,
                   H: int, W: int, C: int, tile_p: int, compute_dtype):
    """Forward: one (plane, point-block) grid cell; inner MXU tile loop.

    y0/x0: (1, 1, P) f32 floor indices; wy/wx: (1, 1, P) f32 +1-tap weights;
    plane: (1, C·W, H) [transposed, row (c·W+x), col y]; out: (1, C, P);
    wsum: (1, 1, P)."""
    P = y0_ref.shape[2]
    plane = plane_ref[0]  # (C·W, H), already compute_dtype

    def tile(k, _):
        sl = pl.ds(k * tile_p, tile_p)
        y0 = y0_ref[0, 0, sl].astype(jnp.int32)
        x0 = x0_ref[0, 0, sl].astype(jnp.int32)
        wy1 = wy_ref[0, 0, sl]
        wx1 = wx_ref[0, 0, sl]

        ry_t = _onehot2_t(y0, wy1, H, tile_p, compute_dtype)   # (H, tile_p)
        rx_t = _onehot2_t(x0, wx1, W, tile_p, jnp.float32)     # (W, tile_p)

        # In-bounds bilinear weight mass (separable per axis).
        ry_mass = ((1.0 - wy1) * ((y0 >= 0) & (y0 < H))
                   + wy1 * ((y0 + 1 >= 0) & (y0 + 1 < H)))
        rx_mass = ((1.0 - wx1) * ((x0 >= 0) & (x0 < W))
                   + wx1 * ((x0 + 1 >= 0) & (x0 + 1 < W)))
        wsum_ref[0, 0, sl] = ry_mass * rx_mass

        t = jnp.dot(plane, ry_t, preferred_element_type=jnp.float32)  # (C·W, tile_p)
        t3 = t.reshape(C, W, tile_p)  # sublane-dim split: layout-preserving
        out_ref[0, :, sl] = jnp.sum(t3 * rx_t[None], axis=1)  # (C, tile_p)
        return _

    lax.fori_loop(0, P // tile_p, tile, None)


def _grad_kernel(y0_ref, x0_ref, wy_ref, wx_ref, g_ref, dplane_ref, *,
                 H: int, W: int, C: int, tile_p: int, compute_dtype):
    """Backward: accumulate d_planeᵀ[(c,x), y] += Σ_p g[c,p]·RxT[x,p]·Ry[p,y]
    over this point block (the output block index is constant across point
    blocks, so accumulation stays VMEM-resident)."""
    P = y0_ref.shape[2]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dplane_ref[0] = jnp.zeros_like(dplane_ref[0])

    def tile(k, _):
        sl = pl.ds(k * tile_p, tile_p)
        y0 = y0_ref[0, 0, sl].astype(jnp.int32)
        x0 = x0_ref[0, 0, sl].astype(jnp.int32)
        wy1 = wy_ref[0, 0, sl]
        wx1 = wx_ref[0, 0, sl]

        ry = _onehot2_t(y0, wy1, H, tile_p, compute_dtype).T   # (tile_p, H)
        rx_t = _onehot2_t(x0, wx1, W, tile_p, jnp.float32)     # (W, tile_p)
        g = g_ref[0, :, sl]                                    # (C, tile_p)
        g2 = (g[:, None, :] * rx_t[None]).reshape(C * W, tile_p)
        dplane_ref[0] += jnp.dot(g2.astype(compute_dtype), ry,
                                 preferred_element_type=jnp.float32)
        return _

    lax.fori_loop(0, P // tile_p, tile, None)


def _grid_setup(M: int, block_p: int, tile_p: int):
    tile_p = min(tile_p, block_p)
    block_p = min(block_p, max(tile_p, -(-M // tile_p) * tile_p))
    block_p = (block_p // tile_p) * tile_p
    n_blocks = -(-M // block_p)
    return block_p, tile_p, n_blocks


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sample_core(statics, plane_t, y0, x0, wy, wx):
    return _sample_fwd_impl(statics, plane_t, y0, x0, wy, wx)


def _sample_fwd_impl(statics, plane_t, y0, x0, wy, wx):
    NP, H, W, C, Mp, block_p, tile_p, cdt_name, interpret = statics
    compute_dtype = jnp.dtype(cdt_name)
    n_blocks = Mp // block_p
    kernel = functools.partial(_sample_kernel, H=H, W=W, C=C, tile_p=tile_p,
                               compute_dtype=compute_dtype)
    pt_spec = pl.BlockSpec((1, 1, block_p), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(NP, n_blocks),
        in_specs=[
            pt_spec, pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, C * W, H), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, block_p), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pt_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, C, Mp), jnp.float32),
            jax.ShapeDtypeStruct((NP, 1, Mp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MiB VMEM; the default 16 MiB scoped limit rejects
            # the (C·W, tile_p) f32 intermediate + resident plane.
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(y0, x0, wy, wx, plane_t)


def _sample_fwd(statics, plane_t, y0, x0, wy, wx):
    out = _sample_fwd_impl(statics, plane_t, y0, x0, wy, wx)
    return out, (y0, x0, wy, wx)


def _sample_bwd(statics, residuals, cotangents):
    NP, H, W, C, Mp, block_p, tile_p, cdt_name, interpret = statics
    compute_dtype = jnp.dtype(cdt_name)
    y0, x0, wy, wx = residuals
    g_samples, _g_wsum = cotangents  # wsum depends only on coords → no plane grad
    n_blocks = Mp // block_p
    kernel = functools.partial(_grad_kernel, H=H, W=W, C=C, tile_p=tile_p,
                               compute_dtype=compute_dtype)
    pt_spec = pl.BlockSpec((1, 1, block_p), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    d_plane_t = pl.pallas_call(
        kernel,
        grid=(NP, n_blocks),
        in_specs=[
            pt_spec, pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, C, block_p), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C * W, H), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, C * W, H), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(y0, x0, wy, wx, g_samples)
    # Coordinate gradients are intentionally zero (see module docstring).
    zeros = lambda a: jnp.zeros_like(a)
    return (d_plane_t.astype(compute_dtype), zeros(y0), zeros(x0),
            zeros(wy), zeros(wx))


_sample_core.defvjp(_sample_fwd, _sample_bwd)


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

    Differentiable w.r.t. planes (custom backward kernel); coordinate
    gradients are zero by design.
    """
    NP, H, W, C = planes_hwc.shape
    N, M, _ = coords.shape
    n_planes = NP // N
    assert n_planes * N == NP
    block_p, tile_p, n_blocks = _grid_setup(M, block_p, tile_p)
    Mp = n_blocks * block_p

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
    # Indices travel as f32 (exact up to 2^24) so the custom-VJP boundary has
    # all-float primals.
    x0 = jnp.clip(x0, -2, W + 1)
    y0 = jnp.clip(y0, -2, H + 1)

    pad = Mp - M

    def pad_pts(a):
        # (NP, 1, Mp) layout keeps Pallas block tiling legal (the minor two
        # dims of each block are (1, block_p)).
        return lax.stop_gradient(
            jnp.pad(a, ((0, 0), (0, pad)), constant_values=-2)[:, None, :])

    statics = (NP, H, W, C, Mp, block_p, tile_p,
               jnp.dtype(compute_dtype).name, interpret)
    # plane → transposed (C·W, H) layout, cast ONCE here (an in-kernel cast
    # would reconvert the whole plane on every grid cell)
    plane_t = planes_hwc.transpose(0, 3, 2, 1).reshape(NP, C * W, H).astype(compute_dtype)
    samples_t, wsum = _sample_core(
        statics, plane_t, pad_pts(y0), pad_pts(x0), pad_pts(wy), pad_pts(wx))

    # (NP, C, Mp) → (NP, M, C)
    return samples_t[:, :, :M].transpose(0, 2, 1), wsum[:, 0, :M]


def sample_from_planes_fused(plane_features: jax.Array, coordinates: jax.Array,
                             box_warp: float, **kw) -> jax.Array:
    """Drop-in for render.renderer.sample_from_planes using the Pallas
    kernel: (N, 3, C, H, W) + (N, M, 3) → (N, 3, M, C)."""
    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    hwc = plane_features.reshape(N * n_planes, C, H, W).transpose(0, 2, 3, 1)
    samples, _ = triplane_sample(hwc, coordinates, box_warp=box_warp, **kw)
    return samples.reshape(N, n_planes, M, C)
