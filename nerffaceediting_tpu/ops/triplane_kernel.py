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
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_BLOCK_P = 4096  # points DMA'd per grid cell (full-plane path)
# Points per inner MXU tile. NFE_TILE_P overrides for hardware A/B (must
# equal prod(NFE_PATCH) for render workloads; larger tiles deepen the
# matmul N dim but widen the per-tile window footprint — the span
# predicate NaN-poisons/falls back if a geometry stops fitting).
DEFAULT_TILE_P = int(os.environ.get("NFE_TILE_P", "256"))

# Windowed fast path: points are regrouped into spatially-coherent tiles
# (8×8 ray patch × 4 depth samples for render workloads, consecutive runs
# otherwise); each tile contracts only a WX×WY plane window instead of the
# full 256² plane, cutting the dead one-hot FLOPs ~8×. Windows are
# materialized once per call as an overlapping-block canvas (x stride 16,
# y stride 64) so the kernel consumes them through ordinary BlockSpec
# streaming (Mosaic pipelines the copies and skips re-fetches when adjacent
# tiles share a window) — no manual DMA, no dynamic-offset alignment proofs.
# A traced max-span predicate falls back to the full-plane kernel (lax.cond)
# whenever any tile's footprint exceeds the window — the fast path is an
# optimization, never a semantics change.
# Window geometry note (measured, r2): shrinking windows/strides (56/8,
# 96/32) cuts one-hot FLOPs 34% but INCREASES canvas-block switching and
# runs ~1.3-1.5x SLOWER — the STREAMING kernel is DMA/pipeline-bound, not
# FLOP-bound; 64/16 + 128/64 is its measured optimum. The RESIDENT-canvas
# variants remove the per-tile DMA, so smaller windows may pay there —
# NFE_WIN_GEOM="WX,SX,WY,SY" overrides for hardware A/B (canvas size scales
# with (WX/SX)·(WY/SY); keep WY a lane multiple of 128 for layout, or pad).
# Defaults = the r4 window sweep winner (runs/hw_r4/wingeom_verify.log,
# W4: 89.8 fps vs 86.8 at 56/16; W2 48/8+128/64 ties at 89.6): 48/8
# x-windows + 64/24 y-windows. The r2 "smaller windows lose" rule flipped
# once the pull-back merge + bf16 SR made the program less DMA-bound.
# Span headroom: max span 33 at the bench orbit (scripts/measure_spans.py)
# vs limit win-2 = 46/62; 40/8 violates the predicate (w3.err NaN-poison,
# the designed loud failure), so 48 is the floor for frontal orbits.
_WX, _SX = 48, 8        # x-window edge / stride (plane W axis, MXU rows)
_WY, _SY = 64, 24       # y-window edge / stride (plane H axis, MXU K dim)
if os.environ.get("NFE_WIN_GEOM"):
    _WX, _SX, _WY, _SY = (int(v) for v in
                          os.environ["NFE_WIN_GEOM"].split(","))
_PADL = 8               # left zero-margin of every window
# (ray-rows, ray-cols, depth) per tile; the product must equal tile_p (256).
# NFE_PATCH overrides for hardware A/B — e.g. "8,4,8" trades pixel footprint
# for depth run length (pairs with NFE_TILE_ORDER=patch). The window-span
# predicate NaN-poisons (serving) or falls back (training) if a shape's
# footprint outgrows the windows, so alternates are correctness-safe.
_PATCH = tuple(int(v) for v in
               os.environ.get("NFE_PATCH", "8,8,4").split(","))

# Resident-canvas windowed variant (see _windowed_call): opt-in via env until
# measured faster on hardware; _RESIDENT_FORCE lets tests exercise it in
# interpret mode regardless of the env switch.
_RESIDENT_CANVAS = os.environ.get("NFE_RESIDENT_CANVAS", "0") == "1"
_RESIDENT_FORCE = False

# Sorted-grid serving variant (see triplane_sample_decode): tiles sweep in
# canvas-block order per plane, so every canvas block is DMA'd at most once
# per pass instead of up to once per tile — the lever against the streaming
# kernel's ~40% MXU DMA plateau (docs/PERF.md r2). _SORTED_FORCE lets tests
# exercise it in interpret mode regardless of the env switch.
# CAVEAT (r4, runs/hw_r4/benchN.err): the dynamic scalar-prefetched OUTPUT
# index map hangs the current libtpu's pipeline emitter (>15 min compile,
# killed); keep opt-in until a libtpu where it compiles.
_SORTED_KERNEL = os.environ.get("NFE_SORTED_KERNEL", "0") == "1"
_SORTED_FORCE = False

# In-kernel point math (NFE_INKERNEL_PTS, default ON): feed the fused
# serving kernel the raw box-warp-scaled xyz tile and derive the per-plane
# projection, floor/frac, bounds masses and window-relative coords INSIDE
# the kernel body (VPU work that overlaps the canvas DMA the streaming
# kernel waits on) instead of precomputing the (3, 5, Mt) pts rows with
# ~20 small HLO ops outside (~1.1 ms/frame of eval traffic at the serving
# config, runs/hw_r4/profile_w4.log). Outside keeps only the tile permute
# and a per-tile min/max reduce (floor/clip are monotone, so the window
# index derived from the tile minimum is bit-identical to the per-point
# derivation). Measured on-chip: 92.7 vs 89.9 fps at the shipping config
# (runs/hw_r4/ab5.log K1) — promoted to default.
# _INKERNEL_FORCE lets tests exercise it in interpret mode.
_INKERNEL_PTS = os.environ.get("NFE_INKERNEL_PTS", "1") == "1"
_INKERNEL_FORCE = False

# Tile sweep order for the windowed kernels (NFE_TILE_ORDER):
#   "depth" — depth-group outermost: consecutive tiles are neighboring
#             pixel patches at the same depth (r2 default; r4 sweep7
#             measured "patch" +0.3 fps on top of the window shrink,
#             so patch is the default from r4);
#   "patch" — pixel-patch outermost: consecutive tiles are the SAME patch
#             at advancing depth. FFHQ rays are mostly z-directed, so the
#             (x, y) plane-0 window is nearly constant along a patch's
#             depth sweep — Mosaic's revisit-skip then fetches plane 0's
#             canvas block ~once per patch instead of ~once per tile
#             (estimated ~40% fewer canvas fetches overall; static order,
#             zero compile risk — unlike the sorted variant above).
_TILE_ORDER = os.environ.get("NFE_TILE_ORDER", "patch")


# --- parked-kernel gate -----------------------------------------------------
# The opt-in variants below are PARKED: each has a reproducible compile
# failure on a specific libtpu build (empirical — there is no feature flag to
# probe, so the gate fingerprints the build stamp in platform_version).
# When a flag is enabled on a known-bad build the gate raises loudly instead
# of hanging the compiler for 15-20 minutes or SIGABRTing mid-run.
# `scripts/revalidate_parked_kernels.sh` re-probes all of them with bounded
# compile-only runs after a toolchain update; NFE_PARKED_OK=1 overrides.
_PARKED_BAD = {
    "NFE_SORTED_KERNEL": {
        "cl/831091709": "dynamic scalar-prefetched index maps hang the "
                        "pipeline emitter >15 min (runs/hw_r4/benchN.err)"},
    "NFE_RESIDENT_CANVAS": {
        "cl/831091709": "96 MB VMEM canvas operand SIGABRTs the windowing "
                        "proof (runs/hw_r4/ab_resident.err)"},
    "NFE_TILED_COMPOSITE=1": {
        "cl/831091709": "the XLA tiled contraction compile-hangs >20 min at "
                        "f128 (runs/hw_r4/ab4.log T1); use "
                        "NFE_TILED_COMPOSITE=2 (static Pallas kernel)"},
}


def _parked_gate(flag: str, interpret: bool = False) -> None:
    if interpret or os.environ.get("NFE_PARKED_OK", "0") == "1":
        return
    try:
        from jax._src import xla_bridge
        backend = xla_bridge.get_backend()
        if backend.platform not in ("tpu",):
            return
        ver = getattr(backend, "platform_version", "") or ""
    except Exception:
        return
    for build, why in _PARKED_BAD.get(flag, {}).items():
        if build in ver:
            raise RuntimeError(
                f"{flag} is parked on this libtpu build ({build}): {why}. "
                "After a toolchain update run "
                "scripts/revalidate_parked_kernels.sh to re-probe (it prints "
                "the build id to clear from _PARKED_BAD), or set "
                "NFE_PARKED_OK=1 to force.")


def _onehot2_t(i0, w1, size, tile_p, dt):
    """Transposed 2-tap one-hot (size, tile_p): (1-w1) at row i0, w1 at
    row i0+1; OOB taps match no row — grid_sample zeros padding."""
    iota = lax.broadcasted_iota(jnp.int32, (size, tile_p), 0)
    m0 = (iota == i0[None, :]).astype(dt)
    m1 = (iota == i0[None, :] + 1).astype(dt)
    return m0 * (1.0 - w1[None, :]).astype(dt) + m1 * w1[None, :].astype(dt)


def _sample_kernel(y0_ref, x0_ref, wy_ref, wx_ref, plane_ref, out_ref, *,
                   H: int, W: int, C: int, tile_p: int, compute_dtype):
    """Full-plane forward: one (plane, point-block) grid cell; inner MXU tile
    loop. The correctness fallback for point sets with no spatial coherence.

    y0/x0: (1, 1, P) f32 floor indices; wy/wx: (1, 1, P) f32 +1-tap weights;
    plane: (1, C·W, H) [transposed, row (c·W+x), col y]; out: (1, C, P)."""
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

        t = jnp.dot(plane, ry_t, preferred_element_type=jnp.float32)  # (C·W, tile_p)
        t3 = t.reshape(C, W, tile_p)  # sublane-dim split: layout-preserving
        out_ref[0, :, sl] = jnp.sum(t3 * rx_t[None], axis=1)  # (C, tile_p)
        return _

    lax.fori_loop(0, P // tile_p, tile, None)


def _win_body(w2, pts_ref, out_ref, C: int, tile_p: int, compute_dtype):
    """Shared windowed-forward body: sample one point tile against the
    (C·WX, WY) window w2."""
    WX = w2.shape[0] // C
    WY = w2.shape[1]

    rel_y = pts_ref[0, 0, :]
    rel_x = pts_ref[0, 1, :]
    wy1 = pts_ref[0, 2, :]
    wx1 = pts_ref[0, 3, :]

    ry_t = _onehot2_t(rel_y.astype(jnp.int32), wy1, WY, tile_p, compute_dtype)
    rx_t = _onehot2_t(rel_x.astype(jnp.int32), wx1, WX, tile_p, jnp.float32)

    t = jnp.dot(w2, ry_t, preferred_element_type=jnp.float32)  # (C·WX, tile_p)
    out_ref[0] = jnp.sum(t.reshape(C, WX, tile_p) * rx_t[None], axis=1)


def _win_kernel(bidx_ref, pts_ref, canvas_ref, out_ref, *,
                C: int, tile_p: int, compute_dtype):
    """Windowed forward: one point tile against its plane-window block.

    bidx: (NP, nt) int32 per-tile canvas block index (scalar-prefetched —
    Pallas streams the matching canvas block per tile and skips the copy when
    consecutive tiles share a window);
    pts: (1, 4, tile_p) f32 rows [rel_y, rel_x, wy, wx] (window-relative
    floor coords, precomputed outside);
    canvas: (1, 1, C·WX, WY) compute_dtype window block;
    out: (1, C, tile_p) f32.
    """
    _win_body(canvas_ref[0, 0], pts_ref, out_ref, C, tile_p, compute_dtype)


def _win_kernel_resident(bidx_ref, pts_ref, canvas_ref, out_ref, *,
                         C: int, tile_p: int, compute_dtype):
    """Resident-canvas windowed forward: the WHOLE per-plane canvas
    (nb, C·WX, WY) lives in VMEM (one HBM→VMEM copy per plane, reused by
    every point tile) and the tile's window is selected by a dynamic VMEM
    index — replacing the per-tile 512 KB canvas-block DMA that makes the
    streaming variant DMA-bound (~40% MXU, docs/PERF.md r2). 32 MB per
    plane at the serving geometry (64 blocks × C·64×128 bf16) fits v5e's
    128 MB VMEM with double buffering."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = bidx_ref[i, j]
    w2 = canvas_ref[0, b]                 # dynamic block select, VMEM view
    _win_body(w2, pts_ref, out_ref, C, tile_p, compute_dtype)


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


# ---------------------------------------------------------------------------
# Tile regrouping (windowed fast path)

def _tile_perm(a: jax.Array, ray_shape: Optional[Tuple[int, int, int]],
               tile_p: int) -> jax.Array:
    """(NP, M) → (NP, Mt) regrouped so each run of `tile_p` points is
    spatially coherent. Render workloads (ray-major (rh·rw, S) points) use
    8×8-pixel × 4-depth patches; anything else keeps consecutive runs
    (edge-padded to a tile multiple) — e.g. the z-major shape grids of
    `G.sample`, which are coherent already."""
    NP, M = a.shape
    if ray_shape is not None:
        rh, rw, S = ray_shape
        ph, pw, pd = _PATCH
        a = a.reshape(NP, rh // ph, ph, rw // pw, pw, S // pd, pd)
        if _TILE_ORDER == "patch":
            # pixel-patch OUTERMOST: consecutive tiles march the same patch
            # through depth — plane 0's window is near-constant per patch
            # (see _TILE_ORDER note above).
            a = a.transpose(0, 1, 3, 5, 2, 4, 6)
        else:
            # depth-group OUTERMOST: consecutive tiles are neighboring pixel
            # patches at the same depth, whose plane windows mostly coincide
            # — Pallas then skips the canvas-block copy between them.
            a = a.transpose(0, 5, 1, 3, 2, 4, 6)
        return a.reshape(NP, M)
    pad = (-M) % tile_p
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad)), mode="edge")
    return a


def _untile_perm(out: jax.Array, M: int,
                 ray_shape: Optional[Tuple[int, int, int]]) -> jax.Array:
    """(NP, C, Mt) kernel output → (NP, M, C) in original point order.

    Two-step: a dense channel-minor transpose first, then the patch
    un-grouping as a row-granular permutation with the C axis intact —
    measured ~2× faster than the fused single transpose (whose minor dim
    would be assembled from 16-byte chunks)."""
    NP, C, Mt = out.shape
    o = out.transpose(0, 2, 1)  # (NP, Mt, C), dense relayout
    if ray_shape is not None:
        rh, rw, S = ray_shape
        ph, pw, pd = _PATCH
        o = lax.optimization_barrier(o)  # keep XLA from re-fusing the steps
        if _TILE_ORDER == "patch":
            o = o.reshape(NP, rh // ph, rw // pw, S // pd, ph, pw, pd, C)
            o = o.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        else:
            o = o.reshape(NP, S // pd, rh // ph, rw // pw, ph, pw, pd, C)
            o = o.transpose(0, 2, 4, 3, 5, 1, 6, 7)  # (NP, rh/ph, ph, rw/pw, pw, S/pd, pd, C)
        return o.reshape(NP, M, C)
    return o[:, :M]


def _canvas_geom(H: int, W: int) -> Tuple[int, int]:
    """Number of (x, y) window blocks for a H×W plane. Window starts sit at
    (bx·_SX − _PADL, by·_SY − _PADL); the rightmost block always reaches past
    the last legal tap index (size+1).

    Coverage: the last window must reach tap index size+2 (clipped floors go
    to size+1, +1 tap beyond), i.e. (nb−1)·stride − _PADL + win > size+2.
    size//stride blocks guarantee that only while win ≥ 2·stride-ish; the
    r4 `NFE_WIN_GEOM` hedges with stride == win undershot it and produced a
    negative canvas pad (runs/hw_r4/benchG.err) — take the max of both so
    the default geometry (and every committed canvas layout) is unchanged."""
    def nb(size, stride, win):
        cover = -(-(size + _PADL + 3 - win) // stride) + 1
        return max(1, size // stride, cover)

    return nb(W, _SX, _WX), nb(H, _SY, _WY)


def _build_canvas(plane_cwh: jax.Array, nbx: int, nby: int) -> jax.Array:
    """(NP, C, W, H) → (NP, nbx·nby, C·_WX, _WY) overlapping window blocks
    (zero-padded outside the plane — grid_sample zeros semantics)."""
    NP, C, W, H = plane_cwh.shape
    cw = (nbx - 1) * _SX + _WX
    ch = (nby - 1) * _SY + _WY
    p = jnp.pad(plane_cwh, ((0, 0), (0, 0),
                            (_PADL, cw - W - _PADL), (_PADL, ch - H - _PADL)))
    xs = jnp.stack([p[:, :, i * _SX:i * _SX + _WX] for i in range(nbx)], 1)
    xy = jnp.stack([xs[..., j * _SY:j * _SY + _WY] for j in range(nby)], 2)
    return xy.reshape(NP, nbx * nby, C * _WX, _WY)


def build_plane_canvas(planes_hwc: jax.Array,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """Precompute the overlapping-window canvas for `triplane_sample`.

    The canvas depends ONLY on the planes — one build serves both render
    passes and (for fixed-identity serving, e.g. editing orbits) every
    frame. Profiling shows the in-call build costs ~1 GB of pad/copy HBM
    traffic per frame; pass the result as `triplane_sample(..., canvas=)`
    to amortize it. (NP, H, W, C) → (NP, nbx·nby, C·_WX, _WY)."""
    NP, H, W, C = planes_hwc.shape
    plane_cwh = planes_hwc.transpose(0, 3, 2, 1).astype(compute_dtype)
    nbx, nby = _canvas_geom(H, W)
    return _build_canvas(plane_cwh, nbx, nby)


def _ray_shape_usable(M: int, ray_shape) -> bool:
    if ray_shape is None:
        return False
    rh, rw, S = ray_shape
    ph, pw, pd = _PATCH
    return (rh * rw * S == M and rh % ph == 0 and rw % pw == 0 and S % pd == 0)


# ---------------------------------------------------------------------------
# Core (custom VJP): padded plane canvas + absolute floor coords → samples

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sample_core(statics, plane_cwh, y0, x0, wy, wx, xyz_t, canvas):
    return _sample_fwd_impl(statics, plane_cwh, y0, x0, wy, wx, xyz_t, canvas)


def _full_plane_call(statics, plane_cwh, y0, x0, wy, wx):
    """Correctness fallback: full-plane one-hot contraction (original point
    order). plane_cwh (NP, C, W, H) reshaped to (NP, C·W, H)."""
    NP, H, W, C, M, _ray_shape, tile_p, block_p, cdt_name, interpret, _coh = statics
    compute_dtype = jnp.dtype(cdt_name)
    plane_t = plane_cwh.reshape(NP, C * W, H)

    block_p_, tile_p_, n_blocks = _grid_setup(M, block_p, tile_p)
    Mp = n_blocks * block_p_

    def pad_pts(a):
        return lax.stop_gradient(
            jnp.pad(a, ((0, 0), (0, Mp - M)), constant_values=-2)[:, None, :])

    kernel = functools.partial(_sample_kernel, H=H, W=W, C=C, tile_p=tile_p_,
                               compute_dtype=compute_dtype)
    pt_spec = pl.BlockSpec((1, 1, block_p_), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(NP, n_blocks),
        in_specs=[
            pt_spec, pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, C * W, H), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, block_p_), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, C, Mp), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MiB VMEM; the default 16 MiB scoped limit rejects
            # the (C·W, tile_p) f32 intermediate + resident plane.
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(pad_pts(y0), pad_pts(x0), pad_pts(wy), pad_pts(wx), plane_t)
    return out[:, :, :M].transpose(0, 2, 1)  # (NP, M, C)


def _windowed_call(statics, canvas, pts, bidx):
    """Fast path: pts (NP, 4, Mt) tile-regrouped window-relative coords,
    bidx (NP, nt) int32 canvas block per tile, canvas
    (NP, nb, C·_WX, _WY).

    Two variants (NFE_RESIDENT_CANVAS=1 selects the second):
    streaming — Pallas DMAs the tile's 512 KB canvas block per tile (skipped
    when consecutive tiles share a window); resident — the whole per-plane
    canvas is copied into VMEM once per plane and windows are selected by a
    dynamic VMEM index inside the kernel (zero per-tile canvas DMA)."""
    NP, H, W, C, M, ray_shape, tile_p, block_p, cdt_name, interpret, _coh = statics
    compute_dtype = jnp.dtype(cdt_name)
    Mt = pts.shape[2]
    nt = Mt // tile_p
    nb = canvas.shape[1]
    resident = _RESIDENT_FORCE or _RESIDENT_CANVAS

    if resident:
        _parked_gate("NFE_RESIDENT_CANVAS", interpret=interpret)
        kernel = functools.partial(_win_kernel_resident, C=C, tile_p=tile_p,
                                   compute_dtype=compute_dtype)
        canvas_spec = pl.BlockSpec((1, nb, C * _WX, _WY),
                                   lambda i, j, bidx_ref: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_win_kernel, C=C, tile_p=tile_p,
                                   compute_dtype=compute_dtype)
        canvas_spec = pl.BlockSpec((1, 1, C * _WX, _WY),
                                   lambda i, j, bidx_ref: (i, bidx_ref[i, j], 0, 0),
                                   memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NP, nt),
        in_specs=[
            pl.BlockSpec((1, 4, tile_p), lambda i, j, bidx_ref: (i, 0, j),
                         memory_space=pltpu.VMEM),
            canvas_spec,
        ],
        out_specs=pl.BlockSpec((1, C, tile_p), lambda i, j, bidx_ref: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NP, C, Mt), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(bidx, pts, canvas)


def _sample_fwd_impl(statics, plane_cwh, y0, x0, wy, wx, xyz_t, canvas=None):
    """canvas: optional precomputed window canvas (build_plane_canvas).
    Gradients still flow to plane_cwh — the custom VJP computes d_plane
    directly from coords and the cotangent, independent of how the forward
    fetched plane values, so the canvas is a zero-grad auxiliary."""
    NP, H, W, C, M, ray_shape, tile_p, block_p, cdt_name, interpret, coh_hc = statics
    coherent, has_canvas = coh_hc if isinstance(coh_hc, tuple) else (coh_hc, False)
    if not has_canvas:
        canvas = None
    N = xyz_t.shape[0]

    y0 = lax.stop_gradient(y0)
    x0 = lax.stop_gradient(x0)
    wyg = lax.stop_gradient(wy)
    wxg = lax.stop_gradient(wx)

    # Per-plane tiled coords, derived elementwise from the ONE permuted
    # coords array (xyz_t, already box-warp scaled) — permuting the four
    # (NP, M) index arrays instead costs ~4× the relayout bandwidth.
    xt, yt, zt = xyz_t[:, 0], xyz_t[:, 1], xyz_t[:, 2]  # (N, Mt)
    Mt = xt.shape[1]
    ut = jnp.stack([xt, xt, zt], axis=1).reshape(NP, Mt)
    vt = jnp.stack([yt, zt, xt], axis=1).reshape(NP, Mt)
    fut = (ut + 1.0) * (W * 0.5) - 0.5
    fvt = (vt + 1.0) * (H * 0.5) - 0.5
    x0t = jnp.clip(jnp.floor(fut), -2, W + 1)
    y0t = jnp.clip(jnp.floor(fvt), -2, H + 1)
    wxt = (fut - jnp.floor(fut)).astype(jnp.float32)
    wyt = (fvt - jnp.floor(fvt)).astype(jnp.float32)

    nt = Mt // tile_p
    nbx, nby = _canvas_geom(H, W)

    def window_of(v, stride, nb, win):
        vt = v.reshape(NP, nt, tile_p)
        b = jnp.clip(jnp.floor((jnp.min(vt, axis=-1) + _PADL) / stride),
                     0, nb - 1).astype(jnp.int32)          # (NP, nt)
        ws = (b * stride - _PADL).astype(jnp.float32)
        rel = vt - ws[:, :, None]                           # window-relative
        # both taps (v, v+1) must land inside [ws, ws + win)
        ok = jnp.all(jnp.max(vt, axis=-1) - ws <= win - 2)
        return b, rel.reshape(NP, Mt), ok

    bx, rel_x, ok_x = window_of(x0t, _SX, nbx, _WX)
    by, rel_y, ok_y = window_of(y0t, _SY, nby, _WY)
    bidx = bx * nby + by
    pts = jnp.stack([rel_y, rel_x, wyt, wxt], axis=1)  # (NP, 4, Mt)

    def fast(_):
        cv = canvas if canvas is not None else _build_canvas(plane_cwh, nbx, nby)
        out = _windowed_call(statics, cv, pts, bidx)
        return _untile_perm(out, M, ray_shape)

    def slow(_):
        return _full_plane_call(statics, plane_cwh, y0, x0, wyg, wxg)

    if coherent is True:
        # Static fast path: profiling shows the traced lax.cond costs more
        # than the windowed kernels themselves (cond machinery + both-branch
        # buffer copies, ~3 ms/frame at 196k pts). Loud-fail guard (ADVICE
        # r2): if the pinned workload ever violates the window-span
        # predicate, poison the whole output with NaN — a wrong camera fails
        # visibly instead of silently decoding zero samples. The scalar
        # select fuses into the untile epilogue (no measurable cost).
        return fast(None) + jnp.where(jnp.logical_and(ok_x, ok_y), 0.0,
                                      jnp.nan)
    if coherent is False or ray_shape is None:
        return slow(None)
    return lax.cond(jnp.logical_and(ok_x, ok_y), fast, slow, None)


def _sample_fwd(statics, plane_cwh, y0, x0, wy, wx, xyz_t, canvas):
    out = _sample_fwd_impl(statics, plane_cwh, y0, x0, wy, wx, xyz_t, canvas)
    return out, (y0, x0, wy, wx, xyz_t)


def _sample_bwd(statics, residuals, g_samples):
    NP, H, W, C, M, _ray_shape, tile_p, block_p, cdt_name, interpret, _coh = statics
    compute_dtype = jnp.dtype(cdt_name)
    y0, x0, wy, wx, xyz_t = residuals

    block_p_, tile_p_, n_blocks = _grid_setup(M, block_p, tile_p)
    Mp = n_blocks * block_p_

    def pad_pts(a):
        return lax.stop_gradient(
            jnp.pad(a, ((0, 0), (0, Mp - M)), constant_values=-2)[:, None, :])

    # cotangent (NP, M, C) → (NP, C, Mp); padded tail coords are OOB (-2) so
    # their gradient contribution is exactly zero regardless of g there.
    g = jnp.pad(g_samples.transpose(0, 2, 1), ((0, 0), (0, 0), (0, Mp - M)))

    kernel = functools.partial(_grad_kernel, H=H, W=W, C=C, tile_p=tile_p_,
                               compute_dtype=compute_dtype)
    pt_spec = pl.BlockSpec((1, 1, block_p_), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    d_plane_t = pl.pallas_call(
        kernel,
        grid=(NP, n_blocks),
        in_specs=[
            pt_spec, pt_spec, pt_spec, pt_spec,
            pl.BlockSpec((1, C, block_p_), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C * W, H), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, C * W, H), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(pad_pts(y0), pad_pts(x0), pad_pts(wy), pad_pts(wx), g)
    # Coordinate gradients are intentionally zero (see module docstring);
    # the canvas cotangent is None-equivalent zeros (aux input).
    zeros = lambda a: jnp.zeros_like(a)
    NBX, NBY = _canvas_geom(H, W)
    canvas_zeros = jnp.zeros((NP, NBX * NBY, C * _WX, _WY), compute_dtype)
    return (d_plane_t.reshape(NP, C, W, H).astype(compute_dtype),
            zeros(y0), zeros(x0), zeros(wy), zeros(wx), zeros(xyz_t),
            canvas_zeros)


_sample_core.defvjp(_sample_fwd, _sample_bwd)


@functools.partial(jax.jit, static_argnames=("ray_shape", "block_p",
                                              "tile_p", "compute_dtype",
                                              "interpret", "coherent"))
def triplane_sample(planes_hwc: jax.Array, coords: jax.Array, *,
                    box_warp: float = 1.0,
                    ray_shape: Optional[Tuple[int, int, int]] = None,
                    block_p: int = DEFAULT_BLOCK_P,
                    tile_p: int = DEFAULT_TILE_P,
                    compute_dtype=jnp.bfloat16,
                    interpret: bool = False,
                    coherent: Optional[bool] = None,
                    canvas: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """Bilinearly sample the three EG3D planes at 3-D points.

    Args:
      planes_hwc: (NP, H, W, C) plane features, NP = N·3 stacked plane sets
        (the three planes of each batch sample, HWC layout).
      coords: (N, M, 3) xyz sample points in world units (box_warp scaling
        applied here, ref renderer.py:61).
      ray_shape: optional static (rh, rw, S) declaring that the M points are
        ray-major render samples over an rh×rw pixel grid with S samples per
        ray — enables the windowed fast path's patch regrouping.

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

    # In-bounds bilinear weight mass — pure elementwise XLA (fuses away).
    ry_mass = ((1.0 - wy) * ((y0 >= 0) & (y0 < H))
               + wy * ((y0 + 1 >= 0) & (y0 + 1 < H)))
    rx_mass = ((1.0 - wx) * ((x0 >= 0) & (x0 < W))
               + wx * ((x0 + 1 >= 0) & (x0 + 1 < W)))
    # stop_gradient: parity with the kernel's zero coordinate gradients (the
    # old kernel emitted wsum from the custom VJP, which dropped its grads).
    wsum = lax.stop_gradient(ry_mass * rx_mass)

    rs = ray_shape if _ray_shape_usable(M, ray_shape) else None
    statics = (NP, H, W, C, M, rs, tile_p, block_p,
               jnp.dtype(compute_dtype).name, interpret,
               coherent if rs is not None else False)
    # ONE relayout of the (scaled) coords into tile order; the fast path
    # derives its per-plane tiled index arrays elementwise from this.
    xyz = lax.stop_gradient(
        jnp.stack([x, y, z], axis=1).reshape(N * 3, M))    # (N·3, M)
    xyz_t = _tile_perm(xyz, rs, tile_p).reshape(N, 3, -1)  # (N, 3, Mt)
    # plane → (C, W, H), cast ONCE here (an in-kernel cast would reconvert
    # the whole plane on every grid cell). The fast path expands this into
    # the overlapping-window canvas; the fallback reshapes it to (C·W, H).
    plane_cwh = planes_hwc.transpose(0, 3, 2, 1).astype(compute_dtype)
    if canvas is None:
        nbx_, nby_ = _canvas_geom(H, W)
        canvas = jnp.zeros((NP, nbx_ * nby_, C * _WX, _WY), compute_dtype)
        has_canvas = False
    else:
        has_canvas = True
    statics = statics[:-1] + ((statics[-1], has_canvas),)
    samples = _sample_core(statics, plane_cwh, y0, x0, wy, wx, xyz_t, canvas)
    return samples, wsum


def fast_path_pred(planes_hwc: jax.Array, coords: jax.Array, *,
                   box_warp: float = 1.0,
                   ray_shape: Optional[Tuple[int, int, int]] = None,
                   tile_p: int = DEFAULT_TILE_P) -> jax.Array:
    """Diagnostic: would `triplane_sample` take the windowed fast path for
    these inputs? (Recomputes the per-tile span predicate.)"""
    NP, H, W, C = planes_hwc.shape
    N, M, _ = coords.shape
    s = (2.0 / box_warp)
    x, y, z = coords[..., 0] * s, coords[..., 1] * s, coords[..., 2] * s
    u = jnp.stack([x, x, z], axis=1).reshape(NP, M)
    v = jnp.stack([y, z, x], axis=1).reshape(NP, M)
    x0 = jnp.clip(jnp.floor((u + 1.0) * (W * 0.5) - 0.5), -2, W + 1)
    y0 = jnp.clip(jnp.floor((v + 1.0) * (H * 0.5) - 0.5), -2, H + 1)
    rs = ray_shape if _ray_shape_usable(M, ray_shape) else None
    nbx, nby = _canvas_geom(H, W)

    def ok(vv, stride, nb, win):
        vt = _tile_perm(vv, rs, tile_p).reshape(NP, -1, tile_p)
        b = jnp.clip(jnp.floor((jnp.min(vt, axis=-1) + _PADL) / stride),
                     0, nb - 1)
        ws = b * stride - _PADL
        return jnp.all(jnp.max(vt, axis=-1) - ws <= win - 2)

    return jnp.logical_and(ok(x0, _SX, nbx, _WX), ok(y0, _SY, nby, _WY))


def sample_from_planes_fused(plane_features: jax.Array, coordinates: jax.Array,
                             box_warp: float, **kw) -> jax.Array:
    """Drop-in for render.renderer.sample_from_planes using the Pallas
    kernel: (N, 3, C, H, W) + (N, M, 3) → (N, 3, M, C)."""
    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    hwc = plane_features.reshape(N * n_planes, C, H, W).transpose(0, 2, 3, 1)
    samples, _ = triplane_sample(hwc, coordinates, box_warp=box_warp, **kw)
    return samples.reshape(N, n_planes, M, C)


# ---------------------------------------------------------------------------
# Fused sampling + decoder epilogue (inference serving path)
#
# Profiling (scripts/profile_decode.py, r2): the decomposed pipeline spends
# more on the traffic AROUND sampling than in it — per frame: untile copies
# 1.8 ms, (3, M, C) sample copies 1.2 ms, 3-plane mean reduces 1.3 ms,
# decoder fusions 1.2 ms. This kernel computes, per point tile, all three
# planes' windowed contractions, the plane mean, the denormalization remat
# (σ·s + μ·wsum), and both 2-layer decoder MLPs — writing only the final
# (1+seg+rgb)-channel result. Inference-only (no VJP; training keeps the
# decomposed path whose custom backward is exact).

def _fused_decode_kernel(bidx_ref, pts0_ref, pts1_ref, pts2_ref,
                         c0_ref, c1_ref, c2_ref, stats_ref,
                         w0g_ref, b0g_ref, w1g_ref, b1g_ref,
                         w0a_ref, b0a_ref, w1a_ref, b1a_ref,
                         out_ref, *, C: int, tile_p: int, compute_dtype):
    """One point tile × all 3 planes → decoded (1+S+R, tile_p).

    pts_p: (1, 5, tile_p) rows [rel_y, rel_x, wy, wx, wsum] per plane;
    canvas_p: (1, 1, C·_WX, _WY); stats: (3, 2, C) [mean; var] per plane;
    weights pre-scaled by the equalized-lr gains outside."""
    acc_n = jnp.zeros((C, tile_p), jnp.float32)
    acc_d = jnp.zeros((C, tile_p), jnp.float32)
    for p, (pts_ref, cv_ref) in enumerate(((pts0_ref, c0_ref),
                                           (pts1_ref, c1_ref),
                                           (pts2_ref, c2_ref))):
        w2 = cv_ref[0, 0]                    # (C·_WX, _WY)
        WX = w2.shape[0] // C
        WY = w2.shape[1]
        rel_y = pts_ref[0, 0, :]
        rel_x = pts_ref[0, 1, :]
        wy1 = pts_ref[0, 2, :]
        wx1 = pts_ref[0, 3, :]
        wsum = pts_ref[0, 4, :]
        ry_t = _onehot2_t(rel_y.astype(jnp.int32), wy1, WY, tile_p,
                          compute_dtype)
        rx_t = _onehot2_t(rel_x.astype(jnp.int32), wx1, WX, tile_p,
                          jnp.float32)
        t = jnp.dot(w2, ry_t, preferred_element_type=jnp.float32)
        s = jnp.sum(t.reshape(C, WX, tile_p) * rx_t[None], axis=1)  # (C, P)
        acc_n += s
        mean = stats_ref[p, 0, :][:, None]   # (C, 1)
        var = stats_ref[p, 1, :][:, None]
        acc_d += s * var + mean * wsum[None, :]

    xn = acc_n * (1.0 / 3.0)
    xd = acc_d * (1.0 / 3.0)
    # geo net: σ + seg from normalized samples (ref triplane.py:232-270)
    hg = jax.nn.softplus(
        jnp.dot(w0g_ref[...], xn, preferred_element_type=jnp.float32)
        + b0g_ref[...])
    g = (jnp.dot(w1g_ref[...], hg, preferred_element_type=jnp.float32)
         + b1g_ref[...])
    # app net: rgb features from denormalized samples
    ha = jax.nn.softplus(
        jnp.dot(w0a_ref[...], xd, preferred_element_type=jnp.float32)
        + b0a_ref[...])
    rgb_lin = (jnp.dot(w1a_ref[...], ha, preferred_element_type=jnp.float32)
               + b1a_ref[...])
    rgb = jax.nn.sigmoid(rgb_lin) * (1 + 2 * 0.001) - 0.001
    out_ref[0] = jnp.concatenate([g, rgb], axis=0)


def _fused_decode_kernel_resident(bidx_ref, pts0_ref, pts1_ref, pts2_ref,
                                  canvas_ref, stats_ref,
                                  w0g_ref, b0g_ref, w1g_ref, b1g_ref,
                                  w0a_ref, b0a_ref, w1a_ref, b1a_ref,
                                  out_ref, *, C: int, tile_p: int,
                                  compute_dtype):
    """Resident-canvas fused decode: the WHOLE 3-plane canvas
    (3, nb, C·_WX, _WY) stays VMEM-resident (one HBM→VMEM copy, ~96 MB bf16
    at the serving geometry — v5e has 128 MB) and each plane's window is a
    dynamic VMEM index — replacing the 3×512 KB per-tile canvas DMAs that
    bound the streaming variant at ~40% MXU (docs/PERF.md)."""
    j = pl.program_id(0)
    acc_n = jnp.zeros((C, tile_p), jnp.float32)
    acc_d = jnp.zeros((C, tile_p), jnp.float32)
    for p, pts_ref in enumerate((pts0_ref, pts1_ref, pts2_ref)):
        w2 = canvas_ref[p, bidx_ref[p, j]]            # (C·_WX, _WY) view
        WX = w2.shape[0] // C
        WY = w2.shape[1]
        rel_y = pts_ref[0, 0, :]
        rel_x = pts_ref[0, 1, :]
        wy1 = pts_ref[0, 2, :]
        wx1 = pts_ref[0, 3, :]
        wsum = pts_ref[0, 4, :]
        ry_t = _onehot2_t(rel_y.astype(jnp.int32), wy1, WY, tile_p,
                          compute_dtype)
        rx_t = _onehot2_t(rel_x.astype(jnp.int32), wx1, WX, tile_p,
                          jnp.float32)
        t = jnp.dot(w2, ry_t, preferred_element_type=jnp.float32)
        s = jnp.sum(t.reshape(C, WX, tile_p) * rx_t[None], axis=1)
        acc_n += s
        mean = stats_ref[p, 0, :][:, None]
        var = stats_ref[p, 1, :][:, None]
        acc_d += s * var + mean * wsum[None, :]

    xn = acc_n * (1.0 / 3.0)
    xd = acc_d * (1.0 / 3.0)
    hg = jax.nn.softplus(
        jnp.dot(w0g_ref[...], xn, preferred_element_type=jnp.float32)
        + b0g_ref[...])
    g = (jnp.dot(w1g_ref[...], hg, preferred_element_type=jnp.float32)
         + b1g_ref[...])
    ha = jax.nn.softplus(
        jnp.dot(w0a_ref[...], xd, preferred_element_type=jnp.float32)
        + b0a_ref[...])
    rgb_lin = (jnp.dot(w1a_ref[...], ha, preferred_element_type=jnp.float32)
               + b1a_ref[...])
    rgb = jax.nn.sigmoid(rgb_lin) * (1 + 2 * 0.001) - 0.001
    out_ref[0] = jnp.concatenate([g, rgb], axis=0)


def _fused_decode_kernel_ik(bidx_ref, xyz_ref, c0_ref, c1_ref, c2_ref,
                            stats_ref,
                            w0g_ref, b0g_ref, w1g_ref, b1g_ref,
                            w0a_ref, b0a_ref, w1a_ref, b1a_ref,
                            out_ref, *, C: int, tile_p: int, compute_dtype,
                            H: int, W: int, nby: int, ilp: bool = False):
    """In-kernel-pts fused decode (NFE_INKERNEL_PTS): one point tile × all
    3 planes, with the per-plane projection / floor / frac / bounds-mass /
    window-relative math computed in the body from the raw scaled xyz tile
    (3, tile_p). The window start is rederived from the scalar-prefetched
    block index (ws = (b ÷ nby, b mod nby) · stride − pad), so no extra
    operand is needed. Math is a line-for-line transcription of the
    outside pts pipeline in triplane_sample_decode — same clips, same
    masses, same zeros-padding semantics.

    ilp (NFE_KERNEL_ILP): reorder the body into three phases — all planes'
    point math + one-hots (VPU), then the three window dots back-to-back
    (MXU), then the rx epilogues (VPU) — instead of the per-plane
    dot→epilogue chain. Bit-identical math; the per-plane chain serializes
    MXU and VPU (r5 profile: per-tile time ≈ MXU 1.5 µs + VPU 0.65 µs ≈
    the serial sum), while grouped dots give the scheduler a window to
    overlap plane p's epilogue with plane p+1's dot."""
    j = pl.program_id(0)
    x = xyz_ref[0, :]
    y = xyz_ref[1, :]
    z = xyz_ref[2, :]

    def point_math(p):
        u = (x, x, z)[p]
        v = (y, z, x)[p]
        fu = (u + 1.0) * (W * 0.5) - 0.5
        fv = (v + 1.0) * (H * 0.5) - 0.5
        flu = jnp.floor(fu)
        flv = jnp.floor(fv)
        x0 = jnp.clip(flu, -2, W + 1)
        y0 = jnp.clip(flv, -2, H + 1)
        wx1 = fu - flu
        wy1 = fv - flv
        ry_mass = ((1.0 - wy1) * ((y0 >= 0) & (y0 < H)).astype(jnp.float32)
                   + wy1 * ((y0 + 1 >= 0) & (y0 + 1 < H)).astype(jnp.float32))
        rx_mass = ((1.0 - wx1) * ((x0 >= 0) & (x0 < W)).astype(jnp.float32)
                   + wx1 * ((x0 + 1 >= 0) & (x0 + 1 < W)).astype(jnp.float32))
        wsum = ry_mass * rx_mass
        b = bidx_ref[p, j]
        wsx = ((b // nby) * _SX - _PADL).astype(jnp.float32)
        wsy = (lax.rem(b, nby) * _SY - _PADL).astype(jnp.float32)
        rel_y = y0 - wsy
        rel_x = x0 - wsx
        return rel_x, rel_y, wx1, wy1, wsum

    cv_refs = (c0_ref, c1_ref, c2_ref)
    acc_n = jnp.zeros((C, tile_p), jnp.float32)
    acc_d = jnp.zeros((C, tile_p), jnp.float32)
    if ilp:
        pre = []
        for p in range(3):
            rel_x, rel_y, wx1, wy1, wsum = point_math(p)
            w2 = cv_refs[p][0, 0]            # (C·_WX, _WY)
            WX = w2.shape[0] // C
            WY = w2.shape[1]
            ry_t = _onehot2_t(rel_y.astype(jnp.int32), wy1, WY, tile_p,
                              compute_dtype)
            rx_t = _onehot2_t(rel_x.astype(jnp.int32), wx1, WX, tile_p,
                              jnp.float32)
            pre.append((w2, WX, ry_t, rx_t, wsum))
        ts = [jnp.dot(w2, ry_t, preferred_element_type=jnp.float32)
              for w2, _, ry_t, _, _ in pre]
        for p, (w2, WX, ry_t, rx_t, wsum) in enumerate(pre):
            s = jnp.sum(ts[p].reshape(C, WX, tile_p) * rx_t[None], axis=1)
            acc_n += s
            mean = stats_ref[p, 0, :][:, None]
            var = stats_ref[p, 1, :][:, None]
            acc_d += s * var + mean * wsum[None, :]
    else:
        for p in range(3):
            rel_x, rel_y, wx1, wy1, wsum = point_math(p)
            w2 = cv_refs[p][0, 0]            # (C·_WX, _WY)
            WX = w2.shape[0] // C
            WY = w2.shape[1]
            ry_t = _onehot2_t(rel_y.astype(jnp.int32), wy1, WY, tile_p,
                              compute_dtype)
            rx_t = _onehot2_t(rel_x.astype(jnp.int32), wx1, WX, tile_p,
                              jnp.float32)
            t = jnp.dot(w2, ry_t, preferred_element_type=jnp.float32)
            s = jnp.sum(t.reshape(C, WX, tile_p) * rx_t[None], axis=1)
            acc_n += s
            mean = stats_ref[p, 0, :][:, None]   # (C, 1)
            var = stats_ref[p, 1, :][:, None]
            acc_d += s * var + mean * wsum[None, :]

    xn = acc_n * (1.0 / 3.0)
    xd = acc_d * (1.0 / 3.0)
    hg = jax.nn.softplus(
        jnp.dot(w0g_ref[...], xn, preferred_element_type=jnp.float32)
        + b0g_ref[...])
    g = (jnp.dot(w1g_ref[...], hg, preferred_element_type=jnp.float32)
         + b1g_ref[...])
    ha = jax.nn.softplus(
        jnp.dot(w0a_ref[...], xd, preferred_element_type=jnp.float32)
        + b0a_ref[...])
    rgb_lin = (jnp.dot(w1a_ref[...], ha, preferred_element_type=jnp.float32)
               + b1a_ref[...])
    rgb = jax.nn.sigmoid(rgb_lin) * (1 + 2 * 0.001) - 0.001
    out_ref[0] = jnp.concatenate([g, rgb], axis=0)


def _win_sample_sorted_kernel(bs_ref, perm_ref, pts_ref, canvas_ref, out_ref,
                              *, C: int, tile_p: int, compute_dtype):
    """Sorted-grid per-plane windowed sampler.

    Grid (3, nt) sweeps each plane's point tiles in canvas-block order
    (scalar-prefetched argsort permutation `perm`; `bs` is the matching
    sorted block index). Consecutive grid steps therefore share their canvas
    block until the sweep moves to the next one — Mosaic's revisit-skip
    turns the per-tile 512 KB canvas DMA of the streaming kernel (~40% MXU,
    DMA-bound, docs/PERF.md r2) into ONE fetch per distinct block per plane.
    Samples are written at the SORTED grid position (static out map — a
    dynamic output map hangs libtpu's pipeline emitter); the decode
    epilogue un-sorts via dynamic input maps (`_decode_samples_gather_kernel`)."""
    _win_body(canvas_ref[0, 0], pts_ref, out_ref, C, tile_p, compute_dtype)


def _decode_from_samples(s, pts_ref, stats_ref,
                         w0g_ref, b0g_ref, w1g_ref, b1g_ref,
                         w0a_ref, b0a_ref, w1a_ref, b1a_ref,
                         out_ref, C: int):
    """Shared decode-epilogue math over pre-sampled per-plane features
    s (3, C, P) f32: plane mean, σμ-denormalization remat, and both
    2-layer decoder MLPs."""
    xn = (s[0] + s[1] + s[2]) * (1.0 / 3.0)
    acc_d = jnp.zeros_like(s[0])
    for p in range(3):
        wsum = pts_ref[p, 4, :]
        mean = stats_ref[p, 0, :][:, None]
        var = stats_ref[p, 1, :][:, None]
        acc_d += s[p] * var + mean * wsum[None, :]
    xd = acc_d * (1.0 / 3.0)
    hg = jax.nn.softplus(
        jnp.dot(w0g_ref[...], xn, preferred_element_type=jnp.float32)
        + b0g_ref[...])
    g = (jnp.dot(w1g_ref[...], hg, preferred_element_type=jnp.float32)
         + b1g_ref[...])
    ha = jax.nn.softplus(
        jnp.dot(w0a_ref[...], xd, preferred_element_type=jnp.float32)
        + b0a_ref[...])
    rgb_lin = (jnp.dot(w1a_ref[...], ha, preferred_element_type=jnp.float32)
               + b1a_ref[...])
    rgb = jax.nn.sigmoid(rgb_lin) * (1 + 2 * 0.001) - 0.001
    out_ref[0] = jnp.concatenate([g, rgb], axis=0)


def _decode_samples_kernel(s_ref, pts_ref, stats_ref,
                           w0g_ref, b0g_ref, w1g_ref, b1g_ref,
                           w0a_ref, b0a_ref, w1a_ref, b1a_ref,
                           out_ref, *, C: int, tile_p: int):
    """Decode epilogue over pre-sampled per-plane features — one point
    tile per grid step. Partner of `_win_sample_sorted_kernel` (the sorted
    sweep makes a fused single-kernel epilogue impossible: the three planes'
    visits to a tile are not consecutive)."""
    _decode_from_samples(s_ref[...], pts_ref, stats_ref,
                         w0g_ref, b0g_ref, w1g_ref, b1g_ref,
                         w0a_ref, b0a_ref, w1a_ref, b1a_ref, out_ref, C)


def _decode_samples_gather_kernel(iv_ref, s0_ref, s1_ref, s2_ref,
                                  pts_ref, stats_ref,
                                  w0g_ref, b0g_ref, w1g_ref, b1g_ref,
                                  w0a_ref, b0a_ref, w1a_ref, b1a_ref,
                                  out_ref, *, C: int, tile_p: int):
    """Decode epilogue that UN-SORTS as it reads: each plane's sample tile
    arrives via a dynamic scalar-prefetched INPUT index map (`iv` = the
    inverse of that plane's canvas-block argsort), so the sorted sampling
    kernel can keep a STATIC output index map — the dynamic-OUTPUT variant
    hangs the current libtpu pipeline emitter >15 min (runs/hw_r4/benchN)."""
    s = jnp.concatenate([s0_ref[...], s1_ref[...], s2_ref[...]], axis=0)
    _decode_from_samples(s, pts_ref, stats_ref,
                         w0g_ref, b0g_ref, w1g_ref, b1g_ref,
                         w0a_ref, b0a_ref, w1a_ref, b1a_ref, out_ref, C)


def _effective_decoder(decoder_params, plane_stats, C: int,
                       lr_multiplier: float):
    """Equalized-lr effective decoder weights (models/layers.fully_connected
    formula) + packed plane stats for the fused kernel."""
    def eff(p_net):
        w0 = p_net["fc0"]["weight"]
        w1 = p_net["fc1"]["weight"]
        g0 = lr_multiplier / float(w0.shape[1]) ** 0.5
        g1 = lr_multiplier / float(w1.shape[1]) ** 0.5
        return (w0 * g0,
                (p_net["fc0"]["bias"] * lr_multiplier).reshape(-1, 1),
                w1 * g1,
                (p_net["fc1"]["bias"] * lr_multiplier).reshape(-1, 1))

    w0g, b0g, w1g, b1g = eff(decoder_params["geo_net"])
    w0a, b0a, w1a, b1a = eff(decoder_params["app_net"])
    mean, var = plane_stats
    stats = jnp.stack([mean.reshape(3, C), var.reshape(3, C)], axis=1)
    return w0g, b0g, w1g, b1g, w0a, b0a, w1a, b1a, stats


def _decode_call_for_bench(bidx, pts, canvas, decoder_params, plane_stats, *,
                           lr_multiplier: float = 1.0,
                           tile_p: int = DEFAULT_TILE_P,
                           compute_dtype=jnp.bfloat16):
    """Bench-only: the fused decode pallas call on PRE-TILED pts/bidx —
    isolates the kernel from coord prep and untile (scripts/
    bench_serving_split.py)."""
    C = canvas.shape[2] // _WX
    w0g, b0g, w1g, b1g, w0a, b0a, w1a, b1a, stats = _effective_decoder(
        decoder_params, plane_stats, C, lr_multiplier)
    OUT = w1g.shape[0] + w1a.shape[0]
    kernel = functools.partial(_fused_decode_kernel, C=C, tile_p=tile_p,
                               compute_dtype=jnp.dtype(compute_dtype))
    nt_c = pts.shape[2] // tile_p
    full = lambda a: pl.BlockSpec(a.shape, lambda j, b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt_c,),
        in_specs=[
            pl.BlockSpec((1, 5, tile_p), lambda j, b: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, tile_p), lambda j, b: (1, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, tile_p), lambda j, b: (2, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C * _WX, _WY), lambda j, b: (0, b[0, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C * _WX, _WY), lambda j, b: (1, b[1, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C * _WX, _WY), lambda j, b: (2, b[2, j], 0, 0),
                         memory_space=pltpu.VMEM),
            full(stats), full(w0g), full(b0g), full(w1g), full(b1g),
            full(w0a), full(b0a), full(w1a), full(b1a),
        ],
        out_specs=pl.BlockSpec((1, OUT, tile_p), lambda j, b: (0, 0, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, OUT, pts.shape[2]), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bidx, pts[0:1], pts[1:2], pts[2:3], canvas, canvas, canvas,
      stats, w0g, b0g, w1g, b1g, w0a, b0a, w1a, b1a)


def triplane_sample_decode(planes_hwc: jax.Array, coords: jax.Array,
                           decoder_params, plane_stats, *,
                           box_warp: float = 1.0,
                           ray_shape: Tuple[int, int, int],
                           lr_multiplier: float = 1.0,
                           tile_p: int = DEFAULT_TILE_P,
                           compute_dtype=jnp.bfloat16,
                           canvas: Optional[jax.Array] = None,
                           interpret: bool = False,
                           return_tiled: bool = False,
                           coords_transposed: bool = False):
    """Fused serving path: planes + points → decoded σ/seg/rgb directly.

    planes_hwc: (3, H, W, C) NORMALIZED planes (batch 1); coords (1, M, 3),
    or (1, 3, M) with coords_transposed=True — the channels-major layout is
    NATIVE here (the first thing this function does is split x/y/z rows),
    and callers that construct coords transposed avoid ever materializing a
    minor-dim-3 tensor (XLA pads the 3-lane minor axis to a full 128-lane
    tile, so the (M, 3) construction chain was ~1.1 ms/frame of relayout
    traffic at the serving config — runs/hw_r4/profile_w4.log);
    plane_stats: (mean, var) each (1, 3, C); decoder_params: the
    DisentangledOSGDecoder pytree (geo_net/app_net). Returns
    {'sigma': (1, M, 1), 'seg': (1, M, S), 'rgb': (1, M, R)} float32.

    return_tiled: skip the payload untile — return {'sigma': (1, M, 1)
    (only σ is untiled, for the merge/marcher math), 'tiled': the raw
    (1, OUT, Mt) kernel output in tile order, 'seg_dim': S}. Pair with
    `composite_payload_tiled`, which contracts per-sample weights against
    the tiled layout directly (the (M, OUT) untile permute was ~0.6
    ms/frame of pure relayout, runs/hw_r4/profile_w4.log).

    INFERENCE ONLY — differentiating through this raises (training uses the
    decomposed kernel whose custom VJP is exact)."""
    NP, H, W, C = planes_hwc.shape
    assert NP == 3, "fused path is single-identity (3 planes)"
    coords = lax.stop_gradient(coords)
    planes_hwc = lax.stop_gradient(planes_hwc)

    s = (2.0 / box_warp)
    if coords_transposed:
        N, three, M = coords.shape
        assert N == 1 and three == 3
        xyz = coords[0] * s                                   # (3, M)
    else:
        N, M, _ = coords.shape
        assert N == 1
        x, y, z = coords[..., 0] * s, coords[..., 1] * s, coords[..., 2] * s
        xyz = jnp.stack([x, y, z], axis=1).reshape(3, M)
    xyz_t = _tile_perm(xyz, ray_shape, tile_p)                # (3, Mt)
    Mt = xyz_t.shape[1]
    nt = Mt // tile_p
    nbx, nby = _canvas_geom(H, W)
    resident = _RESIDENT_FORCE or _RESIDENT_CANVAS
    sorted_mode = _SORTED_FORCE or _SORTED_KERNEL
    if resident:
        _parked_gate("NFE_RESIDENT_CANVAS", interpret=interpret)
    if sorted_mode:
        _parked_gate("NFE_SORTED_KERNEL", interpret=interpret)
    inkernel = ((_INKERNEL_FORCE or _INKERNEL_PTS)
                and not (resident or sorted_mode))

    if inkernel:
        # Per-tile window indices from the tile min/max of the RAW scaled
        # coords: floor/clip and the projection affines are monotone, so
        # clip(floor(f(min u))) == min over the tile of the per-point
        # derivation — bit-identical block choice, ~20 (3, Mt) HLO ops
        # cheaper. The per-point rows are rebuilt inside the kernel body
        # (_fused_decode_kernel_ik).
        xr = xyz_t.reshape(3, nt, tile_p)
        mn = jnp.min(xr, axis=-1)                             # (3, nt) xyz
        mx = jnp.max(xr, axis=-1)
        umin = jnp.stack([mn[0], mn[0], mn[2]])               # (3, nt)
        umax = jnp.stack([mx[0], mx[0], mx[2]])
        vmin = jnp.stack([mn[1], mn[2], mn[0]])
        vmax = jnp.stack([mx[1], mx[2], mx[0]])

        def window_of_minmax(lo, hi, size, stride, nb_, win):
            f0 = jnp.clip(jnp.floor((lo + 1.0) * (size * 0.5) - 0.5),
                          -2, size + 1)
            f1 = jnp.clip(jnp.floor((hi + 1.0) * (size * 0.5) - 0.5),
                          -2, size + 1)
            b = jnp.clip(jnp.floor((f0 + _PADL) / stride),
                         0, nb_ - 1).astype(jnp.int32)
            ws_ = (b * stride - _PADL).astype(jnp.float32)
            ok = jnp.all(f1 - ws_ <= win - 2)
            return b, ok

        bx, ok_x = window_of_minmax(umin, umax, W, _SX, nbx, _WX)
        by, ok_y = window_of_minmax(vmin, vmax, H, _SY, nby, _WY)
        bidx = bx * nby + by                                  # (3, nt)
        payload = xyz_t                                       # (3, Mt)
    else:
        xt, yt, zt = xyz_t[0], xyz_t[1], xyz_t[2]
        ut = jnp.stack([xt, xt, zt])                          # (3, Mt)
        vt = jnp.stack([yt, zt, xt])
        fut = (ut + 1.0) * (W * 0.5) - 0.5
        fvt = (vt + 1.0) * (H * 0.5) - 0.5
        x0t = jnp.clip(jnp.floor(fut), -2, W + 1)
        y0t = jnp.clip(jnp.floor(fvt), -2, H + 1)
        wxt = (fut - jnp.floor(fut)).astype(jnp.float32)
        wyt = (fvt - jnp.floor(fvt)).astype(jnp.float32)
        ry_mass = ((1.0 - wyt) * ((y0t >= 0) & (y0t < H))
                   + wyt * ((y0t + 1 >= 0) & (y0t + 1 < H)))
        rx_mass = ((1.0 - wxt) * ((x0t >= 0) & (x0t < W))
                   + wxt * ((x0t + 1 >= 0) & (x0t + 1 < W)))
        wsum_t = (ry_mass * rx_mass).astype(jnp.float32)      # (3, Mt)

        def window_of(v, stride, nb, win):
            vt_ = v.reshape(3, nt, tile_p)
            b = jnp.clip(jnp.floor((jnp.min(vt_, axis=-1) + _PADL) / stride),
                         0, nb - 1).astype(jnp.int32)
            ws_ = (b * stride - _PADL).astype(jnp.float32)
            ok = jnp.all(jnp.max(vt_, axis=-1) - ws_ <= win - 2)
            return b, (vt_ - ws_[:, :, None]).reshape(3, Mt), ok

        bx, rel_x, ok_x = window_of(x0t, _SX, nbx, _WX)
        by, rel_y, ok_y = window_of(y0t, _SY, nby, _WY)
        bidx = bx * nby + by                                  # (3, nt)
        payload = jnp.stack([rel_y, rel_x, wyt, wxt, wsum_t],
                            axis=1)                           # (3, 5, Mt)

    if canvas is None:
        canvas = build_plane_canvas(planes_hwc, compute_dtype)

    w0g, b0g, w1g, b1g, w0a, b0a, w1a, b1a, stats = _effective_decoder(
        decoder_params, plane_stats, C, lr_multiplier)
    SEG = w1g.shape[0] - 1
    RGB = w1a.shape[0]
    OUT = 1 + SEG + RGB

    full = lambda a: pl.BlockSpec(a.shape, lambda j, b_ref: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    nb = canvas.shape[1]

    def sorted_call(bidx_c, pts_c):
        """Two-kernel sorted-sweep variant (NFE_SORTED_KERNEL=1): per-plane
        sampling in canvas-block order (one canvas DMA per distinct block),
        then the decode epilogue over the (3, C, Mt) samples."""
        nt_c = pts_c.shape[2] // tile_p
        Mt_c = pts_c.shape[2]
        perm = jnp.argsort(bidx_c, axis=1, stable=True).astype(jnp.int32)
        bs = jnp.take_along_axis(bidx_c, perm, axis=1)
        # argsort of a permutation is its inverse: iv[p, t] = sorted
        # position of canonical tile t. All dynamic index maps below are on
        # INPUTS only — the sampler writes at the static grid position and
        # the decode kernel un-sorts via iv as it reads, because a dynamic
        # OUTPUT index map hangs the current libtpu pipeline emitter
        # (runs/hw_r4/benchN, >15 min).
        iv = jnp.argsort(perm, axis=1).astype(jnp.int32)
        sample_kernel = functools.partial(
            _win_sample_sorted_kernel, C=C, tile_p=tile_p,
            compute_dtype=jnp.dtype(compute_dtype))
        sample_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(3, nt_c),
            in_specs=[
                pl.BlockSpec((1, 5, tile_p),
                             lambda p, j, bs_r, pm: (p, 0, pm[p, j]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, C * _WX, _WY),
                             lambda p, j, bs_r, pm: (p, bs_r[p, j], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C, tile_p),
                                   lambda p, j, bs_r, pm: (p, 0, j),
                                   memory_space=pltpu.VMEM),
        )
        samples = pl.pallas_call(
            sample_kernel,
            grid_spec=sample_spec,
            out_shape=jax.ShapeDtypeStruct((3, C, Mt_c), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ) if not interpret else None,
        )(bs, perm, pts_c, canvas)

        dec_kernel = functools.partial(_decode_samples_gather_kernel, C=C,
                                       tile_p=tile_p)
        dec_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt_c,),
            in_specs=[
                pl.BlockSpec((1, C, tile_p),
                             lambda j, iv_r, p=p: (p, 0, iv_r[p, j]),
                             memory_space=pltpu.VMEM)
                for p in range(3)
            ] + [
                pl.BlockSpec((3, 5, tile_p), lambda j, iv_r: (0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(stats.shape,
                             lambda j, iv_r: (0,) * stats.ndim,
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(a.shape, lambda j, iv_r, _n=a.ndim: (0,) * _n,
                             memory_space=pltpu.VMEM)
                for a in (w0g, b0g, w1g, b1g, w0a, b0a, w1a, b1a)
            ],
            out_specs=pl.BlockSpec((1, OUT, tile_p),
                                   lambda j, iv_r: (0, 0, j),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            dec_kernel,
            grid_spec=dec_spec,
            out_shape=jax.ShapeDtypeStruct((1, OUT, Mt_c), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ) if not interpret else None,
        )(iv, samples, samples, samples, pts_c, stats,
          w0g, b0g, w1g, b1g, w0a, b0a, w1a, b1a)

    def fused_call_ik(bidx_c, xyz_c):
        nt_c = xyz_c.shape[1] // tile_p
        kernel = functools.partial(
            _fused_decode_kernel_ik, C=C, tile_p=tile_p,
            compute_dtype=jnp.dtype(compute_dtype), H=H, W=W, nby=nby,
            # read lazily so bench-ladder env toggles take effect
            ilp=os.environ.get("NFE_KERNEL_ILP", "0") == "1")
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt_c,),
            in_specs=[
                pl.BlockSpec((3, tile_p), lambda j, b: (0, j),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((1, 1, C * _WX, _WY),
                             lambda j, b, p=p: (p, b[p, j], 0, 0),
                             memory_space=pltpu.VMEM)
                for p in range(3)
            ] + [
                full(stats), full(w0g), full(b0g), full(w1g), full(b1g),
                full(w0a), full(b0a), full(w1a), full(b1a),
            ],
            out_specs=pl.BlockSpec((1, OUT, tile_p), lambda j, b: (0, 0, j),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, OUT, xyz_c.shape[1]),
                                           jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ) if not interpret else None,
        )(bidx_c, xyz_c, canvas, canvas, canvas,
          stats, w0g, b0g, w1g, b1g, w0a, b0a, w1a, b1a)

    def fused_call(bidx_c, pts_c):
        nt_c = pts_c.shape[2] // tile_p
        pts_specs = [
            pl.BlockSpec((1, 5, tile_p), lambda j, b, p=p: (p, 0, j),
                         memory_space=pltpu.VMEM)
            for p in range(3)
        ]
        if resident:
            kernel = functools.partial(
                _fused_decode_kernel_resident, C=C, tile_p=tile_p,
                compute_dtype=jnp.dtype(compute_dtype))
            canvas_specs = [pl.BlockSpec((3, nb, C * _WX, _WY),
                                         lambda j, b: (0, 0, 0, 0),
                                         memory_space=pltpu.VMEM)]
            canvas_args = (canvas,)
        else:
            kernel = functools.partial(
                _fused_decode_kernel, C=C, tile_p=tile_p,
                compute_dtype=jnp.dtype(compute_dtype))
            canvas_specs = [
                pl.BlockSpec((1, 1, C * _WX, _WY),
                             lambda j, b, p=p: (p, b[p, j], 0, 0),
                             memory_space=pltpu.VMEM)
                for p in range(3)
            ]
            canvas_args = (canvas, canvas, canvas)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt_c,),
            in_specs=pts_specs + canvas_specs + [
                full(stats), full(w0g), full(b0g), full(w1g), full(b1g),
                full(w0a), full(b0a), full(w1a), full(b1a),
            ],
            out_specs=pl.BlockSpec((1, OUT, tile_p), lambda j, b: (0, 0, j),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, OUT, pts_c.shape[2]), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                # resident: 3×32 MB canvases + tiles must fit (v5e: 128 MB)
                vmem_limit_bytes=(120 if resident else 100) * 1024 * 1024,
            ) if not interpret else None,
        )(bidx_c, pts_c[0:1], pts_c[1:2], pts_c[2:3], *canvas_args,
          stats, w0g, b0g, w1g, b1g, w0a, b0a, w1a, b1a)

    # The TPU backend's layout math overflows for pallas operands with a
    # minor extent beyond 2^18 (compiler SIGABRT, bisected r2); chunk the
    # point axis — every chunk shares the one canvas, so the only cost is a
    # few extra kernel launches inside the program. NFE_MAX_MT overrides
    # the cap for hardware A/B: the r4 group-2 flattened crash
    # (runs/hw_r4/benchL.err, LoweringEmitter::PrepareOutput) happens with
    # chunks of EXACTLY 2^18 — if libtpu's windowing proof is strict-<,
    # a slightly smaller cap unlocks multi-frame bodies.
    MAX_MT = int(os.environ.get("NFE_MAX_MT", str(1 << 18)))
    call = (sorted_call if sorted_mode
            else fused_call_ik if inkernel else fused_call)
    slice_payload = ((lambda a, l, r: a[:, l:r]) if inkernel
                     else (lambda a, l, r: a[:, :, l:r]))
    if Mt <= MAX_MT:
        out = call(bidx, payload)
    else:
        chunk_nt = MAX_MT // tile_p
        outs = []
        for c0 in range(0, nt, chunk_nt):
            c1 = min(c0 + chunk_nt, nt)
            outs.append(call(
                bidx[:, c0:c1],
                slice_payload(payload, c0 * tile_p, c1 * tile_p)))
        out = jnp.concatenate(outs, axis=2)

    # Loud-fail guard (ADVICE r2): this path is statically windowed — a
    # workload whose tiles outgrow the window poisons the output with NaN
    # instead of silently decoding zeros.
    guard = jnp.where(jnp.logical_and(ok_x, ok_y), 0.0, jnp.nan)
    if return_tiled:
        sig = _untile_perm(out[:, 0:1, :], M, ray_shape)[0]  # (M, 1)
        return {"sigma": sig[None] + guard, "tiled": out + guard,
                "seg_dim": SEG}
    dec = _untile_perm(out, M, ray_shape)[0]  # (M, OUT)
    dec = dec + guard
    return {"sigma": dec[None, :, 0:1], "seg": dec[None, :, 1:1 + SEG],
            "rgb": dec[None, :, 1 + SEG:]}


def _composite_static_kernel(u_ref, pay_ref, out_ref, *, nk: int,
                             tile_p: int, rp: int):
    """Per-patch marcher epilogue with a PURELY STATIC schedule.

    Grid (nt,) walks the decode output in its native patch-outermost tile
    order, so the nk depth tiles of a pixel patch are CONSECUTIVE grid
    steps; the output block (1, OUT, rp) at index j // nk is therefore
    revisited exactly nk consecutive times and serves as the per-ray
    accumulator (standard matmul-K accumulation pattern — init on the first
    visit, flushed by Mosaic when the block index advances). No scalar
    prefetch, no dynamic index maps: the dynamic-indexing variants of this
    contraction are what hang the current libtpu pipeline emitter
    (runs/hw_r4/ab4.log T1, benchN).

    In-tile lanes are (ray-in-patch, depth) with depth minor; the depth
    lane-group reduce is an MXU matmul against the iota-built one-hot
    grouping matrix G[l, r] = [l // pd == r] (a lane-retiling reshape of
    the (OUT, tile_p) block to (OUT, rp, pd) would be the VPU alternative,
    but minor-dim-4 relayouts are exactly what _untile_perm measures as
    expensive)."""
    j = pl.program_id(0)
    k = lax.rem(j, nk)

    @pl.when(k == 0)
    def _init():
        out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    y = pay_ref[0] * u_ref[0, 0][None, :]                 # (OUT, tile_p)
    pd = tile_p // rp
    rows = lax.broadcasted_iota(jnp.int32, (tile_p, rp), 0)
    cols = lax.broadcasted_iota(jnp.int32, (tile_p, rp), 1)
    g = (rows // pd == cols).astype(jnp.float32)
    out_ref[0, 0] += jnp.dot(y, g, preferred_element_type=jnp.float32)


def composite_payload_tiled(tiled: jax.Array, u_ray: jax.Array,
                            ray_shape: Tuple[int, int, int], *,
                            use_kernel: Optional[bool] = None,
                            interpret: bool = False) -> jax.Array:
    """Σ_s u[r,s] · payload[r,s,:] over the TILED fused-decode output.

    The composite is linear in the per-sample payload, so the pull-back
    coefficients (renderer.composite_two_pass) can be permuted INTO tile
    order (1 channel — cheap) and contracted there, instead of untiling the
    (M, OUT) payload into ray order first. The contraction itself is a
    grouped lane reduce: in-tile lanes are (ray-in-patch, depth) pairs, so
    summing over the depth-minor lane groups and the per-patch depth tiles
    yields the per-ray composite directly.

    use_kernel (default: env NFE_TILED_COMPOSITE == "2"): run the
    contraction as the static-schedule Pallas kernel above instead of the
    XLA reshape/reduce — the XLA lowering materializes the multiply at
    payload size and pays two relayouts. Requires patch-outermost tile
    order (the kernel's accumulator pattern needs a patch's depth tiles
    consecutive); silently uses the XLA path otherwise — identical math.

    tiled: (1, OUT, Mt) from triplane_sample_decode(return_tiled=True),
    with Mt == prod(ray_shape) (the serving shapes are never point-padded);
    u_ray: (1, R, S) coefficients in ray-major order.
    Returns (1, R, OUT) float32.
    """
    _, OUT, Mt = tiled.shape
    rh, rw, S = ray_shape
    ph, pw, pd = _PATCH
    M = rh * rw * S
    assert Mt == M and u_ray.shape == (1, rh * rw, S), (tiled.shape,
                                                        u_ray.shape,
                                                        ray_shape)
    u_t = _tile_perm(u_ray.reshape(1, M).astype(jnp.float32), ray_shape,
                     DEFAULT_TILE_P)[0]                   # (Mt,)
    npatch = (rh // ph) * (rw // pw)
    nk = S // pd
    if use_kernel is None:
        use_kernel = (os.environ.get("NFE_TILED_COMPOSITE", "2") == "2"
                      and jax.default_backend() in ("tpu", "axon"))
    tile_p = DEFAULT_TILE_P
    rp = ph * pw
    if (use_kernel and _TILE_ORDER == "patch" and Mt % tile_p == 0
            and tile_p == ph * pw * pd):
        nt = Mt // tile_p
        kernel = functools.partial(_composite_static_kernel, nk=nk,
                                   tile_p=tile_p, rp=rp)
        o = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 1, tile_p), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, OUT, tile_p), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            # 4-D out so the block obeys Mosaic's (sublane % 8, lane == dim)
            # rule: block (1, 1, OUT, rp) on array (1, npatch, OUT, rp) —
            # a 3-D (1, OUT, rp) block fails lowering (rp=64 lanes is
            # neither 128-divisible nor the full 4096 axis).
            out_specs=pl.BlockSpec((1, 1, OUT, rp),
                                   lambda j: (0, j // nk, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, npatch, OUT, rp),
                                           jnp.float32),
            interpret=interpret,
        )(u_t[None, None, :], tiled)
        o = o[0].reshape(rh // ph, rw // pw, OUT, ph, pw)
        return o.transpose(0, 3, 1, 4, 2).reshape(1, rh * rw, OUT)
    y = tiled[0] * u_t[None, :]                           # fuses into reduce
    if _TILE_ORDER == "patch":
        yp = y.reshape(OUT, npatch, nk, ph * pw, pd)
        o = jnp.sum(yp, axis=(2, 4))                      # (OUT, npatch, ph·pw)
    else:
        yp = y.reshape(OUT, nk, npatch, ph * pw, pd)
        o = jnp.sum(yp, axis=(1, 4))
    o = o.reshape(OUT, rh // ph, rw // pw, ph, pw)
    return o.transpose(1, 3, 2, 4, 0).reshape(1, rh * rw, OUT)
