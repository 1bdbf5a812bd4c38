"""Two-pass hierarchical importance renderer over tri-planes.

Rebuild of ref training/volumetric_rendering/renderer.py:23-363, TPU-first:

* Plane projections for the three EG3D axis matrices reduce to coordinate
  shuffles — (x,y), (x,z), (z,x) — computed inline instead of batched 3×3
  inverse matmuls (ref renderer.py:23-53; the third matrix is EG3D's fixed
  non-orthogonal variant, whose inverse permutes to (z,x)).
* `searchsorted` in the importance PDF inversion is a vectorized
  comparison-count (static S≈48), which XLA fuses — no host sync, no sort.
* The depth sort-merge of coarse+fine samples uses argsort + gather along a
  static axis.
* Both passes live in ONE traced program (coarse eval → importance resample
  → fine eval → merge → march), matching the reference's single forward
  (renderer.py:301-363) and giving XLA the whole graph to schedule.

The decoder is passed as (apply_fn, params): apply_fn(params, norm_samples,
denorm_samples) → {'rgb', 'sigma', 'seg'?}.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderingConfig
from ..ops import grid_sample_2d
from . import math_utils
from .ray_marcher import march_weights, mip_ray_marcher, seg_mip_ray_marcher


# ---------------------------------------------------------------------------
# Tri-plane sampling

def project_onto_planes(coordinates: jax.Array) -> jax.Array:
    """(N, M, 3) xyz → (N, 3, M, 2) projections onto the three EG3D planes.

    Equivalent to bmm with the inverses of the ref axis matrices
    (renderer.py:23-53): plane0 (x,y), plane1 (x,z), plane2 (z,x).
    """
    x, y, z = coordinates[..., 0], coordinates[..., 1], coordinates[..., 2]
    p0 = jnp.stack([x, y], axis=-1)
    p1 = jnp.stack([x, z], axis=-1)
    p2 = jnp.stack([z, x], axis=-1)
    return jnp.stack([p0, p1, p2], axis=1)


def sample_from_planes(plane_features: jax.Array, coordinates: jax.Array,
                       box_warp: float) -> jax.Array:
    """plane_features (N, 3, C, H, W), coordinates (N, M, 3) →
    (N, 3, M, C) bilinear samples (ref: renderer.py:55-65).

    Golden XLA-gather implementation; `sample_planes` below dispatches to the
    fused Pallas kernel on TPU (~30× faster on the 196k-point render pass)."""
    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    coords = (2.0 / box_warp) * coordinates  # scale box to [-1, 1]
    proj = project_onto_planes(coords).reshape(N * n_planes, M, 2)
    feats = grid_sample_2d(plane_features.reshape(N * n_planes, C, H, W), proj)
    # (N*3, C, M) → (N, 3, M, C)
    return feats.reshape(N, n_planes, C, M).transpose(0, 1, 3, 2)


def sample_planes(plane_features: jax.Array, coordinates: jax.Array,
                  box_warp: float, ray_shape=None) -> jax.Array:
    """Backend-dispatching tri-plane sampler: Pallas MXU kernel on TPU
    (ops/triplane_kernel.py), golden gather path elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        from ..ops.triplane_kernel import sample_from_planes_fused

        return sample_from_planes_fused(plane_features, coordinates, box_warp,
                                        ray_shape=ray_shape)
    return sample_from_planes(plane_features, coordinates, box_warp)


# ---------------------------------------------------------------------------
# Depth sampling

def sample_stratified(rng: Optional[jax.Array], ray_origins: jax.Array,
                      ray_start, ray_end, depth_resolution: int,
                      disparity_space_sampling: bool = False) -> jax.Array:
    """(N, R, S, 1) jittered uniform depths (ref: renderer.py:169-192).
    rng=None gives deterministic bin centers (offset 0.5·Δ) — the jitterless
    mode used for reproducible inference."""
    N, R, _ = ray_origins.shape
    S = depth_resolution

    def jitter(shape, delta):
        if rng is None:
            return 0.5 * delta
        return jax.random.uniform(rng, shape, jnp.float32) * delta

    if disparity_space_sampling:
        depths = jnp.linspace(0.0, 1.0, S, dtype=jnp.float32).reshape(1, 1, S, 1)
        depths = jnp.tile(depths, (N, R, 1, 1))
        delta = 1.0 / (S - 1)
        depths = depths + jitter((N, R, S, 1), delta)
        return 1.0 / (1.0 / ray_start * (1.0 - depths) + 1.0 / ray_end * depths)

    if isinstance(ray_start, jax.Array) and ray_start.ndim > 0:
        # Per-ray tensor bounds (the 'auto' ray-box path, renderer.py:183-186).
        depths = math_utils.linspace_batch(ray_start, ray_end, S)  # (S, N, R, 1)
        depths = depths.transpose(1, 2, 0, 3)  # (N, R, S, 1)
        delta = (ray_end - ray_start) / (S - 1)  # (N, R, 1)
        return depths + jitter(depths.shape, delta[..., None, :])

    depths = jnp.linspace(float(ray_start), float(ray_end), S, dtype=jnp.float32)
    depths = jnp.tile(depths.reshape(1, 1, S, 1), (N, R, 1, 1))
    delta = (ray_end - ray_start) / (S - 1)
    return depths + jitter((N, R, S, 1), delta)


def _smooth_weights(weights: jax.Array) -> jax.Array:
    """max-pool(2,1,pad1) → avg-pool(2,1) + 0.01 (ref: renderer.py:205-207)."""
    neg_inf = jnp.asarray(-jnp.inf, weights.dtype)
    padded = jnp.concatenate(
        [jnp.full(weights.shape[:-1] + (1,), neg_inf), weights,
         jnp.full(weights.shape[:-1] + (1,), neg_inf)], axis=-1
    )
    maxed = jnp.maximum(padded[..., :-1], padded[..., 1:])  # length L+1
    avg = (maxed[..., :-1] + maxed[..., 1:]) / 2  # length L
    return avg + 0.01


def sample_pdf(rng: Optional[jax.Array], bins: jax.Array, weights: jax.Array,
               n_importance: int, eps: float = 1e-5) -> jax.Array:
    """Inverse-CDF sampling (ref: renderer.py:214-253). bins (N, S+1),
    weights (N, S) → samples (N, n_importance). rng=None → deterministic
    uniform spacing (ref det=True)."""
    N, S = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, S+1)

    if rng is None:
        u = jnp.tile(jnp.linspace(0.0, 1.0, n_importance, dtype=jnp.float32)[None], (N, 1))
    else:
        # SORTED uniforms via exponential spacings (order statistics of
        # U(0,1) — distributionally identical to the reference's unsorted
        # draw, renderer.py:237). CDF inversion is monotone, so the fine
        # depths come out sorted per ray, which lets unify_samples merge two
        # sorted lists with a rank computation instead of a full sort.
        e = -jnp.log(1.0 - jax.random.uniform(rng, (N, n_importance + 1), jnp.float32))
        s = jnp.cumsum(e, axis=-1)
        u = s[:, :-1] / s[:, -1:]

    # searchsorted(right) as a comparison count — static S keeps this one
    # fused VPU reduction instead of a gather-heavy binary search.
    inds = jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1)
    below = jnp.clip(inds - 1, 0, None)
    above = jnp.clip(inds, None, S)

    # One-hot masked sums instead of take_along_axis: XLA's TPU gather for
    # these (N, S)-by-(N, n_imp) lookups runs at ~1.5 GB/s (measured 2 ms
    # each, 4 gathers ≈ 7 ms/frame); the comparison+reduce fuses on the VPU
    # and costs ~0.1 ms. S is small and static, so the sweep is cheap.
    # Indices are clipped to each table's width — take_along_axis's default
    # 'clip' mode, which the `above` path relies on for `bins`.
    def select_cols(table, idx):
        width = table.shape[1]
        iota = jnp.arange(width, dtype=jnp.int32)
        eq = iota[None, None, :] == jnp.minimum(idx, width - 1)[:, :, None]
        return jnp.sum(jnp.where(eq, table[:, None, :], 0.0), axis=-1)

    cdf_lo = select_cols(cdf, below)
    cdf_hi = select_cols(cdf, above)
    bins_lo = select_cols(bins, below)
    bins_hi = select_cols(bins, above)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)


def sample_importance(rng: Optional[jax.Array], z_vals: jax.Array, weights: jax.Array,
                      n_importance: int) -> jax.Array:
    """(B, R, S, 1) depths + (B, R, S-1, 1) marcher weights →
    (B, R, n_importance, 1) resampled depths (ref: renderer.py:194-212)."""
    B, R, S, _ = z_vals.shape
    z_flat = jax.lax.stop_gradient(z_vals).reshape(B * R, S)
    w_flat = jax.lax.stop_gradient(weights).reshape(B * R, -1)

    w_smooth = _smooth_weights(w_flat)
    z_mid = 0.5 * (z_flat[:, :-1] + z_flat[:, 1:])
    samples = sample_pdf(rng, z_mid, w_smooth[:, 1:-1], n_importance)
    return samples.reshape(B, R, n_importance, 1)


def unify_samples(depths1, depths2, *value_pairs, assume_sorted: bool = True):
    """Depth-merge coarse+fine samples with their payloads
    (ref: renderer.py:288-300, there an argsort + 4 gathers).

    TPU path (assume_sorted): both inputs are per-ray sorted (stratified
    depths are monotone by construction; importance depths since sample_pdf
    draws sorted uniforms), so the merged position of every element is its
    own index plus a cross-list comparison count — and the permutation
    applies as ONE one-hot matmul over the concatenated payloads, replacing
    the sort + gathers that otherwise dominate the render (measured ~30 ms
    per frame as XLA sort/gather, ~2 ms as an MXU contraction).
    """
    if not assume_sorted:
        all_depths = jnp.concatenate([depths1, depths2], axis=-2)
        order = jnp.argsort(all_depths, axis=-2)
        sorted_depths = jnp.take_along_axis(all_depths, order, axis=-2)
        outs = []
        for v1, v2 in value_pairs:
            v = jnp.concatenate([v1, v2], axis=-2)
            outs.append(jnp.take_along_axis(v, order, axis=-2))
        return (sorted_depths, *outs)

    d1 = depths1[..., 0]  # (B, R, S1)
    d2 = depths2[..., 0]  # (B, R, S2)
    S1 = d1.shape[-1]
    S2 = d2.shape[-1]
    S = S1 + S2
    # merged rank of every element: own index + count of strictly-smaller
    # (resp. ≤) elements in the other list — ties put list-1 first.
    less = d2[..., None, :] < d1[..., :, None]          # (B, R, S1, S2)
    rank1 = jnp.arange(S1) + jnp.sum(less, axis=-1)      # (B, R, S1)
    leq = d1[..., None, :] <= d2[..., :, None]           # (B, R, S2, S1)
    rank2 = jnp.arange(S2) + jnp.sum(leq, axis=-1)       # (B, R, S2)
    ranks = jnp.concatenate([rank1, rank2], axis=-1)     # (B, R, S)

    # permutation one-hot: P[out, in] = (out == ranks[in])
    out_pos = jnp.arange(S)
    P = (out_pos[:, None] == ranks[..., None, :]).astype(jnp.float32)  # (B,R,S,S)

    values = [jnp.concatenate([depths1, depths2], axis=-2)]
    values += [jnp.concatenate([v1, v2], axis=-2) for v1, v2 in value_pairs]
    widths = [v.shape[-1] for v in values]
    packed = jnp.concatenate(values, axis=-1)            # (B, R, S, ΣC)
    # HIGHEST keeps f32 depths exact through the MXU (deltas between
    # adjacent samples are ~1e-2 — bf16 passes would destroy them).
    merged = jnp.einsum("brij,brjc->bric", P, packed,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    outs = []
    off = 0
    for w in widths:
        outs.append(merged[..., off:off + w])
        off += w
    return tuple(outs)


def _pullback_u(d1, dens1, d2, dens2, *, use_kernel: bool = False):
    """Merged-marcher weights pulled back to input order (the math core of
    `composite_two_pass` — see its docstring). d*/dens*: (B, R, S*) sorted
    depths / raw densities. Returns (u (B, R, S1+S2), wt (B, R, 1))."""
    S1 = d1.shape[-1]
    S2 = d2.shape[-1]
    S = S1 + S2
    d_all = jnp.concatenate([d1, d2], axis=-1)              # (B, R, S)

    if use_kernel:
        # VMEM merge+march Pallas kernel (ops/composite_kernel.py): same
        # ranks/marcher math with rays on lanes — no (B,R,S,S) one-hot in
        # HBM. Differentiable w.r.t. densities (mirrored backward kernel);
        # depth grads are zero by design (callers stop-gradient depths).
        from ..ops.composite_kernel import pullback_weights

        u = pullback_weights(d1, dens1, d2, dens2)
        return u, jnp.sum(u, axis=-1, keepdims=True)        # Σu = Σw

    # merged rank of every input element (ties put list-1 first)
    less = d2[..., None, :] < d1[..., :, None]
    rank1 = jnp.arange(S1) + jnp.sum(less, axis=-1)
    leq = d1[..., None, :] <= d2[..., :, None]
    rank2 = jnp.arange(S2) + jnp.sum(leq, axis=-1)
    ranks = jnp.concatenate([rank1, rank2], axis=-1)        # (B, R, S)
    out_pos = jnp.arange(S)
    eq = out_pos[..., :, None] == ranks[..., None, :]       # (B, R, S out, S in)

    # 1-channel merges (compare-select reduces — no payload traffic)
    s_all = jnp.concatenate([dens1, dens2], axis=-1)
    m_d = jnp.sum(jnp.where(eq, d_all[..., None, :], 0.0), axis=-1)
    m_s = jnp.sum(jnp.where(eq, s_all[..., None, :], 0.0), axis=-1)

    # marcher weights in merged space (ref ray_marcher.py:26-45 semantics)
    deltas = m_d[..., 1:] - m_d[..., :-1]
    sigma_mid = jax.nn.softplus((m_s[..., :-1] + m_s[..., 1:]) * 0.5 - 1)
    alpha = 1 - jnp.exp(-sigma_mid * deltas)                # (B, R, S-1)
    logs = jnp.log(1.0 - alpha + 1e-10)
    T = jnp.exp(jnp.cumsum(logs, axis=-1) - logs)           # exclusive
    w = alpha * T                                           # (B, R, S-1)
    wt = jnp.sum(w, axis=-1, keepdims=True)                 # (B, R, 1)

    # midpoint-accumulation coefficients c = Aᵀw, pulled back to input
    # order u = Pᵀc (input j contributes 0.5·(w_{r-1}+w_r) at r=rank_j)
    c = 0.5 * (jnp.pad(w, ((0, 0), (0, 0), (0, 1)))
               + jnp.pad(w, ((0, 0), (0, 0), (1, 0))))      # (B, R, S)
    u = jnp.sum(jnp.where(eq, c[..., :, None], 0.0), axis=-2)
    return u, wt


def composite_two_pass(depths1, depths2, colors, densities, segs=None, *,
                       clamp_mode: str = "softplus", white_back: bool = False,
                       use_kernel: bool = False):
    """Fused coarse+fine merge + ray march WITHOUT permuting the payload —
    the inference fast path replacing unify_samples → seg_mip_ray_marcher.

    Semantically identical to merging the two sorted per-ray sample lists
    (ref renderer.py:288-300) and compositing (ref ray_marcher.py:20-107),
    but exploits that the composite is LINEAR in the per-sample values:

        out_c = Σ_i w_i · mid_i(P·v)_c = Σ_j (Pᵀ Aᵀ w)_j · v_{j,c}

    so only the 1-channel quantities (depth, σ) are merged to compute the
    marcher weights w, which are then pulled back through the permutation
    (u = PᵀAᵀw) and applied directly to the UNMERGED coarse/fine tensors.
    This removes the (B,R,S,ΣC) payload concat+permute (~2.5 ms/frame and
    the dominant HBM cost of the non-kernel render, HLO-profiled r3).

    depths1/2: (B, R, S1/S2, 1) per-ray sorted; colors/densities/segs:
    pairs of (B, R, S*, C) tensors. Returns (rgb, seg|None, depth, wsum).
    """
    assert clamp_mode == "softplus"
    d1 = depths1[..., 0]
    d2 = depths2[..., 0]
    S1 = d1.shape[-1]
    S2 = d2.shape[-1]
    d_all = jnp.concatenate([d1, d2], axis=-1)              # (B, R, S)

    u, wt = _pullback_u(d1, densities[0][..., 0], d2, densities[1][..., 0],
                        use_kernel=use_kernel)
    u1 = u[..., :S1]
    u2 = u[..., S1:]

    def weighted(pair):
        return (jnp.einsum("brs,brsc->brc", u1, pair[0])
                + jnp.einsum("brs,brsc->brc", u2, pair[1]))

    composite_rgb = weighted(colors)
    composite_seg = None if segs is None else weighted(segs)
    composite_depth = (jnp.einsum("brs,brs->br", u, d_all)[..., None] / wt)
    composite_depth = jnp.where(jnp.isnan(composite_depth), jnp.inf,
                                composite_depth)
    composite_depth = jnp.clip(composite_depth, jnp.min(d_all), jnp.max(d_all))

    if white_back:
        composite_rgb = composite_rgb + 1 - wt
    composite_rgb = composite_rgb * 2 - 1
    return composite_rgb, composite_seg, composite_depth, wt


# ---------------------------------------------------------------------------
# Renderer

DecoderFn = Callable[..., Dict[str, jax.Array]]


def run_model(decoder_fn: DecoderFn, decoder_params, norm_planes, denorm_planes,
              coordinates, cfg: RenderingConfig,
              rng: Optional[jax.Array] = None,
              plane_stats: Optional[Tuple[jax.Array, jax.Array]] = None,
              ray_shape: Optional[Tuple[int, int, int]] = None,
              coherent: Optional[bool] = None,
              canvas: Optional[jax.Array] = None,
              fused_decoder: bool = False,
              tiled_payload: bool = False,
              coords_transposed: bool = False,
              ) -> Dict[str, jax.Array]:
    """Sample both plane sets at `coordinates` and decode
    (ref: renderer.py:259-287). For the non-disentangled path pass
    norm_planes=None and a decoder_fn taking a single feature tensor.

    Fast path: when `plane_stats=(mean, var)` (each (N, 3, C)) is given and
    denorm = norm·var + mean (true for every real caller — synthesis and
    decode derive denorm affinely, ref triplane.py:66-68), sample ONLY the
    normalized planes and rematerialize the denormalized samples as
    σ·s + μ·wsum — halving the dominant sampling cost (SURVEY §7).
    """
    if plane_stats is not None and norm_planes is not None and (
            jax.default_backend() in ("tpu", "axon")):
        from ..ops.triplane_kernel import triplane_sample

        N, n_planes, C, H, W = norm_planes.shape
        hwc = norm_planes.reshape(N * n_planes, C, H, W).transpose(0, 2, 3, 1)
        if (fused_decoder and N == 1 and ray_shape is not None
                and "geo_net" in decoder_params and cfg.density_noise == 0):
            # serving fast path: sampling + plane mean + decoder MLPs in one
            # Pallas kernel (INFERENCE ONLY — plane grads are stopped).
            from ..ops.triplane_kernel import triplane_sample_decode

            return triplane_sample_decode(
                hwc, coordinates, decoder_params, plane_stats,
                box_warp=cfg.box_warp, ray_shape=ray_shape,
                lr_multiplier=cfg.decoder_lr_mul, canvas=canvas,
                return_tiled=tiled_payload,
                coords_transposed=coords_transposed)
        if coords_transposed:
            # the decomposed paths below consume the points-major layout
            coordinates = coordinates.transpose(0, 2, 1)
        M = coordinates.shape[1]
        samples, wsum = triplane_sample(hwc, coordinates, box_warp=cfg.box_warp,
                                        ray_shape=ray_shape, coherent=coherent,
                                        canvas=canvas)
        sampled_norm = samples.reshape(N, n_planes, M, C)
        mean, var = plane_stats  # (N, 3, C)
        sampled_denorm = (
            sampled_norm * var[:, :, None, :]
            + mean[:, :, None, :] * wsum.reshape(N, n_planes, M, 1)
        )
        out = decoder_fn(decoder_params, sampled_norm, sampled_denorm)
        if cfg.density_noise > 0:
            assert rng is not None
            out = dict(out)
            out["sigma"] = out["sigma"] + (
                jax.random.normal(rng, out["sigma"].shape, out["sigma"].dtype)
                * cfg.density_noise)
        return out

    if coords_transposed:
        coordinates = coordinates.transpose(0, 2, 1)
    if plane_stats is not None and denorm_planes is None:
        # CPU fallback: materialize the denormalized planes once.
        mean, var = plane_stats
        denorm_planes = (norm_planes * var[:, :, :, None, None]
                         + mean[:, :, :, None, None])

    sampled_denorm = sample_planes(denorm_planes, coordinates, cfg.box_warp,
                                   ray_shape=ray_shape)
    if norm_planes is None:
        out = decoder_fn(decoder_params, sampled_denorm)
    else:
        sampled_norm = sample_planes(norm_planes, coordinates, cfg.box_warp,
                                     ray_shape=ray_shape)
        out = decoder_fn(decoder_params, sampled_norm, sampled_denorm)
    if cfg.density_noise > 0:
        assert rng is not None
        out = dict(out)
        out["sigma"] = out["sigma"] + (
            jax.random.normal(rng, out["sigma"].shape, out["sigma"].dtype) * cfg.density_noise
        )
    return out


def _kernel_backend_ok() -> bool:
    """Gate for the Pallas composite/importance kernels (tests monkeypatch
    this to exercise the kernel wiring in interpret mode on CPU)."""
    return jax.default_backend() in ("tpu", "axon")


def _ray_bounds(ray_origins, ray_directions, cfg: RenderingConfig):
    if not cfg.ray_auto:
        return cfg.ray_start, cfg.ray_end
    t0, t1 = math_utils.get_ray_limits_box(ray_origins, ray_directions, cfg.box_warp)
    valid = t1 > t0
    big = jnp.asarray(jnp.inf, t0.dtype)
    vmin = jnp.min(jnp.where(valid, t0, big))
    vmax = jnp.max(jnp.where(valid, t0, -big))
    any_valid = jnp.any(valid)
    # Invalid rays collapse to the [min, max] of valid ray STARTS — a ref
    # quirk preserved verbatim (renderer.py:93-96).
    t0 = jnp.where(valid, t0, jnp.where(any_valid, vmin, t0))
    t1 = jnp.where(valid, t1, jnp.where(any_valid, vmax, t1))
    return t0, t1


def render_rays(decoder_fn: DecoderFn, decoder_params, norm_planes, denorm_planes,
                ray_origins, ray_directions, cfg: RenderingConfig,
                rng: Optional[jax.Array] = None,
                with_seg: bool = True,
                plane_stats: Optional[Tuple[jax.Array, jax.Array]] = None,
                ray_grid: Optional[Tuple[int, int]] = None,
                coherent: Optional[bool] = None,
                fused_decoder: bool = False,
                canvas: Optional[jax.Array] = None):
    """Full two-pass hierarchical render (ref: renderer.py:301-363 /
    82-140).

    ray_grid: explicit (rows, cols) pixel-grid layout of the ray axis for
    the windowed kernel's coherence tiling. Defaults to the square grid
    inferred from R; multi-frame batched renders (editing.api.decode_frames
    stacks F frames' rays) pass (F·res, res).

    Returns (rgb_final, seg_final|None, depth_final, weight_sum), with
    rgb (B,R,C), seg (B,R,K), depth (B,R,1).
    """
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4
    B, R, _ = ray_origins.shape
    S = cfg.depth_resolution

    # Window canvas: built ONCE per render — both passes (and every frame of
    # a batched orbit) sample the same planes; the per-call build was ~1 GB
    # of HBM traffic per frame (HLO-profiled, r2). Callers rendering many
    # frames against the same planes pass a prebuilt canvas instead.
    if canvas is None and (plane_stats is not None and norm_planes is not None
            and jax.default_backend() in ("tpu", "axon")):
        from ..ops.triplane_kernel import build_plane_canvas

        N_, n_planes_, C_, H_, W_ = norm_planes.shape
        hwc_ = norm_planes.reshape(N_ * n_planes_, C_, H_, W_).transpose(0, 2, 3, 1)
        canvas = build_plane_canvas(hwc_)

    ray_start, ray_end = _ray_bounds(ray_origins, ray_directions, cfg)
    depths_coarse = sample_stratified(
        rngs[0], ray_origins, ray_start, ray_end, S, cfg.disparity_space_sampling
    )

    # Static (rh, rw, S) layout hint for the windowed Pallas fast path —
    # render rays are row-major over a pixel grid.
    if ray_grid is not None:
        assert ray_grid[0] * ray_grid[1] == R, (ray_grid, R)
    else:
        res = int(round(R ** 0.5))
        ray_grid = (res, res) if res * res == R else None

    import os as _os

    # Transposed (channels-major) coords for the serving fast path: the
    # (B, M, 3) construction chain materializes minor-dim-3 tensors that
    # XLA relayouts at full-tile cost (~1.1 ms/frame, profile_w4.log); the
    # (B, 3, M) chain is elementwise in the layout the sampler natively
    # consumes. DEFAULT ON since r5 wave-1: 97.5 vs 92.8 fps alone, 109.0
    # combined with the static composite kernel (runs/hw_r5/wave1.log).
    _coords_t = (rng is None and fused_decoder
                 and _os.environ.get("NFE_COORDS_T", "1") == "1")

    def _coords_of(depths):
        S_ = depths.shape[2]
        if _coords_t:
            o_t = ray_origins.transpose(0, 2, 1)        # (B, 3, R)
            d_t = ray_directions.transpose(0, 2, 1)
            dep = depths[..., 0][:, None]               # (B, 1, R, S)
            ct = o_t[:, :, :, None] + d_t[:, :, :, None] * dep
            return ct.reshape(B, 3, R * S_)
        return (ray_origins[:, :, None]
                + depths * ray_directions[:, :, None]).reshape(B, -1, 3)

    @partial(jax.checkpoint, static_argnums=())
    def _eval_coords(decoder_params_, norm_planes_, denorm_planes_, depths, rng_eval):
        # Rematerialized in the backward pass: the per-point plane samples
        # (B·R·S·32 floats per plane set) are the largest residuals of the
        # whole training step — recomputing the sampling kernel is far
        # cheaper than holding them in HBM (SURVEY §7: jax.checkpoint to
        # trade FLOPs for memory).
        coords = _coords_of(depths)
        rs = (ray_grid[0], ray_grid[1], depths.shape[2]) if ray_grid is not None else None
        out = run_model(decoder_fn, decoder_params_, norm_planes_, denorm_planes_,
                        coords, cfg, rng_eval, plane_stats=plane_stats,
                        ray_shape=rs, coherent=coherent, canvas=canvas,
                        fused_decoder=fused_decoder,
                        coords_transposed=_coords_t)
        return out["rgb"], out["sigma"], out.get("seg")

    def eval_at(depths, rng_eval):
        S_ = depths.shape[2]
        rgb, sigma, seg = _eval_coords(decoder_params, norm_planes,
                                       denorm_planes, depths, rng_eval)
        colors = rgb.reshape(B, R, S_, -1)
        densities = sigma.reshape(B, R, S_, 1)
        segs = None if seg is None else seg.reshape(B, R, S_, -1)
        return colors, densities, segs

    # Tiled-composite serving path (NFE_TILED_COMPOSITE=1): the fused-decode
    # payload stays in tile order and the pull-back coefficients are
    # contracted there (ops.triplane_kernel.composite_payload_tiled) — the
    # (M, OUT) untile permute never runs. Inference-only; requires the
    # fused kernel's own gate conditions, mirrored here so a declined gate
    # falls through to the standard path instead of decoding twice.
    _tiled_ok = (rng is None and fused_decoder and ray_grid is not None
                 and plane_stats is not None and norm_planes is not None
                 and B == 1 and cfg.density_noise == 0
                 and isinstance(decoder_params, dict)
                 and "geo_net" in decoder_params
                 and cfg.depth_resolution_importance > 0
                 and _kernel_backend_ok()
                 and _os.environ.get("NFE_MERGE_PULLBACK", "1") == "1"
                 # "1" = XLA contraction (r4: compile-hangs at f128);
                 # "2" = static-schedule Pallas composite kernel
                 # (ops.triplane_kernel._composite_static_kernel) —
                 # DEFAULT since r5 wave-1: 102.6 fps alone, 109.0 with
                 # coords_t, vs 92.8 (runs/hw_r5/wave1.log); "0" restores
                 # the untiled fused path
                 and _os.environ.get("NFE_TILED_COMPOSITE", "2") in ("1", "2"))
    if _tiled_ok:
        from ..ops.triplane_kernel import (_parked_gate,
                                           composite_payload_tiled)

        if _os.environ.get("NFE_TILED_COMPOSITE") == "1":
            _parked_gate("NFE_TILED_COMPOSITE=1")

        def eval_tiled(depths):
            S_ = depths.shape[2]
            coords = _coords_of(depths)
            rs = (ray_grid[0], ray_grid[1], S_)
            out = run_model(decoder_fn, decoder_params, norm_planes,
                            denorm_planes, coords, cfg, None,
                            plane_stats=plane_stats, ray_shape=rs,
                            coherent=coherent, canvas=canvas,
                            fused_decoder=True, tiled_payload=True,
                            coords_transposed=_coords_t)
            return out, out["sigma"].reshape(B, R, S_, 1), rs

        out_c, densities_c, rs_c = eval_tiled(depths_coarse)
        if "tiled" in out_c:
            serve_kernel = (_kernel_backend_ok() and _os.environ.get(
                "NFE_COMPOSITE_KERNEL", "0") == "1")
            N_imp_t = cfg.depth_resolution_importance
            if serve_kernel:
                from ..ops.composite_kernel import importance_depths

                depths_fine = importance_depths(
                    depths_coarse[..., 0], densities_c[..., 0],
                    N_imp_t)[..., None]
            else:
                weights = march_weights(densities_c, depths_coarse,
                                        clamp_mode=cfg.clamp_mode)
                depths_fine = sample_importance(rngs[2], depths_coarse,
                                                weights, N_imp_t)
            out_f, densities_f, rs_f = eval_tiled(depths_fine)
            u, wt = _pullback_u(depths_coarse[..., 0], densities_c[..., 0],
                                depths_fine[..., 0], densities_f[..., 0],
                                use_kernel=serve_kernel)
            S1 = depths_coarse.shape[2]
            pay = (composite_payload_tiled(out_c["tiled"], u[..., :S1], rs_c)
                   + composite_payload_tiled(out_f["tiled"], u[..., S1:],
                                             rs_f))
            seg_dim = out_c["seg_dim"]
            rgb = pay[..., 1 + seg_dim:]
            seg = pay[..., 1:1 + seg_dim] if with_seg else None
            d_all = jnp.concatenate([depths_coarse[..., 0],
                                     depths_fine[..., 0]], axis=-1)
            depth = jnp.einsum("brs,brs->br", u, d_all)[..., None] / wt
            depth = jnp.where(jnp.isnan(depth), jnp.inf, depth)
            depth = jnp.clip(depth, jnp.min(d_all), jnp.max(d_all))
            if cfg.white_back:
                rgb = rgb + 1 - wt
            rgb = rgb * 2 - 1
            return rgb, seg, depth, wt

    colors_c, densities_c, segs_c = eval_at(depths_coarse, rngs[1])
    use_seg = with_seg and segs_c is not None
    _ck_env = (_kernel_backend_ok()
               and _os.environ.get("NFE_COMPOSITE_KERNEL", "0") == "1")
    _serve_kernels = rng is None and _ck_env
    # Training may opt into the composite kernel too (its custom VJP handles
    # the density gradients); the importance kernel stays serving-only — its
    # inverse-CDF draws are deterministic, training needs the rng draws.
    _train_merge_kernel = (rng is not None and _ck_env and _os.environ.get(
        "NFE_COMPOSITE_KERNEL_TRAIN", "0") == "1")

    N_imp = cfg.depth_resolution_importance
    if N_imp > 0:
        if _serve_kernels or _train_merge_kernel:
            # Fused coarse-post Pallas pass: march → smooth → inverse-CDF
            # in VMEM (ops/composite_kernel.importance_depths). Training
            # passes the order-statistics uniform draw in (identical to
            # sample_pdf's rng path — same key, same shapes).
            from ..ops.composite_kernel import importance_depths

            u = None
            if rng is not None:
                e = -jnp.log(1.0 - jax.random.uniform(
                    rngs[2], (B * R, N_imp + 1), jnp.float32))
                s_cum = jnp.cumsum(e, axis=-1)
                u = (s_cum[:, :-1] / s_cum[:, -1:]).reshape(B, R, N_imp)
            depths_fine = importance_depths(
                depths_coarse[..., 0], densities_c[..., 0], N_imp,
                u=u)[..., None]
        else:
            # Weights-only marcher: the coarse composite is discarded when a
            # fine pass follows (ref renderer.py:320-323 uses only `weights`
            # here), so skip the rgb/seg/depth payload contractions entirely.
            weights = march_weights(densities_c, depths_coarse,
                                    clamp_mode=cfg.clamp_mode)
            depths_fine = sample_importance(rngs[2], depths_coarse, weights,
                                            N_imp)
        colors_f, densities_f, segs_f = eval_at(depths_fine, rngs[3])

        # Fused merge+march via the weight pull-back (composite_two_pass) —
        # merges only depth/σ, never the payload. Valid in BOTH modes:
        # stratified depths are monotone by construction and sample_pdf
        # draws sorted uniforms, so each list is per-ray sorted with or
        # without rng. Training additionally wraps it in jax.checkpoint so
        # the (B,R,S,S) rank comparisons are recomputed in the backward
        # pass instead of living in HBM (VERDICT r1 weak #7); the argsort
        # path below is kept as the assume-nothing fallback.
        # NFE_MERGE_PULLBACK=0 falls back to the r2 unify+marcher merge —
        # kept as a bisect/A-B switch for the pull-back path.
        merge_fast = _os.environ.get("NFE_MERGE_PULLBACK", "1") == "1"
        if merge_fast:
            # NFE_COMPOSITE_KERNEL=1: VMEM Pallas merge+march. Training
            # defaults to the XLA path under jax.checkpoint; with
            # NFE_COMPOSITE_KERNEL_TRAIN=1 it uses the kernel instead (no
            # checkpoint wrapper needed — the backward kernel recomputes the
            # merged state itself from the tiny per-ray lists).
            merge_kernel = _serve_kernels or _train_merge_kernel
            fn = partial(composite_two_pass, clamp_mode=cfg.clamp_mode,
                         white_back=cfg.white_back, use_kernel=merge_kernel)
            if rng is not None and not merge_kernel:
                fn = jax.checkpoint(fn)
            rgb, seg, depth, wsum = fn(
                depths_coarse, depths_fine, (colors_c, colors_f),
                (densities_c, densities_f),
                (segs_c, segs_f) if use_seg else None)
            return rgb, seg, depth, wsum
        if use_seg:
            all_depths, all_colors, all_densities, all_segs = unify_samples(
                depths_coarse, depths_fine,
                (colors_c, colors_f), (densities_c, densities_f), (segs_c, segs_f),
                assume_sorted=rng is None)
            rgb, seg, depth, weights = seg_mip_ray_marcher(
                all_colors, all_segs, all_densities, all_depths,
                clamp_mode=cfg.clamp_mode, white_back=cfg.white_back)
        else:
            all_depths, all_colors, all_densities = unify_samples(
                depths_coarse, depths_fine,
                (colors_c, colors_f), (densities_c, densities_f),
                assume_sorted=rng is None)
            rgb, depth, weights = mip_ray_marcher(
                all_colors, all_densities, all_depths,
                clamp_mode=cfg.clamp_mode, white_back=cfg.white_back)
            seg = None
    else:
        if use_seg:
            rgb, seg, depth, weights = seg_mip_ray_marcher(
                colors_c, segs_c, densities_c, depths_coarse,
                clamp_mode=cfg.clamp_mode, white_back=cfg.white_back)
        else:
            rgb, depth, weights = mip_ray_marcher(
                colors_c, densities_c, depths_coarse,
                clamp_mode=cfg.clamp_mode, white_back=cfg.white_back)
            seg = None

    return rgb, seg, depth, jnp.sum(weights, axis=2)
