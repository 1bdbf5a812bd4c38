"""Pallas merge+march pull-back kernel — the coarse+fine composite's weight
computation in one VMEM pass.

`render.renderer.composite_two_pass` reduced the two-pass composite to a
LINEAR contraction against the unmerged payloads: only the pull-back weights
u = PᵀAᵀw depend on the merged sample order (ref renderer.py:288-300 merge +
ray_marcher.py:20-107 march semantics). Its XLA form still materializes the
(B, R, S, S) rank one-hot and runs three masked reduces plus pad copies over
it (~1.5 ms/frame HBM-bound at the serving shapes, docs/PERF.md r2). This
kernel computes u entirely in VMEM with rays on the LANE axis:

  * ranks by comparison count (list-1-first ties — bit-exact with the XLA
    rank path): 2·S/2 broadcast compares over (S/2, lanes) tiles;
  * merged depth/σ via a rank-indexed scatter into a (S, lanes) scratch
    (dynamic single-row stores, fori_loop — no one-hot matrices);
  * transmittance as an exclusive log-cumsum (Hillis–Steele over the static
    sublane axis — log2(S) shift-adds, the same parallel-prefix trick as
    ray_marcher.py);
  * pull-back u[j] = c[rank_j] via a dynamic-row gather accumulate.

Serving-path only (inference): `composite_two_pass(use_kernel=True)` routes
here; training keeps the XLA path under jax.checkpoint (recomputed ranks).
Opt-in via NFE_COMPOSITE_KERNEL until measured on hardware, like the
resident-canvas variant (ops/triplane_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_LANE_BLOCK = 2048


def _pullback_kernel(d1_ref, s1_ref, d2_ref, s2_ref, u_ref, md_ref, ms_ref, *,
                     S1: int, S2: int):
    """One (batch, ray-block) grid cell.

    d1/s1: (1, S1, L) depths/σ of the per-ray sorted coarse list;
    d2/s2: (1, S2, L) the (sorted) fine list; u: (1, S1+S2, L) out;
    md/ms: (S, L) f32 VMEM scratch for the merged depth/σ lists.
    """
    S = S1 + S2
    d1 = d1_ref[0]                                  # (S1, L)
    d2 = d2_ref[0]                                  # (S2, L)
    L = d1.shape[1]

    # merged rank of every input: own index + count in the other list
    # (ties put list-1 first — `<` vs `<=`, renderer.composite_two_pass).
    # Row selection is a masked max (value-level dynamic_slice does not
    # lower in Mosaic — only ref indexing may be dynamic).
    iota1 = lax.broadcasted_iota(jnp.int32, (S1, L), 0)
    iota2 = lax.broadcasted_iota(jnp.int32, (S2, L), 0)
    neg = jnp.float32(-jnp.inf)

    def count1(j, acc):
        row = jnp.max(jnp.where(iota2 == j, d2, neg), axis=0, keepdims=True)
        return acc + (row < d1).astype(jnp.int32)

    def count2(j, acc):
        row = jnp.max(jnp.where(iota1 == j, d1, neg), axis=0, keepdims=True)
        return acc + (row <= d2).astype(jnp.int32)

    rank1 = iota1 + lax.fori_loop(0, S2, count1, jnp.zeros((S1, L), jnp.int32))
    rank2 = iota2 + lax.fori_loop(0, S1, count2, jnp.zeros((S2, L), jnp.int32))
    ranks = jnp.concatenate([rank1, rank2], axis=0)  # (S, L)

    d_all = jnp.concatenate([d1, d2], axis=0)
    s_all = jnp.concatenate([s1_ref[0], s2_ref[0]], axis=0)

    # scatter to merged order: row r of md/ms = the input whose rank is r
    # (ranks is a per-ray permutation, so each masked sum hits exactly one).
    def scatter(r, _):
        m = ranks == r
        md_ref[pl.ds(r, 1), :] = jnp.sum(jnp.where(m, d_all, 0.0), axis=0,
                                         keepdims=True)
        ms_ref[pl.ds(r, 1), :] = jnp.sum(jnp.where(m, s_all, 0.0), axis=0,
                                         keepdims=True)
        return _

    lax.fori_loop(0, S, scatter, None)

    m_d = md_ref[...]                                # (S, L)
    m_s = ms_ref[...]

    # march in merged space (ray_marcher.py semantics: softplus(σ−1) midpoint
    # quadrature, exclusive log-cumsum transmittance).
    deltas = m_d[1:] - m_d[:-1]                      # (S-1, L)
    sig_mid = jax.nn.softplus((m_s[:-1] + m_s[1:]) * 0.5 - 1.0)
    alpha = 1.0 - jnp.exp(-sig_mid * deltas)
    logs = jnp.log(1.0 - alpha + 1e-10)

    # inclusive prefix over the (static) sublane axis: Hillis–Steele —
    # shift-down-by-k + add, k = 1, 2, 4, ... (zeros shifted in at the top).
    acc = logs
    k = 1
    while k < S - 1:
        acc = acc + jnp.concatenate(
            [jnp.zeros((k, L), jnp.float32), acc[:-k]], axis=0)
        k *= 2
    t_excl = jnp.exp(acc - logs)                     # T at each segment
    w = alpha * t_excl                               # (S-1, L)

    # midpoint coefficients c_r = 0.5 (w_{r-1} + w_r), w_{-1} = w_{S-1} = 0
    zero_row = jnp.zeros((1, L), jnp.float32)
    c = 0.5 * (jnp.concatenate([zero_row, w], axis=0)
               + jnp.concatenate([w, zero_row], axis=0))  # (S, L)
    ms_ref[...] = c                                  # reuse scratch as c table

    # pull back to input order: u[j] = c[rank_j] (dynamic-row gather).
    def gather(r, acc_u):
        return acc_u + jnp.where(ranks == r, ms_ref[pl.ds(r, 1), :], 0.0)

    u_ref[0] = lax.fori_loop(0, S, gather, jnp.zeros((S, L), jnp.float32))


def _importance_kernel(d_ref, s_ref, u_ref, out_ref, *, S: int, n_imp: int,
                       det: bool):
    """One (batch, ray-block) grid cell of the fused coarse-post pass:
    marcher weights → _smooth_weights → inverse-CDF draws.

    d/s: (1, S, L) sorted coarse depths / raw σ; u: (1, n_imp, L) PER-RAY
    SORTED uniforms in [0,1] (training's order-statistics draw happens
    outside; det=True ignores u and uses linspace(0,1,n_imp) — the rng=None
    serving path, ref renderer.py:214-253); out: (1, n_imp, L) fine depths.
    Replicates render.renderer.{march_weights → sample_importance}."""
    d = d_ref[0]                                     # (S, L)
    s = s_ref[0]
    L = d.shape[1]

    # marcher weights (ray_marcher.march_weights semantics)
    deltas = d[1:] - d[:-1]
    sig_mid = jax.nn.softplus((s[:-1] + s[1:]) * 0.5 - 1.0)
    alpha = 1.0 - jnp.exp(-sig_mid * deltas)
    logs = jnp.log(1.0 - alpha + 1e-10)
    acc = logs
    k = 1
    while k < S - 1:
        acc = acc + jnp.concatenate(
            [jnp.zeros((k, L), jnp.float32), acc[:-k]], axis=0)
        k *= 2
    w = alpha * jnp.exp(acc - logs)                  # (S-1, L)

    # smooth: ±inf-pad maxpool(2) → avgpool(2) + 0.01 (renderer.py:205-207)
    neg_inf = jnp.full((1, L), -jnp.inf, jnp.float32)
    wpad = jnp.concatenate([neg_inf, w, neg_inf], axis=0)   # (S+1, L)
    maxed = jnp.maximum(wpad[:-1], wpad[1:])                # (S, L)
    wsm = (maxed[:-1] + maxed[1:]) * 0.5 + 0.01             # (S-1, L)

    bins = (d[:-1] + d[1:]) * 0.5                    # (S-1, L) z_mid
    pw = wsm[1:-1] + 1e-5                            # (S-3, L)
    Sw = S - 3
    pdf = pw / jnp.sum(pw, axis=0, keepdims=True)
    acc2 = pdf
    k = 1
    while k < Sw:
        acc2 = acc2 + jnp.concatenate(
            [jnp.zeros((k, L), jnp.float32), acc2[:-k]], axis=0)
        k *= 2
    cdf = jnp.concatenate([jnp.zeros((1, L), jnp.float32), acc2], axis=0)
    # cdf: (Sw+1, L); bins: (S-1, L)

    iota_c = lax.broadcasted_iota(jnp.int32, (Sw + 1, L), 0)
    iota_b = lax.broadcasted_iota(jnp.int32, (S - 1, L), 0)
    inv = 1.0 / (n_imp - 1)

    def draw(j, _):
        if det:
            u = j.astype(jnp.float32) * inv          # scalar in [0, 1]
        else:
            u = u_ref[0, pl.ds(j, 1), :]             # (1, L) dynamic ref read
        inds = jnp.sum((cdf <= u).astype(jnp.int32), axis=0, keepdims=True)
        below = jnp.maximum(inds - 1, 0)             # (1, L)
        above = jnp.minimum(inds, Sw)
        cdf_lo = jnp.sum(jnp.where(iota_c == below, cdf, 0.0), axis=0,
                         keepdims=True)
        cdf_hi = jnp.sum(jnp.where(iota_c == above, cdf, 0.0), axis=0,
                         keepdims=True)
        bins_lo = jnp.sum(jnp.where(iota_b == below, bins, 0.0), axis=0,
                          keepdims=True)
        bins_hi = jnp.sum(jnp.where(iota_b == above, bins, 0.0), axis=0,
                          keepdims=True)
        denom = cdf_hi - cdf_lo
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        out_ref[0, pl.ds(j, 1), :] = (
            bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo))
        return _

    lax.fori_loop(0, n_imp, draw, None)


@functools.partial(jax.jit, static_argnames=("n_imp", "lane_block",
                                              "interpret"))
def importance_depths(depths_c: jax.Array, densities_c: jax.Array,
                      n_imp: int, *, u: "jax.Array | None" = None,
                      lane_block: int = DEFAULT_LANE_BLOCK,
                      interpret: bool = False) -> jax.Array:
    """Fused importance resampling (the coarse-post pass).

    depths_c/densities_c (B, R, S) sorted coarse samples → (B, R, n_imp)
    fine depths — numerically equal to march_weights → sample_importance.
    u: optional (B, R, n_imp) PER-RAY SORTED uniforms (training's
    order-statistics draw, renderer.sample_pdf rng path); None = the
    deterministic linspace draw (serving, rng=None).
    """
    B, R, S = depths_c.shape
    assert S >= 4 and n_imp >= 2, (S, n_imp)
    Rp = -(-R // 128) * 128
    L = min(lane_block, Rp)
    Rp = -(-Rp // L) * L

    def t(a):
        a = lax.stop_gradient(a).transpose(0, 2, 1)
        if Rp != a.shape[-1]:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, Rp - a.shape[-1])),
                        mode="edge")
        return a

    det = u is None
    u_in = (jnp.zeros((B, n_imp, Rp), jnp.float32) if det else t(u))
    spec = lambda Sx: pl.BlockSpec((1, Sx, L), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_importance_kernel, S=S, n_imp=n_imp, det=det),
        grid=(B, Rp // L),
        in_specs=[spec(S), spec(S), spec(n_imp)],
        out_specs=spec(n_imp),
        out_shape=jax.ShapeDtypeStruct((B, n_imp, Rp), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(t(depths_c), t(densities_c), u_in)
    return out[:, :, :R].transpose(0, 2, 1)          # (B, R, n_imp)


def _pullback_bwd_kernel(d1_ref, s1_ref, d2_ref, s2_ref, du_ref,
                         ds_ref, md_ref, ms_ref, *, S1: int, S2: int):
    """Adjoint of `_pullback_kernel` w.r.t. the DENSITIES (depth cotangents
    are zero by contract — every caller stop-gradients sample depths, ref
    renderer.py:198 importance stop-grad; stratified depths are camera data).

    du: (1, S, L) cotangent of u; ds out: (1, S, L) [dσ1; dσ2].
    md/ms: (S, L) scratch. Recomputes the forward's merged state (cheap —
    the residuals are just the 4 input lists)."""
    S = S1 + S2
    d1 = d1_ref[0]
    d2 = d2_ref[0]
    L = d1.shape[1]

    iota1 = lax.broadcasted_iota(jnp.int32, (S1, L), 0)
    iota2 = lax.broadcasted_iota(jnp.int32, (S2, L), 0)
    neg = jnp.float32(-jnp.inf)

    def count1(j, acc):
        row = jnp.max(jnp.where(iota2 == j, d2, neg), axis=0, keepdims=True)
        return acc + (row < d1).astype(jnp.int32)

    def count2(j, acc):
        row = jnp.max(jnp.where(iota1 == j, d1, neg), axis=0, keepdims=True)
        return acc + (row <= d2).astype(jnp.int32)

    rank1 = iota1 + lax.fori_loop(0, S2, count1, jnp.zeros((S1, L), jnp.int32))
    rank2 = iota2 + lax.fori_loop(0, S1, count2, jnp.zeros((S2, L), jnp.int32))
    ranks = jnp.concatenate([rank1, rank2], axis=0)

    d_all = jnp.concatenate([d1, d2], axis=0)
    s_all = jnp.concatenate([s1_ref[0], s2_ref[0]], axis=0)
    du = du_ref[0]                                    # (S, L) input order

    # scatter inputs AND the u-cotangent into merged order (dc[rank_j]=du_j)
    def scatter(r, _):
        m = ranks == r
        md_ref[pl.ds(r, 1), :] = jnp.sum(jnp.where(m, d_all, 0.0), axis=0,
                                         keepdims=True)
        ms_ref[pl.ds(r, 1), :] = jnp.sum(jnp.where(m, s_all, 0.0), axis=0,
                                         keepdims=True)
        ds_ref[0, pl.ds(r, 1), :] = jnp.sum(jnp.where(m, du, 0.0), axis=0,
                                            keepdims=True)
        return _

    lax.fori_loop(0, S, scatter, None)
    m_d = md_ref[...]
    m_s = ms_ref[...]
    dc = ds_ref[0]                                    # (S, L) merged order

    # recompute forward marcher state
    deltas = m_d[1:] - m_d[:-1]
    pre = (m_s[:-1] + m_s[1:]) * 0.5 - 1.0
    sig_mid = jax.nn.softplus(pre)
    ea = jnp.exp(-sig_mid * deltas)
    alpha = 1.0 - ea
    logs = jnp.log(1.0 - alpha + 1e-10)
    acc = logs
    k = 1
    while k < S - 1:
        acc = acc + jnp.concatenate(
            [jnp.zeros((k, L), jnp.float32), acc[:-k]], axis=0)
        k *= 2
    T = jnp.exp(acc - logs)                           # (S-1, L)

    # adjoints: c = 0.5(w_{r-1}+w_r) → dw[r] = 0.5(dc[r] + dc[r+1])
    dw = 0.5 * (dc[:-1] + dc[1:])                     # (S-1, L)
    # w = alpha·T
    dalpha = dw * T
    dT = dw * alpha
    # T_r = exp(Σ_{q<r} logs_q) → dlogs_q = Σ_{r>q} dT_r·T_r (reverse-excl)
    e = dT * T
    racc = e
    k = 1
    while k < S - 1:
        racc = racc + jnp.concatenate(
            [racc[k:], jnp.zeros((k, L), jnp.float32)], axis=0)
        k *= 2
    dlogs = racc - e                                  # exclusive of own row
    # logs = log(1−alpha+1e-10)
    dalpha = dalpha - dlogs / (1.0 - alpha + 1e-10)
    # alpha = 1 − exp(−sig_mid·Δ)
    dsig = dalpha * ea * deltas
    # sig_mid = softplus(pre), pre = 0.5(m_s[r]+m_s[r+1]) − 1
    dpre = dsig * jax.nn.sigmoid(pre) * 0.5           # (S-1, L)
    zero_row = jnp.zeros((1, L), jnp.float32)
    dms = (jnp.concatenate([dpre, zero_row], axis=0)
           + jnp.concatenate([zero_row, dpre], axis=0))  # (S, L) merged

    ms_ref[...] = dms                                 # reuse scratch

    # unscatter to input order: dσ_j = dms[rank_j]
    def gather(r, acc_g):
        return acc_g + jnp.where(ranks == r, ms_ref[pl.ds(r, 1), :], 0.0)

    ds_ref[0] = lax.fori_loop(0, S, gather, jnp.zeros((S, L), jnp.float32))


def _lane_geom(R: int, lane_block: int):
    Rp = -(-R // 128) * 128
    L = min(lane_block, Rp)
    return -(-Rp // L) * L, L


def _to_lanes(a, Rp):
    a = a.transpose(0, 2, 1)
    if Rp != a.shape[-1]:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, Rp - a.shape[-1])), mode="edge")
    return a


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pullback_core(d1, s1, d2, s2, lane_block, interpret):
    return _pullback_fwd_impl(d1, s1, d2, s2, lane_block, interpret)


def _pullback_fwd_impl(d1, s1, d2, s2, lane_block, interpret):
    B, R, S1 = d1.shape
    S2 = d2.shape[-1]
    S = S1 + S2
    Rp, L = _lane_geom(R, lane_block)
    spec = lambda Sx: pl.BlockSpec((1, Sx, L), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM)
    u = pl.pallas_call(
        functools.partial(_pullback_kernel, S1=S1, S2=S2),
        grid=(B, Rp // L),
        in_specs=[spec(S1), spec(S1), spec(S2), spec(S2)],
        out_specs=spec(S),
        out_shape=jax.ShapeDtypeStruct((B, S, Rp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, L), jnp.float32),
                        pltpu.VMEM((S, L), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(_to_lanes(lax.stop_gradient(d1), Rp),
      _to_lanes(lax.stop_gradient(s1), Rp),
      _to_lanes(lax.stop_gradient(d2), Rp),
      _to_lanes(lax.stop_gradient(s2), Rp))
    return u[:, :, :R].transpose(0, 2, 1)            # (B, R, S)


def _pullback_fwd(d1, s1, d2, s2, lane_block, interpret):
    u = _pullback_fwd_impl(d1, s1, d2, s2, lane_block, interpret)
    return u, (d1, s1, d2, s2)


def _pullback_bwd(lane_block, interpret, residuals, du):
    d1, s1, d2, s2 = residuals
    B, R, S1 = d1.shape
    S2 = d2.shape[-1]
    S = S1 + S2
    Rp, L = _lane_geom(R, lane_block)
    du_t = jnp.pad(du.transpose(0, 2, 1), ((0, 0), (0, 0), (0, Rp - R)))
    spec = lambda Sx: pl.BlockSpec((1, Sx, L), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM)
    ds = pl.pallas_call(
        functools.partial(_pullback_bwd_kernel, S1=S1, S2=S2),
        grid=(B, Rp // L),
        in_specs=[spec(S1), spec(S1), spec(S2), spec(S2), spec(S)],
        out_specs=spec(S),
        out_shape=jax.ShapeDtypeStruct((B, S, Rp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, L), jnp.float32),
                        pltpu.VMEM((S, L), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
    )(_to_lanes(d1, Rp), _to_lanes(s1, Rp),
      _to_lanes(d2, Rp), _to_lanes(s2, Rp), du_t)
    ds = ds[:, :, :R].transpose(0, 2, 1)
    return (jnp.zeros_like(d1), ds[..., :S1],
            jnp.zeros_like(d2), ds[..., S1:])


_pullback_core.defvjp(_pullback_fwd, _pullback_bwd)


def pullback_weights(depths1: jax.Array, densities1: jax.Array,
                     depths2: jax.Array, densities2: jax.Array, *,
                     lane_block: int = DEFAULT_LANE_BLOCK,
                     interpret: bool = False) -> jax.Array:
    """Marcher pull-back weights for two per-ray sorted sample lists.

    depths/densities (B, R, S1|S2) → u (B, R, S1+S2) with
    u[..., :S1] / u[..., S1:] the contraction weights for the coarse/fine
    payloads — numerically equal to the u computed inside
    `composite_two_pass` (same rank tie rule, same marcher math).

    Differentiable w.r.t. DENSITIES via a mirrored backward kernel (the
    reverse marcher chain: dc scatter → midpoint dw → reverse-exclusive
    transmittance prefix → softplus-mid adjoint → rank unscatter); depth
    gradients are zero by design (see _pullback_bwd_kernel docstring).
    """
    return _pullback_core(depths1, densities1, depths2, densities2,
                          lane_block, interpret)
