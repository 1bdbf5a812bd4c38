"""Modulated / resampling convolutions for StyleGAN2 on TPU.

Replaces the reference's `conv2d_resample` + `modulated_conv2d`
(ref: torch_utils/ops/conv2d_resample.py:48-160,
training/networks_stylegan2.py:34-91).

Design notes (TPU-first):

* The reference's *fused* path reshapes the batch into grouped convolutions so
  each sample gets its own modulated kernel — a CUDA-ism that defeats XLA's
  MXU tiling. Here modulation always runs as the *unfused* scale-activations
  path (ref networks_stylegan2.py:69-79): scale inputs by styles, run ONE
  large batched conv (MXU-friendly), then scale outputs by the demodulation
  coefficients. The two paths are mathematically identical because the conv
  is linear in its input.

* Up/down-resampling uses `upfirdn2d` (lhs-dilated / strided depthwise convs)
  composed with a plain `lax.conv_general_dilated`. Strides fold the
  downsample into the conv itself; upsampling filters on the input side.

* `jax.grad` differentiates everything (including grad-of-grad for R1), which
  is what conv2d_gradfix exists to provide in the reference
  (ref: torch_utils/ops/conv2d_gradfix.py:37-45).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .precision import get_precision
from .upfirdn import upfirdn2d, _parse_padding, _get_filter_size

# Phase-major fused subpixel conv (NFE_FUSED_PHASE): run the four parity
# convolutions of _up2_subpixel_conv as ONE conv with 4·O output channels by
# embedding each phase kernel at a per-phase tap offset inside a common
# window. The MXU then emits the phase-concatenated tensor directly — the
# channel concat (HLO-profiled as full-size pads, ~0.3 ms/frame at the
# serving config) disappears. Exact: the offset embedding only shifts which
# padding zeros each tap reads.
def _fused_phase():
    # Read lazily (not at import) so bench.py's fallback-ladder env mutation
    # between rungs takes effect — an import-time read would silently no-op
    # any rung toggling NFE_FUSED_PHASE after modconv is first imported.
    return os.environ.get("NFE_FUSED_PHASE", "0") == "1"


def _conv2d(x, w, stride=1, padding=0, groups=1, flip_weight=True,
            channels_last=False):
    """Plain conv (NCHW, or NHWC with channels_last — the TPU-native layout;
    weights always arrive OIHW). flip_weight=True → correlation (torch conv2d
    semantics); False → true convolution (kernel flipped)."""
    if not flip_weight and (w.shape[2] > 1 or w.shape[3] > 1):
        w = jnp.flip(w, axis=(2, 3))
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if isinstance(stride, int):
        stride = (stride, stride)
    if channels_last:
        w = w.transpose(2, 3, 1, 0)  # OIHW → HWIO
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        dn = ("NCHW", "OIHW", "NCHW")
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=get_precision(),
    )


def _up2_subpixel_conv(x, w, f, px0, px1, py0, py1, *,
                       flip_weight, flip_filter, gain, channels_last=False):
    """Equivalent of ``upfirdn2d(x, f, up=2, padding=[px0,px1,py0,py1],
    gain=gain)`` followed by a valid `_conv2d(·, w)` — computed WITHOUT the
    zero-stuffed high-res grid.

    The two stacked correlations collapse into one composite kernel
    c = F ∗ W (full convolution of the correlation kernels); correlating the
    2×-dilated input with c splits by output parity into FOUR ordinary
    low-res convolutions over kernel phase slices c[kr::2, ks::2], whose
    outputs interleave to the high-res image. This removes the dilated-grid
    FIR conv (a slow depthwise pass), its pad/layout fixups, and the 4×
    structurally-zero MXU work of the dilated 3×3 conv (measured ~2.5×
    end-to-end on the SuperresolutionHybrid8XDC module).

    channels_last (NHWC) keeps O on the lane dim through the phase
    concatenation, so the final depth-to-space interleave permutes only
    sublane-major dims — the NCHW version of that interleave was the single
    biggest HBM cost of the serving frame (HLO-profiled r3).
    """
    if channels_last:
        B, H, W, _ = x.shape
    else:
        B, _, H, W = x.shape
    O, I, kh, kw = w.shape
    f2 = jnp.outer(f, f) if f.ndim == 1 else f
    f2 = f2 * gain
    if not flip_filter:
        f2 = jnp.flip(f2, (0, 1))
    wc = w if flip_weight else jnp.flip(w, (2, 3))
    fh, fw = f2.shape

    # composite correlation kernel: c[m] = Σ_{j+k=m} F[j]·W[k]
    c = lax.conv_general_dilated(
        wc.reshape(O * I, 1, kh, kw).astype(jnp.float32),
        jnp.flip(f2, (0, 1)).reshape(1, 1, fh, fw).astype(jnp.float32),
        window_strides=(1, 1),
        padding=((fh - 1, fh - 1), (fw - 1, fw - 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    ).reshape(O, I, kh + fh - 1, kw + fw - 1)
    ch, cw = c.shape[2], c.shape[3]

    # dilated signal length 2H-1, padded (py0, py1+1) — see upfirdn2d's
    # lhs_dilation trailing-pad compensation.
    Ly = 2 * H + py0 + py1 - ch + 1
    Lx = 2 * W + px0 + px1 - cw + 1
    qy = -(-Ly // 2)
    qx = -(-Lx // 2)

    # Per-phase kernel slices + left-offset geometry. For every phase,
    # ply + pry - ntaps == q - L - 1 (a phase-independent constant, both
    # axes) — which is what makes the fused single-conv embedding exact.
    blocks = []  # (kernel slice or None, ply, plx)
    for r in (0, 1):
        kry = (py0 - r) % 2
        ory = (r - py0 + kry) // 2
        cy = c[:, :, kry::2]
        ply = -ory
        for t in (0, 1):
            krx = (px0 - t) % 2
            orx = (t - px0 + krx) // 2
            cxy = cy[:, :, :, krx::2]
            plx = -orx
            if cxy.shape[2] == 0 or cxy.shape[3] == 0:
                blocks.append((None, ply, plx))
            else:
                blocks.append((cxy, ply, plx))

    def _slice_negative_pads(xs, p, hax, wax):
        # Negative conv padding miscompiles on some XLA backends
        # (observed garbage rows on CPU) — realize trims as slices.
        if p[0] < 0:
            xs = lax.slice_in_dim(xs, -p[0], xs.shape[hax], axis=hax)
            p[0] = 0
        if p[1] < 0:
            xs = lax.slice_in_dim(xs, 0, xs.shape[hax] + p[1], axis=hax)
            p[1] = 0
        if p[2] < 0:
            xs = lax.slice_in_dim(xs, -p[2], xs.shape[wax], axis=wax)
            p[2] = 0
        if p[3] < 0:
            xs = lax.slice_in_dim(xs, 0, xs.shape[wax] + p[3], axis=wax)
            p[3] = 0
        return xs, p

    hax, wax = (1, 2) if channels_last else (2, 3)
    if _fused_phase():
        # Embed each phase kernel at offset (dy, dx) = (PLy-ply, PLx-plx)
        # inside a common tap window; one conv with 4·O output channels then
        # produces the phase-concatenated tensor directly off the MXU.
        PLy = max(b[1] for b in blocks)
        PLx = max(b[2] for b in blocks)
        nty = max([1] + [(PLy - ply) + k.shape[2]
                         for k, ply, _ in blocks if k is not None])
        ntx = max([1] + [(PLx - plx) + k.shape[3]
                         for k, _, plx in blocks if k is not None])
        PRy = qy - H - 1 - PLy + nty
        PRx = qx - W - 1 - PLx + ntx
        K = jnp.zeros((4 * O, I, nty, ntx), jnp.float32)
        for pi, (k, ply, plx) in enumerate(blocks):
            if k is None:
                continue
            dy, dx = PLy - ply, PLx - plx
            K = K.at[pi * O:(pi + 1) * O, :,
                     dy:dy + k.shape[2], dx:dx + k.shape[3]].set(k)
        xs, p = _slice_negative_pads(x, [PLy, PRy, PLx, PRx], hax, wax)
        kk = K.transpose(2, 3, 1, 0) if channels_last else K
        cat = lax.conv_general_dilated(
            xs, kk.astype(x.dtype), (1, 1),
            ((p[0], p[1]), (p[2], p[3])),
            dimension_numbers=(("NHWC", "HWIO", "NHWC") if channels_last
                               else ("NCHW", "OIHW", "NCHW")),
            precision=get_precision(),
        )
        if channels_last:
            st = cat.reshape(B, qy, qx, 2, 2, O)
            out = st.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * qy, 2 * qx, O)
            return out[:, :Ly, :Lx]
        st = cat.reshape(B, 2, 2, O, qy, qx)
        out = st.transpose(0, 3, 4, 1, 5, 2).reshape(B, O, 2 * qy, 2 * qx)
        return out[:, :, :Ly, :Lx]

    phases = []
    for cxy, ply, plx in blocks:
        if cxy is None:
            # this output parity touches no kernel tap → all zeros
            shape = (B, qy, qx, O) if channels_last else (B, O, qy, qx)
            phases.append(jnp.zeros(shape, x.dtype))
            continue
        pry = qy - H - ply + cxy.shape[2] - 1
        prx = qx - W - plx + cxy.shape[3] - 1
        xs, p = _slice_negative_pads(x, [ply, pry, plx, prx], hax, wax)
        ck = (cxy.transpose(2, 3, 1, 0) if channels_last else cxy)
        phases.append(lax.conv_general_dilated(
            xs, ck.astype(x.dtype), (1, 1),
            ((p[0], p[1]), (p[2], p[3])),
            dimension_numbers=(("NHWC", "HWIO", "NHWC") if channels_last
                               else ("NCHW", "OIHW", "NCHW")),
            precision=get_precision(),
        ))
    if channels_last:
        # NHWC interleave: concat on the minor channel axis, split it into
        # (ry, rx, O), and lift the parity bits next to their spatial dims.
        # O stays the lane dim throughout — the permutation only touches
        # sublane-major axes (vs ~400 MB of strided copies in NCHW at 512²).
        cat = jnp.concatenate(phases, axis=-1)            # (B, qy, qx, 4·O)
        st = cat.reshape(B, qy, qx, 2, 2, O)
        out = st.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * qy, 2 * qx, O)
        return out[:, :Ly, :Lx]
    # Interleave phases via a CHANNEL concat + one depth-to-space relayout:
    # jnp.stack on a new leading axis lowered to 4 full-size pads (~530 MB
    # of HBM traffic at 512², HLO-profiled); concatenating along the
    # existing channel axis is a plain contiguous copy.
    cat = jnp.concatenate(phases, axis=1)                 # (B, 4·O, qy, qx)
    st = cat.reshape(B, 2, 2, O, qy, qx)
    out = st.transpose(0, 3, 4, 1, 5, 2).reshape(B, O, 2 * qy, 2 * qx)
    return out[:, :, :Ly, :Lx]


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
    channels_last: bool = False,
) -> jax.Array:
    """2-D convolution with optional FIR-filtered up/downsampling.

    Semantics match ref torch_utils/ops/conv2d_resample.py:48-160: padding is
    interpreted w.r.t. the upsampled image, the FIR filter `f` is applied
    during resampling only.
    """
    assert x.ndim == 4 and w.ndim == 4
    out_channels, in_per_group, kh, kw = w.shape
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding for resampling (ref conv2d_resample.py:85-96).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1×1 kernel with downsampling only: resample first, fewer conv FLOPs.
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1], flip_filter=flip_filter,
                      channels_last=channels_last)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight,
                       channels_last=channels_last)

    # 1×1 kernel with upsampling only: convolve first, then resample.
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight,
                    channels_last=channels_last)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up**2, flip_filter=flip_filter,
                         channels_last=channels_last)

    # Downsampling only: pre-filter, then fold the stride into the conv.
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter,
                      channels_last=channels_last)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight,
                       channels_last=channels_last)

    # No resampling: plain conv with asymmetric padding support.
    if up == 1 and down == 1:
        return _conv2d(
            x, w, padding=((py0, py1), (px0, px1)), groups=groups, flip_weight=flip_weight,
            channels_last=channels_last
        )

    # up=2 fast path: composite-kernel sub-pixel convolution (see
    # _up2_subpixel_conv) — bit-equivalent to the upfirdn+conv sequence.
    if up == 2 and down == 1 and groups == 1 and f is not None:
        return _up2_subpixel_conv(
            x, w, f, px0, px1, py0, py1,
            flip_weight=flip_weight, flip_filter=flip_filter, gain=up**2,
            channels_last=channels_last)

    # General path (up > 1, any down): zero-upsample + FIR via upfirdn, then
    # convolve, then (rarely) downsample — ref conv2d_resample.py:153-158.
    x = upfirdn2d(
        x, f if up > 1 else None, up=up, padding=[px0, px1, py0, py1], gain=up**2,
        flip_filter=flip_filter, channels_last=channels_last,
    )
    x = _conv2d(x, w, groups=groups, flip_weight=flip_weight,
                channels_last=channels_last)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter,
                      channels_last=channels_last)
    return x


def modulated_conv2d(
    x: jax.Array,              # (B, I, H, W), or (B, H, W, I) channels_last
    weight: jax.Array,         # (O, I, kh, kw)
    styles: jax.Array,         # (B, I)
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jax.Array] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
    channels_last: bool = False,
) -> jax.Array:
    """Style-modulated convolution (ref: networks_stylegan2.py:34-91).

    Always executes the scale-activations formulation: per-sample kernel
    modulation w_b = weight * styles_b (and demodulation by
    rsqrt(sum(w_b²)+1e-8)) is applied as input/output scaling around a single
    batched convolution.
    """
    B = x.shape[0]
    O, I, kh, kw = weight.shape
    assert styles.shape == (B, I)

    dcoefs = None
    if demodulate:
        w32 = weight.astype(jnp.float32)[jnp.newaxis]  # (1, O, I, kh, kw)
        w32 = w32 * styles.astype(jnp.float32).reshape(B, 1, I, 1, 1)
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w32), axis=(2, 3, 4)) + 1e-8)  # (B, O)

    s_shape = (B, 1, 1, I) if channels_last else (B, I, 1, 1)
    d_shape = (B, 1, 1, O) if channels_last else (B, O, 1, 1)
    x = x * styles.astype(x.dtype).reshape(s_shape)
    x = conv2d_resample(
        x, weight.astype(x.dtype), f=resample_filter, up=up, down=down,
        padding=padding, flip_weight=flip_weight, channels_last=channels_last,
    )
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype).reshape(d_shape) + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype).reshape(d_shape)
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
