"""StyleGAN3 (alias-free) generator — functional JAX rebuild.

Rebuild of ref training/networks_stylegan3.py:171-517. Present for parity
with the reference's backbone/SR options (it ships SG3 but the ffhq
NeRFFaceEditing config never instantiates it, SURVEY §2.1/§2.2); useful as
an alternative 2-D generator family.

Components:
  SynthesisInput — transformed Fourier features (ref :171-250)
  SynthesisLayer — magnitude-normalized modulated conv + filtered leaky ReLU
                   at per-layer sampling rates (ref :255-395)
  SynthesisNetwork — geometric cutoff/stopband schedule (ref :401-483)

The filtered nonlinearity uses ops/filtered_lrelu.py (composed upfirdn —
replacing the reference's 1800-line CUDA kernel). Kaiser/jinc filter design
runs at init with scipy (host side, baked into params as buffers).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import bias_act, conv2d_resample
from ..ops.filtered_lrelu import filtered_lrelu
from .layers import fully_connected, init_fully_connected
from .stylegan2 import init_mapping, mapping_apply


# ---------------------------------------------------------------------------
# Filter design (ref networks_stylegan3.py:366-386)

def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False) -> Optional[np.ndarray]:
    if numtaps == 1:
        return None
    import scipy.signal

    if not radial:
        return scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width,
                                   fs=fs).astype(np.float32)
    import scipy.special

    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[r == 0] = cutoff * 2 * cutoff  # limit of j1(2πc r)/(π r) at r→0... use np.nan_to_num guard
    f = np.nan_to_num(f)
    beta = scipy.signal.kaiser_beta(scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    wnd = np.kaiser(numtaps, beta)
    f *= np.outer(wnd, wnd)
    f /= np.sum(f)
    return f.astype(np.float32)


# ---------------------------------------------------------------------------
# Layer schedule (ref networks_stylegan3.py:429-441)

def sg3_schedule(img_resolution: int, channel_base=32768, channel_max=512,
                 num_layers=14, num_critical=2, first_cutoff=2.0,
                 first_stopband=2**2.1, last_stopband_rel=2**0.3,
                 margin_size=10, img_channels=3):
    last_cutoff = img_resolution / 2
    last_stopband = last_cutoff * last_stopband_rel
    exponents = np.minimum(np.arange(num_layers + 1) / (num_layers - num_critical), 1)
    cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
    stopbands = first_stopband * (last_stopband / first_stopband) ** exponents
    sampling_rates = np.exp2(np.ceil(np.log2(np.minimum(stopbands * 2, img_resolution))))
    half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
    sizes = (sampling_rates + margin_size * 2).astype(np.int64)
    sizes[-2:] = img_resolution
    channels = np.rint(np.minimum((channel_base / 2) / cutoffs, channel_max)).astype(np.int64)
    channels[-1] = img_channels
    return dict(cutoffs=cutoffs, sampling_rates=sampling_rates,
                half_widths=half_widths, sizes=sizes, channels=channels)


def _layer_static(sched, idx: int, num_layers: int, num_critical: int,
                  conv_kernel=3, filter_size=6, lrelu_upsampling=2,
                  use_radial_filters=False, conv_clamp=256.0):
    """Per-layer static config incl. designed filters (ref :300-330)."""
    prev = max(idx - 1, 0)
    is_torgb = idx == num_layers
    is_crit = idx >= num_layers - num_critical
    in_rate, out_rate = sched["sampling_rates"][prev], sched["sampling_rates"][idx]
    tmp_rate = max(in_rate, out_rate) * (1 if is_torgb else lrelu_upsampling)
    k = 1 if is_torgb else conv_kernel

    up_factor = int(np.rint(tmp_rate / in_rate))
    up_taps = filter_size * up_factor if up_factor > 1 and not is_torgb else 1
    up_filter = design_lowpass_filter(
        up_taps, sched["cutoffs"][prev], sched["half_widths"][prev] * 2, tmp_rate)

    down_factor = int(np.rint(tmp_rate / out_rate))
    down_taps = filter_size * down_factor if down_factor > 1 and not is_torgb else 1
    down_radial = use_radial_filters and not is_crit
    down_filter = design_lowpass_filter(
        down_taps, sched["cutoffs"][idx], sched["half_widths"][idx] * 2, tmp_rate,
        radial=down_radial)

    in_size = int(sched["sizes"][prev])
    out_size = int(sched["sizes"][idx])
    pad_total = (out_size - 1) * down_factor + 1
    pad_total -= (in_size + k - 1) * up_factor
    pad_total += up_taps + down_taps - 2
    pad_lo = (pad_total + up_factor) // 2
    pad_hi = pad_total - pad_lo

    return dict(
        is_torgb=is_torgb, conv_kernel=k,
        in_channels=int(sched["channels"][prev]), out_channels=int(sched["channels"][idx]),
        in_size=in_size, out_size=out_size,
        up_factor=up_factor, down_factor=down_factor,
        up_filter=up_filter, down_filter=down_filter,
        padding=[pad_lo, pad_hi, pad_lo, pad_hi],
        conv_clamp=conv_clamp,
    )


# ---------------------------------------------------------------------------
# SynthesisInput (ref :171-250)

def init_synthesis_input(key, w_dim: int, channels: int, size: int,
                         sampling_rate: float, bandwidth: float) -> Dict:
    k_f, k_p, k_w, k_a = jax.random.split(key, 4)
    freqs = jax.random.normal(k_f, (channels, 2))
    radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
    freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25) * bandwidth
    phases = jax.random.uniform(k_p, (channels,)) - 0.5
    affine = init_fully_connected(k_a, w_dim, 4)
    affine["weight"] = affine["weight"] * 0.0  # weight_init=0 (ref :195)
    affine["bias"] = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    return {
        "weight": jax.random.normal(k_w, (channels, channels)),
        "affine": affine,
        "transform": jnp.eye(3),
        "freqs": freqs,
        "phases": phases,
    }


def synthesis_input(params, w, *, channels: int, size: int,
                    sampling_rate: float, bandwidth: float) -> jax.Array:
    """w (B, w_dim) → Fourier-feature canvas (B, C, size, size)."""
    B = w.shape[0]
    t = fully_connected(params["affine"], w)  # (B, 4): rc, rs, tx, ty
    t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)

    m_r = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
    m_r = m_r.at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1])
    m_r = m_r.at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0])
    m_t = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
    m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
    transforms = m_r @ m_t @ params["transform"][None]

    freqs = params["freqs"][None]  # (1, C, 2)
    phases = params["phases"][None] + jnp.einsum("bcf,bfk->bck", freqs, transforms[:, :2, 2:])[..., 0]
    freqs = jnp.einsum("bcf,bfk->bck", freqs, transforms[:, :2, :2])

    amplitudes = jnp.clip(
        1 - (jnp.linalg.norm(freqs, axis=2) - bandwidth) / (sampling_rate / 2 - bandwidth),
        0, 1)

    # sampling grid (align_corners=False affine_grid semantics)
    extent = 0.5 * size / sampling_rate
    coords = (2 * jnp.arange(size) + 1) / size - 1  # pixel centers in [-1,1]
    gx = coords[None, :] * extent
    gy = coords[:, None] * extent
    grid = jnp.stack([jnp.broadcast_to(gx, (size, size)),
                      jnp.broadcast_to(gy, (size, size))], axis=-1)  # (H, W, 2)

    x = jnp.einsum("hwf,bcf->bhwc", grid, freqs) + phases[:, None, None, :]
    x = jnp.sin(x * (2 * jnp.pi)) * amplitudes[:, None, None, :]
    weight = params["weight"] / math.sqrt(params["weight"].shape[0])
    x = x @ weight.T
    return x.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# SG3 modulated conv (pre-normalized variant, ref :30-68) — unfused form

def sg3_modulated_conv2d(x, weight, styles, *, padding: int = 0,
                         demodulate: bool = True,
                         input_gain: Optional[jax.Array] = None) -> jax.Array:
    if demodulate:
        weight = weight * jax.lax.rsqrt(jnp.mean(jnp.square(weight), axis=(1, 2, 3), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))
    B, I = styles.shape
    O = weight.shape[0]
    dcoefs = None
    if demodulate:
        w = weight[None] * styles[:, None, :, None, None]
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)  # (B, O)
    scale = styles
    if input_gain is not None:
        scale = scale * jnp.broadcast_to(input_gain, scale.shape)
    x = x * scale.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(x, weight.astype(x.dtype), padding=padding)
    if dcoefs is not None:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    return x


def init_sg3_layer(key, w_dim: int, static: Dict) -> Dict:
    k_a, k_w = jax.random.split(key)
    k = static["conv_kernel"]
    return {
        "affine": init_fully_connected(k_a, w_dim, static["in_channels"], bias_init=1.0),
        "weight": jax.random.normal(
            k_w, (static["out_channels"], static["in_channels"], k, k)),
        "bias": jnp.zeros((static["out_channels"],)),
        "magnitude_ema": jnp.ones(()),
    }


def sg3_layer(params, x, w, static: Dict) -> jax.Array:
    """Alias-free layer (ref :333-364): magnitude-normalized modulated conv
    → filtered leaky ReLU at the temporary sampling rate."""
    input_gain = jax.lax.rsqrt(params["magnitude_ema"])
    styles = fully_connected(params["affine"], w)
    if static["is_torgb"]:
        styles = styles * (1 / math.sqrt(
            static["in_channels"] * static["conv_kernel"] ** 2))
    x = sg3_modulated_conv2d(
        x, params["weight"], styles, padding=static["conv_kernel"] - 1,
        demodulate=not static["is_torgb"], input_gain=input_gain)
    fu = None if static["up_filter"] is None else jnp.asarray(static["up_filter"])
    fd = None if static["down_filter"] is None else jnp.asarray(static["down_filter"])
    return filtered_lrelu(
        x, fu=fu, fd=fd, b=params["bias"],
        up=static["up_factor"], down=static["down_factor"],
        padding=static["padding"],
        gain=1.0 if static["is_torgb"] else math.sqrt(2),
        slope=1.0 if static["is_torgb"] else 0.2,
        clamp=static["conv_clamp"])


# ---------------------------------------------------------------------------
# SynthesisNetwork / Generator

def sg3_static_config(img_resolution: int, img_channels: int = 3,
                      channel_base=32768, channel_max=512, num_layers=14,
                      num_critical=2, **kw):
    sched = sg3_schedule(img_resolution, channel_base, channel_max, num_layers,
                         num_critical, img_channels=img_channels, **kw)
    layers = [_layer_static(sched, i, num_layers, num_critical)
              for i in range(num_layers + 1)]
    return dict(sched=sched, layers=layers, num_layers=num_layers,
                num_ws=num_layers + 2, img_resolution=img_resolution,
                output_scale=0.25)


def init_sg3_synthesis(key, w_dim: int, static: Dict) -> Dict:
    sched = static["sched"]
    keys = jax.random.split(key, len(static["layers"]) + 1)
    params: Dict = {
        "input": init_synthesis_input(
            keys[0], w_dim, int(sched["channels"][0]), int(sched["sizes"][0]),
            float(sched["sampling_rates"][0]), float(sched["cutoffs"][0]))
    }
    for i, layer_static in enumerate(static["layers"]):
        params[f"L{i}"] = init_sg3_layer(keys[i + 1], w_dim, layer_static)
    return params


def sg3_synthesis(params, ws, static: Dict) -> jax.Array:
    sched = static["sched"]
    ws = ws.astype(jnp.float32)
    x = synthesis_input(
        params["input"], ws[:, 0], channels=int(sched["channels"][0]),
        size=int(sched["sizes"][0]), sampling_rate=float(sched["sampling_rates"][0]),
        bandwidth=float(sched["cutoffs"][0]))
    for i, layer_static in enumerate(static["layers"]):
        x = sg3_layer(params[f"L{i}"], x, ws[:, i + 1], layer_static)
    return (x * static["output_scale"]).astype(jnp.float32)


def init_sg3_generator(key, z_dim: int, c_dim: int, w_dim: int,
                       img_resolution: int, img_channels: int = 3,
                       mapping_layers: int = 2, **kw):
    static = sg3_static_config(img_resolution, img_channels, **kw)
    k_m, k_s = jax.random.split(key)
    params = {
        "mapping": init_mapping(k_m, z_dim, c_dim, w_dim, static["num_ws"],
                                num_layers=mapping_layers),
        "synthesis": init_sg3_synthesis(k_s, w_dim, static),
    }
    return params, static


def sg3_generate(params, static, z, c, *, num_mapping_layers: int = 2,
                 truncation_psi: float = 1.0) -> jax.Array:
    ws = mapping_apply(params["mapping"], z, c, num_ws=static["num_ws"],
                       num_layers=num_mapping_layers, truncation_psi=truncation_psi)
    return sg3_synthesis(params["synthesis"], ws, static)
