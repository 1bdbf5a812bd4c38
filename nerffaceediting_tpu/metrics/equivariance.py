"""Equivariance metrics EQ-T / EQ-R for alias-free generators.

Rebuild of ref metrics/equivariance.py:194+ : measure how closely
transforming the SG3 generator's input Fourier frame (via the user transform
buffer, ref networks_stylegan3.py:197) matches transforming the output image.
PSNR over random (z, transform) pairs; higher is better.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


def _translate_transform(tx: float, ty: float) -> jnp.ndarray:
    """Inverse-translation 3×3 for the SynthesisInput transform buffer."""
    return jnp.asarray([[1, 0, -tx], [0, 1, -ty], [0, 0, 1]], jnp.float32)


def _rotate_transform(angle: float) -> jnp.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    return jnp.asarray([[c, s, 0], [-s, c, 0], [0, 0, 1]], jnp.float32)


def _with_transform(params: Dict, t: jnp.ndarray) -> Dict:
    out = dict(params)
    out["synthesis"] = dict(params["synthesis"])
    out["synthesis"]["input"] = dict(params["synthesis"]["input"])
    out["synthesis"]["input"]["transform"] = t
    return out


def _shift_image(img, tx_pix: int, ty_pix: int):
    return jnp.roll(jnp.roll(img, tx_pix, axis=-1), ty_pix, axis=-2)


def eqt_psnr(params: Dict, static: Dict, *, num_samples: int = 32,
             z_dim: int = 512, translate_max: float = 0.125,
             seed: int = 0) -> float:
    """EQ-T: PSNR between input-translated generation and pixel-translated
    generation, over integer-pixel shifts (ref equivariance.py:194-227)."""
    from ..models.stylegan3 import sg3_generate

    res = static["img_resolution"]
    rng = jax.random.key(seed)
    mses = []
    for i in range(num_samples):
        k = jax.random.fold_in(rng, i)
        kz, kt = jax.random.split(k)
        z = jax.random.normal(kz, (1, z_dim))
        # integer-pixel translation (exact under jnp.roll)
        t_pix = jax.random.randint(kt, (2,), -int(res * translate_max),
                                   int(res * translate_max) + 1)
        tx, ty = float(t_pix[0]) / res * 2, float(t_pix[1]) / res * 2
        ref = sg3_generate(_with_transform(params, _translate_transform(tx, ty)),
                           static, z, None)
        base = sg3_generate(params, static, z, None)
        shifted = _shift_image(base, int(t_pix[0]), int(t_pix[1]))
        # compare on the interior (wrap-around border excluded)
        m = int(res * translate_max) + 1
        diff = (ref - shifted)[..., m:-m, m:-m]
        mses.append(float(jnp.mean(jnp.square(diff))))
    mse = float(np.mean(mses))
    return 10 * math.log10(4.0 / max(mse, 1e-20))  # signal range (−1,1) → peak 2


def _subpixel_shift(img: jnp.ndarray, tx: float, ty: float) -> jnp.ndarray:
    """Exact fractional-pixel translation of a band-limited image via FFT
    phase shift — the TPU-native equivalent of the reference's
    `apply_fractional_translation` (ref metrics/equivariance.py:36-57,
    which uses a windowed-sinc resampler; SG3 outputs are band-limited by
    construction so the Fourier shift is exact up to the border wrap,
    which the caller crops)."""
    H, W = img.shape[-2], img.shape[-1]
    fy = jnp.fft.fftfreq(H)[:, None]
    fx = jnp.fft.fftfreq(W)[None, :]
    phase = jnp.exp(-2j * jnp.pi * (fy * ty + fx * tx))
    return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(img) * phase))


def eqt_frac_psnr(params: Dict, static: Dict, *, num_samples: int = 32,
                  z_dim: int = 512, translate_max: float = 0.125,
                  seed: int = 0) -> float:
    """EQ-T (fractional): PSNR between input-translated generation and
    subpixel-shifted generation over continuous shifts
    (ref equivariance.py:194-227 eqt50k_frac)."""
    from ..models.stylegan3 import sg3_generate

    res = static["img_resolution"]
    rng = jax.random.key(seed)
    mses = []
    for i in range(num_samples):
        k = jax.random.fold_in(rng, i)
        kz, kt = jax.random.split(k)
        z = jax.random.normal(kz, (1, z_dim))
        t_pix = jax.random.uniform(kt, (2,), minval=-res * translate_max,
                                   maxval=res * translate_max)
        tx_p, ty_p = float(t_pix[0]), float(t_pix[1])
        tx, ty = tx_p / res * 2, ty_p / res * 2
        ref = sg3_generate(_with_transform(params, _translate_transform(tx, ty)),
                           static, z, None)
        base = sg3_generate(params, static, z, None)
        shifted = _subpixel_shift(base, tx_p, ty_p)
        m = int(res * translate_max) + 2
        diff = (ref - shifted)[..., m:-m, m:-m]
        mses.append(float(jnp.mean(jnp.square(diff))))
    mse = float(np.mean(mses))
    return 10 * math.log10(4.0 / max(mse, 1e-20))


def eqr_psnr(params: Dict, static: Dict, *, num_samples: int = 16,
             z_dim: int = 512, seed: int = 0) -> float:
    """EQ-R: PSNR between input-rotated generation and image-rotated
    generation, over 90° rotations (exact under jnp.rot90)."""
    from ..models.stylegan3 import sg3_generate

    rng = jax.random.key(seed)
    mses = []
    for i in range(num_samples):
        k = jax.random.fold_in(rng, i)
        kz, kr = jax.random.split(k)
        z = jax.random.normal(kz, (1, z_dim))
        quarter = int(jax.random.randint(kr, (), 1, 4))
        ref = sg3_generate(
            _with_transform(params, _rotate_transform(quarter * math.pi / 2)),
            static, z, None)
        base = sg3_generate(params, static, z, None)
        rotated = jnp.rot90(base, k=quarter, axes=(-2, -1))
        mses.append(float(jnp.mean(jnp.square(ref - rotated))))
    mse = float(np.mean(mses))
    return 10 * math.log10(4.0 / max(mse, 1e-20))
