"""Superresolution modules lifting the 64² neural render to the output
resolution (rebuild of ref training/superresolution.py).

Each variant is two StyleGAN2 synthesis blocks driven by the last w vector
(repeated ×3, ref superresolution.py:280), fed the raw feature image and rgb
bilinearly resized to the block-0 input resolution. The reference's fp16
blocks become bf16-capable via the dtype argument; conv_clamp is kept for
checkpoint parity.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear, setup_filter
from .stylegan2 import init_synthesis_block, synthesis_block

W_DIM = 512  # ref: superresolution.py:39 (SR blocks always use w_dim=512)


# (block0_out, block1_out, block0_res, block1_res, block0_up, input_res)
SR_VARIANTS = {
    # for 512² generation, dual-contrastive config (ref :264-290) — the one
    # used by NeRFFaceEditing's ffhq-512 model.
    "SuperresolutionHybrid8XDC": dict(ch0=256, ch1=128, res0=256, res1=512, up0=True, input_res=128, out_res=512),
    # for 512² generation (ref :29-56)
    "SuperresolutionHybrid8X": dict(ch0=128, ch1=64, res0=256, res1=512, up0=True, input_res=128, out_res=512),
    # for 256² generation (ref :62-88)
    "SuperresolutionHybrid4X": dict(ch0=128, ch1=64, res0=128, res1=256, up0=False, input_res=128, out_res=256),
    # for 128² generation (ref :94-121)
    "SuperresolutionHybrid2X": dict(ch0=128, ch1=64, res0=64, res1=128, up0=False, input_res=64, out_res=128),
    # legacy 256² fp32 (ref :127-153)
    "SuperresolutionHybridDeepfp32": dict(ch0=128, ch1=64, res0=128, res1=256, up0=False, input_res=128, out_res=256),
}


def resolve_sr_variant(name: str) -> str:
    """Accept either the bare class name or the reference's dotted path
    ('training.superresolution.SuperresolutionHybrid8XDC')."""
    short = name.rsplit(".", 1)[-1]
    if short not in SR_VARIANTS:
        raise ValueError(f"unknown superresolution module {name!r}")
    return short


def init_superresolution(key, variant: str, channels: int = 32, w_dim: int = W_DIM):
    v = SR_VARIANTS[resolve_sr_variant(variant)]
    k0, k1 = jax.random.split(key)
    return {
        "block0": init_synthesis_block(
            k0, channels, v["ch0"], w_dim, v["res0"], img_channels=3, is_last=False
        ),
        "block1": init_synthesis_block(
            k1, v["ch0"], v["ch1"], w_dim, v["res1"], img_channels=3, is_last=True
        ),
    }


def superresolution(params, rgb, x, ws, *, variant: str,
                    sr_antialias: bool = True,
                    noise_mode: str = "none",
                    rng: Optional[jax.Array] = None,
                    conv_clamp: Optional[float] = None,
                    dtype=jnp.float32,
                    channels_last: bool = False):
    """rgb (B,3,r,r), features x (B,32,r,r), ws (B,num_ws,512) → (B,3,R,R).

    ref superresolution.py:279-290: uses only the LAST w (repeated for the
    3 layer slots of each block), lifts inputs to `input_res` bilinearly
    (antialias only matters if ever downscaling).

    channels_last: run the whole module in NHWC (inputs/outputs NHWC too) —
    the TPU-native conv layout. The render feature grid is channel-minor
    already, so serving uses this to skip every NCHW↔NHWC relayout
    (~4 ms/frame of HLO-profiled copies at 512², r3).
    """
    v = SR_VARIANTS[resolve_sr_variant(variant)]
    ws = jnp.tile(ws[:, -1:, :], (1, 3, 1))

    res_axis = -2 if channels_last else -1
    if x.shape[res_axis] != v["input_res"]:
        x = resize_bilinear(x, v["input_res"], antialias=sr_antialias,
                            channels_last=channels_last)
        rgb = resize_bilinear(rgb, v["input_res"], antialias=sr_antialias,
                              channels_last=channels_last)

    f = setup_filter([1, 3, 3, 1])
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    x, rgb = synthesis_block(
        params["block0"], x, rgb, ws, resolution=v["res0"], resample_filter=f,
        conv_clamp=conv_clamp, noise_mode=noise_mode, rng=rngs[0],
        up=v["up0"], dtype=dtype, channels_last=channels_last,
    )
    x, rgb = synthesis_block(
        params["block1"], x, rgb, ws, resolution=v["res1"], resample_filter=f,
        conv_clamp=conv_clamp, noise_mode=noise_mode, rng=rngs[1],
        up=True, dtype=dtype, channels_last=channels_last,
    )
    return rgb
