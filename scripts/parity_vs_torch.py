"""Whole-model parity check against the PyTorch reference (VERDICT r1 #3).

Instantiates the reference TriPlaneGenerator (/root/reference,
training/triplane.py:19) on CPU with random-init weights, converts its
state_dict through io/torch_converter, and compares every stage of the
forward — mapping ws, backbone planes, and the full synthesis outputs —
against our JAX implementation under matched determinism:

* noise_mode='const' on both sides (noise_strength init = 0 anyway),
* stratified depths at bin centers (ref jitter torch.rand_like patched to
  0.5 — our rng=None semantics, renderer.py:86-93),
* importance sampling det=True (ref sample_pdf u=linspace — our rng=None).

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/parity_vs_torch.py [nrr]
"""

import os
import sys
import unittest.mock
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NRR = int(sys.argv[1]) if len(sys.argv) > 1 else 32

REF = "/root/reference"
RENDERING_KWARGS = {
    "image_resolution": 512,
    "disparity_space_sampling": False,
    "clamp_mode": "softplus",
    "superresolution_module": "training.superresolution.SuperresolutionHybrid8XDC",
    "c_gen_conditioning_zero": False,
    "gpc_reg_prob": 0.5,
    "c_scale": 1.0,
    "superresolution_noise_mode": "none",
    "density_reg": 0.25,
    "density_reg_p_dist": 0.004,
    "reg_type": "l1",
    "decoder_lr_mul": 1.0,
    "sr_antialias": True,
    "depth_resolution": 48,
    "depth_resolution_importance": 48,
    "ray_start": 2.25,
    "ray_end": 3.3,
    "box_warp": 1,
    "avg_camera_radius": 2.7,
    "avg_camera_pivot": [0, 0, 0.2],
    "white_back": False,
}


def build_ref_generator(seed: int = 0):
    import torch

    sys.path.insert(0, REF)
    torch.manual_seed(seed)
    from training.triplane import TriPlaneGenerator

    G = TriPlaneGenerator(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
        sr_num_fp16_res=0,                      # CPU runs fp32 anyway
        mapping_kwargs={"num_layers": 2},
        rendering_kwargs=RENDERING_KWARGS,
        sr_kwargs={"channel_base": 32768, "channel_max": 512,
                   "fused_modconv_default": "inference_only"},
        channel_base=32768, channel_max=512,
        fused_modconv_default="inference_only",
        num_fp16_res=0, conv_clamp=None,        # exact-math config
    ).eval()
    return G


def deterministic_ref_forward(G, z, c, nrr):
    """Reference forward with all stochastic points pinned to our rng=None
    semantics (bin-center stratified depths, det importance samples)."""
    import torch

    G.renderer.sample_pdf = partial(type(G.renderer).sample_pdf, G.renderer,
                                    det=True)
    with torch.no_grad(), unittest.mock.patch(
            "torch.rand_like", lambda t: torch.full_like(t, 0.5)):
        ws = G.mapping(z, c)
        planes = G.backbone.synthesis(ws, noise_mode="const")
        out = G.synthesis(ws, c, neural_rendering_resolution=nrr,
                          noise_mode="const")
    return ws, planes, out


def front_camera():
    import numpy as np

    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    cam2world = lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7)
    intr = fov_to_intrinsics(18.837)
    return np.asarray(camera_params(cam2world, intr[None]))


def main():
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.io.torch_converter import (
        convert_generator_state_dict, merge_with_init)
    from nerffaceediting_tpu.models import triplane as tri

    G = build_ref_generator()
    cfg = ffhq_generator_config()
    init = tri.init_generator(jax.random.PRNGKey(0), cfg)
    converted = convert_generator_state_dict(G.state_dict())

    # structural check: the converter must cover every leaf our init has
    flat_conv = {"/".join(map(str, p)): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(converted)[0]}
    flat_init = {"/".join(map(str, p)): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(init)[0]}
    missing = sorted(set(flat_init) - set(flat_conv))
    extra = sorted(set(flat_conv) - set(flat_init))
    print(f"converter: {len(flat_conv)} leaves; missing={missing} extra={extra}")
    for k in sorted(set(flat_conv) & set(flat_init)):
        if flat_conv[k] != flat_init[k]:
            print(f"  SHAPE MISMATCH {k}: conv {flat_conv[k]} vs init {flat_init[k]}")
    params = merge_with_init(converted, init)

    rng = np.random.RandomState(123)
    z_np = rng.randn(1, 512).astype(np.float32)
    c_np = front_camera().astype(np.float32)
    z_t, c_t = torch.from_numpy(z_np), torch.from_numpy(c_np)

    ws_t, planes_t, out_t = deterministic_ref_forward(G, z_t, c_t, NRR)

    ws_j = tri.mapping(params, jnp.asarray(z_np), jnp.asarray(c_np), cfg)
    planes_j = tri.synthesize_planes(params, ws_j, cfg, noise_mode="const")
    out_j = tri.synthesis(params, ws_j, jnp.asarray(c_np), cfg,
                          neural_rendering_resolution=NRR,
                          noise_mode="const", rng=None)

    def report(name, a_t, a_j):
        a = a_t.detach().cpu().numpy() if hasattr(a_t, "detach") else np.asarray(a_t)
        b = np.asarray(a_j)
        if a.shape != b.shape:
            print(f"{name:<14} SHAPE {a.shape} vs {b.shape}")
            return
        d = np.abs(a - b)
        scale = max(np.abs(a).max(), 1e-12)
        print(f"{name:<14} maxabs={d.max():.3e}  mean={d.mean():.3e}  "
              f"rel={d.max()/scale:.3e}  (ref range [{a.min():.3f},{a.max():.3f}])")

    report("ws", ws_t, ws_j)
    report("planes", planes_t, planes_j)
    report("image_raw", out_t["image_raw"], out_j["image_raw"])
    report("image_depth", out_t["image_depth"], out_j["image_depth"])
    report("image_seg", out_t["image_seg"], out_j["image_seg"])
    report("image", out_t["image"], out_j["image"])
    report("plane_mean", out_t["plane_mean"].reshape(1, -1),
           np.asarray(out_j["plane_mean"]).reshape(1, -1))
    report("plane_var", out_t["plane_var"].reshape(1, -1),
           np.asarray(out_j["plane_var"]).reshape(1, -1))


if __name__ == "__main__":
    main()
