"""End-to-end parity against the PyTorch reference (VERDICT r1 #3).

Builds the reference TriPlaneGenerator (/root/reference/training/triplane.py:19)
with random-init weights on CPU, converts its state_dict via
io/torch_converter, and asserts the full JAX forward matches stage by stage
under pinned determinism (bin-center stratified depths via rand_like→0.5,
det importance sampling, noise_mode='const').

Measured deltas (nrr=32, fp32, recorded in docs/PARITY.md): maxabs ≤ 2.5e-5
on every output. Tolerances below leave ~10× headroom for BLAS variation.

Slow (~2 min: torch CPU forward + JAX compile); skipped when the reference
checkout is absent.
"""

import os
import sys
import unittest.mock
from functools import partial

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "training")),
                       reason="reference checkout unavailable"),
    # ~90 s torch fixture build — full tier only (pytest -m 'not slow' skips)
    pytest.mark.slow,
]

NRR = int(os.environ.get("PARITY_NRR", "32"))

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


@pytest.fixture(scope="module")
def parity():
    """(ref outputs, our outputs) for one deterministic forward."""
    import jax
    import jax.numpy as jnp

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.io.torch_converter import (
        convert_generator_state_dict, merge_with_init)
    from nerffaceediting_tpu.models import triplane as tri
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    sys.path.insert(0, REF)
    torch.manual_seed(0)
    from training.triplane import TriPlaneGenerator

    G = TriPlaneGenerator(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
        sr_num_fp16_res=0, mapping_kwargs={"num_layers": 2},
        rendering_kwargs=RENDERING_KWARGS,
        sr_kwargs={"channel_base": 32768, "channel_max": 512,
                   "fused_modconv_default": "inference_only"},
        channel_base=32768, channel_max=512,
        fused_modconv_default="inference_only",
        num_fp16_res=0, conv_clamp=None,
    ).eval()

    cfg = ffhq_generator_config()
    init = tri.init_generator(jax.random.PRNGKey(0), cfg)
    converted = convert_generator_state_dict(G.state_dict())

    flat_conv = {"/".join(str(getattr(k, "key", k)) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
    flat_init = {"/".join(str(getattr(k, "key", k)) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(init)[0]}
    assert flat_conv == flat_init, (
        f"converter tree mismatch: missing={sorted(flat_init - flat_conv)} "
        f"extra={sorted(flat_conv - flat_init)}")
    params = merge_with_init(converted, init)

    rng = np.random.RandomState(123)
    z_np = rng.randn(1, 512).astype(np.float32)
    cam2world = lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7)
    intr = fov_to_intrinsics(18.837)
    c_np = np.asarray(camera_params(cam2world, intr[None])).astype(np.float32)

    # reference forward, stochastic points pinned to our rng=None semantics
    G.renderer.sample_pdf = partial(type(G.renderer).sample_pdf, G.renderer,
                                    det=True)
    z_t, c_t = torch.from_numpy(z_np), torch.from_numpy(c_np)
    with torch.no_grad(), unittest.mock.patch(
            "torch.rand_like", lambda t: torch.full_like(t, 0.5)):
        ws_t = G.mapping(z_t, c_t)
        planes_t = G.backbone.synthesis(ws_t, noise_mode="const")
        out_t = G.synthesis(ws_t, c_t, neural_rendering_resolution=NRR,
                            noise_mode="const")

    ws_j = tri.mapping(params, jnp.asarray(z_np), jnp.asarray(c_np), cfg)
    planes_j = tri.synthesize_planes(params, ws_j, cfg, noise_mode="const")
    out_j = tri.synthesis(params, ws_j, jnp.asarray(c_np), cfg,
                          neural_rendering_resolution=NRR,
                          noise_mode="const", rng=None)
    ref = {"ws": ws_t, "planes": planes_t, **out_t}
    ours = {"ws": ws_j, "planes": planes_j, **out_j}
    return ref, ours


def _maxabs(a_t, a_j):
    a = a_t.detach().cpu().numpy()
    b = np.asarray(a_j).reshape(a.shape)
    assert a.shape == np.asarray(a_j).squeeze().shape or a.shape == np.asarray(a_j).shape
    return float(np.abs(a - b).max())


@pytest.mark.parametrize("key,tol", [
    ("ws", 3e-5),
    ("planes", 3e-4),
    ("image_raw", 1e-4),
    ("image_depth", 1e-4),
    ("image_seg", 1e-4),
    ("image", 5e-4),
])
def test_forward_parity(parity, key, tol):
    ref, ours = parity
    d = _maxabs(ref[key], ours[key])
    assert d < tol, f"{key}: maxabs {d} >= {tol}"


def test_plane_stats_parity(parity):
    ref, ours = parity
    for key in ("plane_mean", "plane_var"):
        a = ref[key].detach().cpu().numpy().reshape(-1)
        b = np.asarray(ours[key]).reshape(-1)
        assert np.abs(a - b).max() < 1e-4, key
