"""VGG16 features + equivariance metric tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from nerffaceediting_tpu.io.vgg import (
    convert_vgg16_state_dict,
    init_vgg16,
    make_feature_fn,
    vgg16_features,
)

# LPIPS/VGG compiles ~135 s (measured r3) — excluded from the default dev tier
# (pytest -m 'not slow' tests/); the full tier still runs everything.
pytestmark = pytest.mark.slow


def _run_grad_check_subprocess(code: str) -> None:
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, timeout=300)
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-800:]


class TestVGG16:
    def test_forward_shapes(self):
        params = init_vgg16(jax.random.key(0))
        img = jax.random.uniform(jax.random.key(1), (2, 3, 64, 64), maxval=255.0)
        feats = vgg16_features(params, img)
        assert feats.shape[0] == 2
        assert feats.shape[1] == 64 + 128 + 256 + 512 + 512
        assert np.all(np.isfinite(np.asarray(feats)))

    def test_conv_block_matches_torch(self):
        """First conv block vs torch (weights shared via the converter)."""
        torch.manual_seed(0)
        conv1 = torch.nn.Conv2d(3, 64, 3, padding=1)
        conv2 = torch.nn.Conv2d(64, 64, 3, padding=1)
        sd = {
            "features.0.weight": conv1.weight, "features.0.bias": conv1.bias,
            "features.2.weight": conv2.weight, "features.2.bias": conv2.bias,
        }
        # fill the remaining convs with zeros of correct shapes
        from nerffaceediting_tpu.io.vgg import VGG16_LAYOUT

        convs = [it for it in VGG16_LAYOUT if it != "M"]
        for idx, cin, cout in convs[2:]:
            sd[f"features.{idx}.weight"] = torch.zeros(cout, cin, 3, 3)
            sd[f"features.{idx}.bias"] = torch.zeros(cout)
        params = convert_vgg16_state_dict(sd)

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (1, 3, 32, 32)).astype(np.float32)
        feats = np.asarray(vgg16_features(params, jnp.asarray(img), normalize=False))

        x = torch.tensor(img) / 255.0
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (x - mean) / std
        with torch.no_grad():
            x = torch.relu(conv1(x))
            x = torch.relu(conv2(x))
        expected_block1 = x.mean(dim=(2, 3)).numpy()
        np.testing.assert_allclose(feats[:, :64], expected_block1, rtol=1e-4, atol=1e-4)

    def test_feature_fn_differentiable(self):
        # Runs in a FRESH subprocess: the XLA CPU compiler segfaults
        # linearizing the VGG grad when this process already carries the
        # full suite's program cache (reproducible only in-suite; the same
        # grad passes in isolation). Subprocess isolation sidesteps the
        # poisoned-compiler state.
        _run_grad_check_subprocess('''
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from nerffaceediting_tpu.io.vgg import init_vgg16, make_feature_fn
params = init_vgg16(jax.random.key(0))
fn = make_feature_fn(params)
img = jax.random.uniform(jax.random.key(1), (1, 3, 32, 32), maxval=255.0)
g = jax.grad(lambda x: jnp.sum(jnp.square(fn(x))))(img)
assert np.all(np.isfinite(np.asarray(g)))
print("OK")
''')


class TestLPIPSFeatures:
    """LPIPS-grade spatial features (VERDICT r1 #7)."""

    def test_sumsq_equals_lpips_formula(self):
        """sum-squared diff of lpips_features == Σ_l mean_hw Σ_c w_c d².
        (Subprocess-isolated like every LPIPS test in this class — the XLA
        CPU compiler segfaults on fresh VGG-sized compiles once this
        process carries the full suite's program cache.)"""
        _run_grad_check_subprocess('''
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from nerffaceediting_tpu.io.vgg import init_vgg16, lpips_features, vgg16_feature_maps
params = init_vgg16(jax.random.key(0))
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(0, 255, (1, 3, 32, 32)).astype(np.float32))
b = jnp.asarray(rng.uniform(0, 255, (1, 3, 32, 32)).astype(np.float32))
fa, fb = lpips_features(params, a), lpips_features(params, b)
got = float(jnp.sum(jnp.square(fa - fb)))
want = 0.0
for ma, mb in zip(vgg16_feature_maps(params, a), vgg16_feature_maps(params, b)):
    na = ma / jnp.sqrt(jnp.sum(jnp.square(ma), 1, keepdims=True) + 1e-10)
    nb = mb / jnp.sqrt(jnp.sum(jnp.square(mb), 1, keepdims=True) + 1e-10)
    want += float(jnp.mean(jnp.sum(jnp.square(na - nb), axis=1)))
np.testing.assert_allclose(got, want, rtol=1e-4)
print("OK")
''')

    def test_lin_weights_scale_layers(self):
        _run_grad_check_subprocess('''
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from nerffaceediting_tpu.io.vgg import init_vgg16, lpips_features
params = init_vgg16(jax.random.key(0))
img = jnp.asarray(np.random.default_rng(1).uniform(
    0, 255, (1, 3, 32, 32)).astype(np.float32))
lin = {f"lin{l}": jnp.full((c,), 0.25) for l, c in
       enumerate([64, 128, 256, 512, 512])}
f1 = lpips_features(params, img)
f2 = lpips_features(params, img, lin=lin)
np.testing.assert_allclose(np.asarray(f2), np.asarray(f1) * 0.5, rtol=1e-5)
print("OK")
''')

    def test_spatial_features_localize_gradients(self):
        """The inversion-relevant property the pooled embedding lacks: the
        LPIPS distance gradient concentrates at the perturbed region.
        (Subprocess-isolated: see test_feature_fn_differentiable.)"""
        _run_grad_check_subprocess('''
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from nerffaceediting_tpu.io.vgg import init_vgg16, lpips_features, vgg16_features
params = init_vgg16(jax.random.key(0))
rng = np.random.default_rng(2)
base = rng.uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)
pert = base.copy()
pert[:, :, 8:24, 8:24] += 60.0

def localization(feat_fn):
    tgt = feat_fn(jnp.asarray(base))
    d = lambda img: jnp.sum(jnp.square(feat_fn(img) - tgt))
    g = np.abs(np.asarray(jax.grad(d)(jnp.asarray(pert))))
    return g[:, :, 0:40, 0:40].sum() / g.sum()

loc_spatial = localization(lambda im: lpips_features(params, im))
loc_pooled = localization(lambda im: vgg16_features(params, im))
assert loc_spatial > 0.5, loc_spatial
assert loc_spatial > loc_pooled + 0.05, (loc_spatial, loc_pooled)
print("OK")
''')
