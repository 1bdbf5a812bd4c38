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
        params = init_vgg16(jax.random.key(0))
        fn = make_feature_fn(params)
        img = jax.random.uniform(jax.random.key(1), (1, 3, 32, 32), maxval=255.0)
        g = jax.grad(lambda x: jnp.sum(jnp.square(fn(x))))(img)
        assert np.all(np.isfinite(np.asarray(g)))
