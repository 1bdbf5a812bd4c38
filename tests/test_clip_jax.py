"""CLIP ViT-B/32 JAX port — oracle test vs a locally-built random
transformers CLIPVisionModel (no network), + feature-fn smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerffaceediting_tpu.metrics.clip_jax import (
    clip_features_fn,
    clip_image_features,
    convert_clip_state_dict,
    init_clip,
)

# detector compiles ~80 s (measured r3) — excluded from the default dev tier
# (pytest -m 'not slow' tests/); the full tier still runs everything.
pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def torch_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    cfg = CLIPVisionConfig()  # defaults = ViT-B/32
    assert cfg.patch_size == 32 and cfg.hidden_size == 768
    return CLIPVisionModel(cfg).eval()


class TestClipPort:
    def test_pooled_features_match_torch(self, torch_clip):
        """Full tower parity on random weights: pooled (pre-projection)
        output vs transformers, maxabs < 1e-3."""
        params = convert_clip_state_dict(torch_clip.state_dict())
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (2, 3, 224, 224)).astype(np.float32)

        # transformers CLIPVisionModel expects CLIP-normalized input; our
        # function normalizes internally, so feed it the same normalized
        # tensor via the raw-255 interface.
        from nerffaceediting_tpu.metrics.clip_jax import CLIP_MEAN, CLIP_STD

        x = img / 255.0
        x = (x - np.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)) / np.asarray(
            CLIP_STD).reshape(1, 3, 1, 1)
        with torch.no_grad():
            want = torch_clip(pixel_values=torch.tensor(x)).pooler_output.numpy()

        got = np.asarray(clip_image_features(params, jnp.asarray(img),
                                             project=False))
        d = np.abs(got - want).max()
        assert d < 1e-3, f"maxabs {d}"

    def test_projection_applied(self, torch_clip):
        proj = torch.randn(512, 768)
        params = convert_clip_state_dict(torch_clip.state_dict(), proj=proj)
        img = jnp.asarray(np.random.default_rng(1).uniform(
            0, 255, (1, 3, 224, 224)).astype(np.float32))
        pooled = clip_image_features(params, img, project=False)
        projected = clip_image_features(params, img)
        assert projected.shape == (1, 512)
        np.testing.assert_allclose(
            np.asarray(projected),
            np.asarray(pooled) @ proj.numpy().T, rtol=2e-3, atol=2e-3)


class TestClipFeatureFn:
    def test_resize_and_batch(self):
        params = init_clip(jax.random.key(0))
        fn = clip_features_fn(params)
        imgs = np.random.default_rng(2).integers(
            0, 255, (3, 64, 64, 3), dtype=np.uint8)
        feats = fn(imgs)
        assert feats.shape == (3, 512)
        assert np.all(np.isfinite(feats))

    def test_fid_clip_stable_on_fixture(self):
        """FID-CLIP on a fixture dataset is deterministic and ~0 for
        identical distributions."""
        from nerffaceediting_tpu.metrics.metric_main import frechet_distance

        params = init_clip(jax.random.key(0))
        fn = clip_features_fn(params)
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
        f1, f2 = fn(imgs), fn(imgs)
        mu, cov = f1.mean(0), np.cov(f1, rowvar=False)
        mu2, cov2 = f2.mean(0), np.cov(f2, rowvar=False)
        assert abs(frechet_distance(mu, cov, mu2, cov2)) < 1e-3
