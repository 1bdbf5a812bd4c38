"""Metric math tests (FID/KID/IS/PR cores against analytic cases)."""

import numpy as np
import pytest

from nerffaceediting_tpu.metrics.feature_stats import FeatureStats
from nerffaceediting_tpu.metrics.metric_main import (
    frechet_distance,
    inception_score,
    kernel_distance,
    list_metrics,
    precision_recall,
)


class TestFeatureStats:
    def test_mean_cov_streaming(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1000, 16)).astype(np.float32)
        stats = FeatureStats(capture_mean_cov=True)
        for chunk in np.array_split(x, 7):
            stats.append(chunk)
        mean, cov = stats.get_mean_cov()
        np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-5)
        np.testing.assert_allclose(cov, np.cov(x.T, bias=True), atol=1e-4)

    def test_max_items_cap(self):
        stats = FeatureStats(capture_all=True, max_items=10)
        stats.append(np.ones((7, 4), np.float32))
        stats.append(np.ones((7, 4), np.float32))
        assert stats.num_items == 10
        assert stats.get_all().shape == (10, 4)


class TestFrechet:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(1)
        mu = rng.normal(size=8)
        a = rng.normal(size=(8, 8))
        cov = a @ a.T + np.eye(8)
        assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6

    def test_mean_shift(self):
        mu1 = np.zeros(4)
        mu2 = np.ones(4) * 2
        cov = np.eye(4)
        np.testing.assert_allclose(frechet_distance(mu1, cov, mu2, cov), 16.0, atol=1e-6)

    def test_isotropic_analytic(self):
        # FID between N(0, a²I) and N(0, b²I) in d dims = d(a-b)²
        d, a, b = 6, 1.0, 3.0
        got = frechet_distance(np.zeros(d), np.eye(d) * a**2, np.zeros(d), np.eye(d) * b**2)
        np.testing.assert_allclose(got, d * (a - b) ** 2, atol=1e-6)


class TestKID:
    def test_same_distribution_near_zero(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(500, 16))
        y = rng.normal(size=(500, 16))
        k_same = kernel_distance(x, y, num_subsets=20, max_subset_size=200)
        k_diff = kernel_distance(x, y + 3.0, num_subsets=20, max_subset_size=200)
        assert abs(k_same) < abs(k_diff)
        assert k_diff > 0.1


class TestIS:
    def test_confident_uniform_classifier(self):
        # perfectly confident, perfectly diverse → IS = num_classes
        n, k = 1000, 10
        probs = np.eye(k)[np.arange(n) % k]
        probs = probs * 0.999 + 0.001 / k
        score, _ = inception_score(probs, num_splits=5)
        assert score > 8.0
        # collapsed generator → IS ≈ 1
        probs_collapsed = np.tile(np.eye(k)[0] * 0.999 + 0.001 / k, (n, 1))
        score_c, _ = inception_score(probs_collapsed, num_splits=5)
        assert score_c < 1.1


class TestPrecisionRecall:
    def test_identical_supports(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(300, 8))
        p, r = precision_recall(x, x + rng.normal(size=(300, 8)) * 0.01)
        assert p > 0.9 and r > 0.9

    def test_disjoint_supports(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(200, 8))
        y = rng.normal(size=(200, 8)) + 50.0
        p, r = precision_recall(x, y)
        assert p < 0.1 and r < 0.1


def test_registry():
    # full reference surface (ref metric_main.py:87-114): fid50k_full,
    # kid50k_full, pr50k3_full, ppl2_wend, is50k, eqt50k_int/frac, eqr50k
    assert {"fid", "kid", "pr", "ppl", "is50k",
            "eqt50k_int", "eqt50k_frac", "eqr50k"} <= set(list_metrics())


class TestRegisteredIS:
    def test_probs_head_and_is(self):
        """inception_probs returns a valid softmax and the registered IS
        math consumes it (pinned: keyed-random fc head on fixture images
        is maximally uninformative → IS ≈ 1)."""
        import jax

        from nerffaceediting_tpu.metrics.inception_jax import (
            init_inception, inception_probs_fn_jax)

        params = init_inception(jax.random.key(0))
        fn = inception_probs_fn_jax(params)
        imgs = TestPinnedRegressionValues._fixture_images(1, 10.0)
        probs = fn(imgs)
        assert probs.shape == (24, 1000)
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
        score, std = inception_score(probs, num_splits=3)
        np.testing.assert_allclose(score, 1.0002907514572144, rtol=1e-3)


class TestRegisteredEquivariance:
    @pytest.mark.slow
    def test_eqt_eqr_registered_on_tiny_sg3(self):
        """eqt50k_int / eqt50k_frac / eqr50k run through calc_metric on a
        tiny random SG3 generator and return finite PSNRs (ref
        metric_main.py:100-114)."""
        import jax

        from nerffaceediting_tpu.metrics.metric_main import calc_metric
        from nerffaceediting_tpu.models.stylegan3 import init_sg3_generator

        params, static = init_sg3_generator(
            jax.random.key(0), z_dim=8, c_dim=0, w_dim=8, img_resolution=32,
            channel_base=512, channel_max=16, num_layers=4, num_critical=2)
        for name, key in (("eqt50k_int", "eqt_int"),
                          ("eqt50k_frac", "eqt_frac"),
                          ("eqr50k", "eqr")):
            r = calc_metric(name, sg3_params=params, sg3_static=static,
                            num_samples=2, z_dim=8)
            assert np.isfinite(r["results"][key]), (name, r)

    def test_eq_metrics_require_sg3(self):
        from nerffaceediting_tpu.metrics.metric_main import calc_metric

        with pytest.raises(ValueError, match="sg3"):
            calc_metric("eqt50k_int")


class TestPinnedRegressionValues:
    """Pinned fixture-FID/KID through the keyed-random JAX InceptionV3
    (VERDICT r2 #7): a silent regression in the detector architecture,
    preprocessing, or the FID/KID math moves these values far outside the
    1% tolerance (verified deterministic across runs on the CPU mesh)."""

    PINNED_FID = 112.9909419559659
    PINNED_KID = 0.8619195222854614

    @staticmethod
    def _fixture_images(seed, amp):
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
        r = np.random.default_rng(seed)
        base = (128 + 80 * np.sin(2 * np.pi * (
            xx[None] * r.uniform(0.5, 2.0, (24, 1, 1))
            + yy[None] * r.uniform(0.5, 2.0, (24, 1, 1)))))
        img = base[..., None] + amp * r.normal(size=(24, 64, 64, 3))
        return np.clip(img, 0, 255).astype(np.uint8)

    def test_fid_kid_pinned(self):
        import jax

        from nerffaceediting_tpu.metrics.inception_jax import (
            inception_features_fn_jax, init_inception)

        params = init_inception(jax.random.key(0))
        fn = inception_features_fn_jax(params)
        fr = fn(self._fixture_images(1, 10.0))
        fg = fn(self._fixture_images(2, 40.0))
        mu_r, cov_r = fr.mean(0), np.cov(fr, rowvar=False)
        mu_g, cov_g = fg.mean(0), np.cov(fg, rowvar=False)
        fid = frechet_distance(mu_r, cov_r, mu_g, cov_g)
        kid = kernel_distance(fr, fg, num_subsets=10, max_subset_size=20)
        np.testing.assert_allclose(fid, self.PINNED_FID, rtol=1e-2)
        np.testing.assert_allclose(kid, self.PINNED_KID, rtol=1e-2)
