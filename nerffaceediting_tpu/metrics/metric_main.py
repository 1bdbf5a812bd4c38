"""GAN quality metrics: FID, KID, IS, precision/recall, PPL.

Rebuild of ref metrics/ (metric_main.py registry + per-metric modules).
Feature extractors are injected: the reference downloads NVIDIA's
InceptionV3/CLIP/VGG16 TorchScript pickles (metric_utils.py:45-68); this
framework accepts any `(uint8 images NHWC) → (N, D) features` callable, with
`inception_features_fn()` building one from a local torchscript/torch
checkpoint when present. The metric MATH is complete and tested; plug in the
detector weights for paper-comparable numbers.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .feature_stats import FeatureStats

FeatureFn = Callable[[np.ndarray], np.ndarray]  # (N,H,W,3) uint8 → (N,D)


# ---------------------------------------------------------------------------
# Fréchet / kernel / precision-recall math

def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """FID core (ref metrics/frechet_inception_distance.py:35-38)."""
    import scipy.linalg

    m = np.square(mu1 - mu2).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(cov1, cov2), disp=False)
    return float(np.real(m + np.trace(cov1 + cov2 - s * 2)))


def kernel_distance(feat_real: np.ndarray, feat_gen: np.ndarray,
                    num_subsets: int = 100, max_subset_size: int = 1000,
                    seed: int = 0) -> float:
    """KID: polynomial-kernel MMD over feature subsets
    (ref metrics/kernel_inception_distance.py:20-42)."""
    n = feat_real.shape[1]
    m = min(min(feat_real.shape[0], feat_gen.shape[0]), max_subset_size)
    rng = np.random.default_rng(seed)
    t = 0.0
    for _ in range(num_subsets):
        x = feat_gen[rng.choice(feat_gen.shape[0], m, replace=False)]
        y = feat_real[rng.choice(feat_real.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.diag(a).sum()) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


def inception_score(probs: np.ndarray, num_splits: int = 10):
    """IS over classifier softmax outputs (ref metrics/inception_score.py)."""
    scores = []
    n = probs.shape[0]
    for i in range(num_splits):
        part = probs[i * n // num_splits : (i + 1) * n // num_splits]
        kl = part * (np.log(part + 1e-12) - np.log(part.mean(axis=0, keepdims=True) + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def precision_recall(feat_real: np.ndarray, feat_gen: np.ndarray,
                     nhood_size: int = 3, row_batch: int = 10000):
    """Improved precision & recall via k-NN manifold estimation
    (ref metrics/precision_recall.py:38-62)."""
    def knn_radii(feats):
        d = np.sqrt(
            np.maximum(
                np.square(feats).sum(1)[:, None]
                + np.square(feats).sum(1)[None, :]
                - 2 * feats @ feats.T, 0))
        d_sorted = np.sort(d, axis=1)
        return d_sorted[:, nhood_size]  # distance to k-th neighbour (excl self at 0)

    def fraction_within(query, ref_feats, radii):
        d = np.sqrt(
            np.maximum(
                np.square(query).sum(1)[:, None]
                + np.square(ref_feats).sum(1)[None, :]
                - 2 * query @ ref_feats.T, 0))
        return float(np.mean(np.any(d <= radii[None, :], axis=1)))

    precision = fraction_within(feat_gen, feat_real, knn_radii(feat_real))
    recall = fraction_within(feat_real, feat_gen, knn_radii(feat_gen))
    return precision, recall


# ---------------------------------------------------------------------------
# Feature plumbing

def images_from_generator(params, cfg, num: int, batch: int, rng,
                          pose_sampler=None) -> Iterable[np.ndarray]:
    """z~N(0,1) batches → uint8 images (ref metric_utils.py:265-294)."""
    from ..models import triplane
    from ..render.cameras import camera_params, fov_to_intrinsics, lookat_pose

    if pose_sampler is None:
        intr = fov_to_intrinsics(18.837)
        pose = lookat_pose(np.pi / 2, np.pi / 2, cfg.rendering.avg_camera_pivot,
                           radius=cfg.rendering.avg_camera_radius)
        c1 = camera_params(pose, intr)
        pose_sampler = lambda key, n: jnp.tile(c1, (n, 1))

    @jax.jit
    def gen(params, z, c):
        out = triplane.generate(params, z, c, cfg)["image"]
        img = jnp.clip((out + 1) * 127.5, 0, 255).astype(jnp.uint8)
        return img.transpose(0, 2, 3, 1)

    done = 0
    i = 0
    while done < num:
        n = min(batch, num - done)
        key = jax.random.fold_in(rng, i)
        z = jax.random.normal(key, (batch, cfg.z_dim))
        c = pose_sampler(key, batch)
        imgs = np.asarray(gen(params, z, c))[:n]
        done += n
        i += 1
        yield imgs


def compute_feature_stats_for_generator(params, cfg, feature_fn: FeatureFn,
                                        num: int, batch: int = 8, seed: int = 0,
                                        capture_all=False, capture_mean_cov=True,
                                        pose_sampler=None) -> FeatureStats:
    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov,
                         max_items=num)
    rng = jax.random.key(seed)
    for imgs in images_from_generator(params, cfg, num, batch, rng, pose_sampler):
        stats.append(feature_fn(imgs))
    return stats


def compute_feature_stats_for_dataset(dataset, feature_fn: FeatureFn, num: Optional[int],
                                      batch: int = 32, cache_dir: Optional[str] = None,
                                      cache_tag: str = "", capture_all=False,
                                      capture_mean_cov=True) -> FeatureStats:
    """Dataset feature stats with md5-keyed caching
    (ref metric_utils.py:211-261)."""
    import hashlib
    import pickle

    cache_file = None
    if cache_dir is not None:
        key = hashlib.md5(f"{cache_tag}|{num}|{capture_all}".encode()).hexdigest()
        cache_file = os.path.join(cache_dir, f"feature-stats-{key}.pkl")
        if os.path.exists(cache_file):
            with open(cache_file, "rb") as f:
                return pickle.load(f)

    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov,
                         max_items=num)
    n = len(dataset) if num is None else min(num, len(dataset))
    for start in range(0, n, batch):
        imgs = []
        for i in range(start, min(start + batch, n)):
            img, _ = dataset[i]
            imgs.append(img.transpose(1, 2, 0))  # CHW→HWC uint8
        stats.append(feature_fn(np.stack(imgs)))

    if cache_file is not None:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_file + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(stats, f)
        os.replace(tmp, cache_file)  # atomic (ref metric_utils.py:258-260)
    return stats


def inception_features_fn(model_path: Optional[str] = None) -> FeatureFn:
    """Build an InceptionV3-style feature extractor from a local TorchScript
    file (the reference's inception-2015-12-05.pkl, metric_utils.py:64-65)
    or torchvision weights if installed. Raises if neither is available."""
    import torch

    if model_path is not None and os.path.exists(model_path):
        model = torch.jit.load(model_path).eval()

        def fn(imgs: np.ndarray) -> np.ndarray:
            x = torch.tensor(imgs.transpose(0, 3, 1, 2))
            with torch.no_grad():
                return model(x, return_features=True).numpy()

        return fn
    try:
        import torchvision

        m = torchvision.models.inception_v3(weights="IMAGENET1K_V1")
        m.fc = torch.nn.Identity()
        m.eval()

        def fn(imgs: np.ndarray) -> np.ndarray:
            x = torch.tensor(imgs.transpose(0, 3, 1, 2)).float() / 255.0
            x = torch.nn.functional.interpolate(x, (299, 299), mode="bilinear")
            x = (x - torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)) / torch.tensor(
                [0.229, 0.224, 0.225]).view(1, 3, 1, 1)
            with torch.no_grad():
                return m(x).numpy()

        return fn
    except Exception as e:  # zero-egress env: no weights available
        raise RuntimeError(
            "No Inception weights available; pass a local TorchScript path "
            "or use a custom feature_fn") from e


# ---------------------------------------------------------------------------
# Registry (ref metric_main.py:44-91)

_METRICS: Dict[str, Callable] = {}


def register_metric(fn):
    _METRICS[fn.__name__] = fn
    return fn


def list_metrics():
    return sorted(_METRICS)


def calc_metric(metric: str, **kwargs) -> Dict:
    """Compute a registered metric; returns the reference's result-dict
    layout (ref metric_main.py:44-82)."""
    assert metric in _METRICS, f"unknown metric {metric}; have {list_metrics()}"
    start = time.time()
    results = _METRICS[metric](**kwargs)
    return {
        "results": results,
        "metric": metric,
        "total_time": time.time() - start,
    }


def report_metric(result: Dict, run_dir: Optional[str] = None, snapshot: str = "") -> None:
    line = json.dumps({**result, "snapshot_pkl": snapshot, "timestamp": time.time()})
    print(line)
    if run_dir is not None:
        with open(os.path.join(run_dir, f"metric-{result['metric']}.jsonl"), "at") as f:
            f.write(line + "\n")


@register_metric
def fid(params=None, cfg=None, dataset=None, feature_fn=None, num_real=50000,
        num_gen=50000, batch=8, cache_dir=None, **kw):
    """fid50k_full equivalent (ref metric_main.py:87-91)."""
    real = compute_feature_stats_for_dataset(
        dataset, feature_fn, num_real, cache_dir=cache_dir, cache_tag="fid-real")
    gen = compute_feature_stats_for_generator(params, cfg, feature_fn, num_gen, batch)
    mu_r, cov_r = real.get_mean_cov()
    mu_g, cov_g = gen.get_mean_cov()
    return {"fid": frechet_distance(mu_g, cov_g, mu_r, cov_r)}


@register_metric
def fid_clip(params=None, cfg=None, dataset=None, clip_params=None,
             num_real=50000, num_gen=50000, batch=8, cache_dir=None, **kw):
    """FID over CLIP ViT-B/32 image features (ref metric_utils.py:45-63 clip
    branch + frechet_inception_distance.py:45 fid50k_clip) — fully JAX-side
    via metrics/clip_jax.py; clip_params defaults to converted weights at
    $NFE_CLIP_WEIGHTS (a transformers CLIPVisionModel state_dict)."""
    from .clip_jax import clip_features_fn, convert_clip_state_dict

    if clip_params is None:
        path = os.environ.get("NFE_CLIP_WEIGHTS")
        if not path or not os.path.exists(path):
            raise RuntimeError(
                "fid_clip needs clip_params or $NFE_CLIP_WEIGHTS "
                "(transformers CLIPVisionModel state_dict)")
        import torch

        clip_params = convert_clip_state_dict(torch.load(path, map_location="cpu"))
    fn = clip_features_fn(clip_params)
    real = compute_feature_stats_for_dataset(
        dataset, fn, num_real, cache_dir=cache_dir, cache_tag="fidclip-real")
    gen = compute_feature_stats_for_generator(params, cfg, fn, num_gen, batch)
    mu_r, cov_r = real.get_mean_cov()
    mu_g, cov_g = gen.get_mean_cov()
    return {"fid_clip": frechet_distance(mu_g, cov_g, mu_r, cov_r)}


@register_metric
def kid(params=None, cfg=None, dataset=None, feature_fn=None, num_real=50000,
        num_gen=50000, batch=8, **kw):
    real = compute_feature_stats_for_dataset(dataset, feature_fn, num_real,
                                             capture_all=True, capture_mean_cov=False)
    gen = compute_feature_stats_for_generator(params, cfg, feature_fn, num_gen, batch,
                                              capture_all=True, capture_mean_cov=False)
    return {"kid": kernel_distance(real.get_all(), gen.get_all())}


@register_metric
def pr(params=None, cfg=None, dataset=None, feature_fn=None, num_real=10000,
       num_gen=10000, batch=8, **kw):
    real = compute_feature_stats_for_dataset(dataset, feature_fn, num_real,
                                             capture_all=True, capture_mean_cov=False)
    gen = compute_feature_stats_for_generator(params, cfg, feature_fn, num_gen, batch,
                                              capture_all=True, capture_mean_cov=False)
    p, r = precision_recall(real.get_all(), gen.get_all())
    return {"precision": p, "recall": r}


@register_metric
def is50k(params=None, cfg=None, probs_fn=None, num_gen=50000, batch=8,
          num_splits=10, **kw):
    """Inception Score over generated images (ref metric_main.py:95-99
    is50k → metrics/inception_score.py:20). probs_fn: uint8 NHWC →
    (N, 1000) classifier softmax; defaults to the JAX InceptionV3 head
    (metrics/inception_jax.inception_probs_fn_jax)."""
    if probs_fn is None:
        from .inception_jax import inception_probs_fn_jax

        probs_fn = inception_probs_fn_jax()
    rng = jax.random.key(0)
    all_probs = []
    for imgs in images_from_generator(params, cfg, num_gen, batch, rng):
        all_probs.append(probs_fn(imgs))
    mean, std = inception_score(np.concatenate(all_probs), num_splits)
    return {"is_mean": mean, "is_std": std}


@register_metric
def eqt50k_int(sg3_params=None, sg3_static=None, num_samples=32,
               z_dim=512, **kw):
    """SG3 translation equivariance, integer-pixel shifts
    (ref metric_main.py:100-104 eqt50k_int → equivariance.py:194)."""
    from .equivariance import eqt_psnr

    if sg3_params is None or sg3_static is None:
        raise ValueError("eqt50k_int needs sg3_params/sg3_static (an SG3 "
                         "generator — EQ metrics are SG3-specific)")
    return {"eqt_int": eqt_psnr(sg3_params, sg3_static,
                                num_samples=num_samples, z_dim=z_dim)}


@register_metric
def eqt50k_frac(sg3_params=None, sg3_static=None, num_samples=32,
                z_dim=512, **kw):
    """SG3 translation equivariance, fractional shifts (FFT subpixel
    comparison; ref metric_main.py:105-109 eqt50k_frac)."""
    from .equivariance import eqt_frac_psnr

    if sg3_params is None or sg3_static is None:
        raise ValueError("eqt50k_frac needs sg3_params/sg3_static")
    return {"eqt_frac": eqt_frac_psnr(sg3_params, sg3_static,
                                      num_samples=num_samples, z_dim=z_dim)}


@register_metric
def eqr50k(sg3_params=None, sg3_static=None, num_samples=16, z_dim=512, **kw):
    """SG3 rotation equivariance (ref metric_main.py:110-114 eqr50k)."""
    from .equivariance import eqr_psnr

    if sg3_params is None or sg3_static is None:
        raise ValueError("eqr50k needs sg3_params/sg3_static")
    return {"eqr": eqr_psnr(sg3_params, sg3_static,
                            num_samples=num_samples, z_dim=z_dim)}


@register_metric
def ppl(params=None, cfg=None, feature_fn=None, num_samples=2000, batch=4,
        epsilon=1e-4, seed=0, **kw):
    """Perceptual path length in W (ref metrics/perceptual_path_length.py:96):
    feature distance between renders at w and lerp(w, w2, ε), scaled by ε⁻²."""
    from ..models import triplane
    from ..render.cameras import camera_params, fov_to_intrinsics, lookat_pose

    intr = fov_to_intrinsics(18.837)
    pose = lookat_pose(np.pi / 2, np.pi / 2, cfg.rendering.avg_camera_pivot,
                       radius=cfg.rendering.avg_camera_radius)
    c1 = camera_params(pose, intr)

    @jax.jit
    def pair(params, z0, z1, t, c):
        ws0 = triplane.mapping(params, z0, c, cfg)
        ws1 = triplane.mapping(params, z1, c, cfg)
        wt0 = ws0 + (ws1 - ws0) * t[:, None, None]
        wt1 = ws0 + (ws1 - ws0) * (t[:, None, None] + epsilon)
        img0 = triplane.synthesis(params, wt0, c, cfg)["image"]
        img1 = triplane.synthesis(params, wt1, c, cfg)["image"]
        to_u8 = lambda x: jnp.clip((x + 1) * 127.5, 0, 255).astype(jnp.uint8)
        return to_u8(img0).transpose(0, 2, 3, 1), to_u8(img1).transpose(0, 2, 3, 1)

    rng = jax.random.key(seed)
    dists = []
    for i in range(0, num_samples, batch):
        k = jax.random.fold_in(rng, i)
        k0, k1, k2 = jax.random.split(k, 3)
        z0 = jax.random.normal(k0, (batch, cfg.z_dim))
        z1 = jax.random.normal(k1, (batch, cfg.z_dim))
        t = jax.random.uniform(k2, (batch,))
        c = jnp.tile(c1, (batch, 1))
        img0, img1 = pair(params, z0, z1, t, c)
        f0 = feature_fn(np.asarray(img0))
        f1 = feature_fn(np.asarray(img1))
        dists.append(np.square(f0 - f1).sum(axis=1) / epsilon**2)
    d = np.concatenate(dists)
    # reference filters outliers beyond the 1st/99th percentile
    lo, hi = np.percentile(d, [1, 99])
    return {"ppl": float(d[(d >= lo) & (d <= hi)].mean())}
