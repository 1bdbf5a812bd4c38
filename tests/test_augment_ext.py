"""ADA augmentation + discriminator-variant + dataset/CLI tests."""

import json
import os
import zipfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerffaceediting_tpu.config import DiscriminatorConfig
from nerffaceediting_tpu.train.augment import AdaController, AugmentConfig, augment_pipe


class TestAugmentPipe:
    def test_p_zero_is_identity(self):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32))
        out = augment_pipe(jax.random.key(0), imgs, p=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)

    def test_p_one_changes_images(self):
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
        out = augment_pipe(jax.random.key(1), imgs, p=1.0)
        assert np.abs(np.asarray(out) - np.asarray(imgs)).max() > 0.01
        assert np.all(np.isfinite(np.asarray(out)))

    def test_six_channel_dual_input(self):
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 6, 16, 16)).astype(np.float32))
        out = augment_pipe(jax.random.key(2), imgs, p=0.5)
        assert out.shape == imgs.shape

    def test_geometric_only_preserves_colors_statistically(self):
        """With color augs off, the pixel value SET is preserved up to
        resampling (mean within tolerance)."""
        cfg = AugmentConfig(brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
                            scale=0, rotate=0, aniso=0, xfrac=0, xint=0)
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
        out = augment_pipe(jax.random.key(3), imgs, p=1.0, cfg=cfg)
        # only xflip/rot90 active → pixel multiset identical per sample
        for b in range(4):
            np.testing.assert_allclose(
                np.sort(np.asarray(out[b]).ravel()),
                np.sort(np.asarray(imgs[b]).ravel()), atol=1e-5)

    def test_ada_controller(self):
        ctl = AdaController(target=0.6, speed_kimg=1.0)
        p1 = ctl.update(real_sign_mean=1.0, n_img=100)  # overconfident D → p up
        assert p1 > 0
        for _ in range(100):
            ctl.update(real_sign_mean=0.0, n_img=100)  # weak D → p down
        assert ctl.p == 0.0

    def test_imgfilter_band0_near_identity(self):
        """Band 0 is the lowpass identity: amplifying it only rescales power,
        so with imgfilter on but all draws gated off (p tiny), output ≈ input;
        with p=1 the filtered image differs but stays finite and same-shape
        (ref augment.py:383-412)."""
        cfg = AugmentConfig(xflip=0, rotate90=0, xint=0, scale=0, rotate=0,
                            aniso=0, xfrac=0, brightness=0, contrast=0,
                            lumaflip=0, hue=0, saturation=0, imgfilter=1.0)
        rng = np.random.default_rng(5)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32))
        out0 = augment_pipe(jax.random.key(4), imgs, p=0.0, cfg=cfg)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(imgs), atol=1e-4)
        out1 = augment_pipe(jax.random.key(4), imgs, p=1.0, cfg=cfg)
        assert out1.shape == imgs.shape
        assert np.all(np.isfinite(np.asarray(out1)))
        assert np.abs(np.asarray(out1) - np.asarray(imgs)).max() > 1e-3

    def test_noise_and_cutout(self):
        cfg = AugmentConfig(xflip=0, rotate90=0, xint=0, scale=0, rotate=0,
                            aniso=0, xfrac=0, brightness=0, contrast=0,
                            lumaflip=0, hue=0, saturation=0,
                            noise=1.0, cutout=1.0)
        imgs = jnp.ones((2, 3, 32, 32), jnp.float32) * 0.5
        out = augment_pipe(jax.random.key(7), imgs, p=1.0, cfg=cfg)
        a = np.asarray(out)
        assert a.shape == imgs.shape
        # cutout zeroes a ~16×16 rectangle (0.5 of each dim)
        zero_frac = np.mean(np.all(np.abs(a) < 1e-6, axis=1))
        assert 0.0 < zero_frac < 0.6
        # additive noise perturbs the remaining pixels
        assert np.abs(a - 0.5).max() > 0.01

    def test_traced_p_does_not_recompile(self):
        """p is traced: two different strengths reuse one compiled program."""
        compiled = jax.jit(lambda k, x, p: augment_pipe(k, x, p))
        imgs = jnp.zeros((1, 3, 8, 8))
        compiled(jax.random.key(0), imgs, jnp.asarray(0.3))
        n0 = compiled._cache_size()
        compiled(jax.random.key(0), imgs, jnp.asarray(0.7))
        assert compiled._cache_size() == n0


@pytest.mark.slow  # heavy compile (r3 durations); full tier only
class TestDiscriminatorVariants:
    def test_single_and_dummy(self):
        from nerffaceediting_tpu.models.discriminator import (
            dummy_dual_discriminator, init_dual_discriminator,
            init_single_discriminator, single_discriminator)

        cfg = DiscriminatorConfig(img_resolution=32, channel_base=512, channel_max=32,
                                  mbstd_group_size=2)
        img = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
        raw = jax.random.normal(jax.random.key(2), (2, 3, 8, 8))
        c = jax.random.normal(jax.random.key(3), (2, 25))

        sp = init_single_discriminator(jax.random.key(0), cfg)
        logits = single_discriminator(sp, img, raw, c, cfg)
        assert logits.shape == (2, 1)

        dp = init_dual_discriminator(jax.random.key(4), cfg)
        l1 = dummy_dual_discriminator(dp, img, raw, c, cfg, raw_fade=1.0)
        l0 = dummy_dual_discriminator(dp, img, raw, c, cfg, raw_fade=0.0)
        assert l1.shape == (2, 1)
        assert np.abs(np.asarray(l1) - np.asarray(l0)).max() > 1e-6


class TestDatasetTool:
    def test_center_crop_wide_letterboxes(self):
        """center-crop-wide (ref dataset_tool.py:240-252): the 2:1 content
        lands letterboxed on a black square canvas — never stretched — and
        undersized inputs are rejected (None)."""
        import PIL.Image

        from nerffaceediting_tpu.apps.dataset_tool import transform_image

        white = PIL.Image.new("RGB", (64, 40), (255, 255, 255))
        out = transform_image(white, 16, "center-crop-wide")
        arr = np.asarray(out)
        assert arr.shape == (16, 16, 3)
        # top/bottom 4-row bars are black, the center 8 rows carry content
        assert arr[:4].max() == 0 and arr[-4:].max() == 0
        assert arr[4:12].min() == 255
        # too-small input (w < resolution) is rejected, not upscaled
        tiny = PIL.Image.new("RGB", (8, 8), (255, 255, 255))
        assert transform_image(tiny, 16, "center-crop-wide") is None

    def test_roundtrip(self, tmp_path):
        import PIL.Image

        src = tmp_path / "src"
        os.makedirs(src)
        rng = np.random.default_rng(0)
        labels = []
        for i in range(3):
            arr = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            fname = f"img{i}.png"
            PIL.Image.fromarray(arr).save(src / fname)
            labels.append([fname, rng.normal(size=25).tolist()])
        with open(src / "dataset.json", "w") as f:
            json.dump({"labels": labels}, f)

        from nerffaceediting_tpu.apps.dataset_tool import convert
        dest = str(tmp_path / "out.zip")
        n = convert(str(src), dest, resolution=16, transform="center-crop")
        assert n == 3

        from nerffaceediting_tpu.train.dataset import ImageFolderDataset, data_iterator
        ds = ImageFolderDataset(dest)
        assert len(ds) == 3 and ds.label_dim == 25
        img, lab = ds[0]
        assert img.shape == (3, 16, 16) and lab.shape == (25,)
        batch = next(data_iterator(ds, batch_size=2))
        assert batch["image"].shape == (2, 3, 16, 16)
        assert batch["image"].min() >= -1.0 and batch["image"].max() <= 1.0


class TestTrainCLI:
    def test_dry_run(self, tmp_path, capsys):
        from nerffaceediting_tpu.apps.train import main

        # dataset arg unused in dry-run config-validation mode
        main(["--data", "unused", "--outdir", str(tmp_path), "--dry-run",
              "--gen-pose-cond"])
        out = capsys.readouterr().out
        assert "dry run OK" in out
        run_dirs = os.listdir(tmp_path)
        assert len(run_dirs) == 1
        assert os.path.exists(os.path.join(tmp_path, run_dirs[0], "training_options.json"))


@pytest.mark.slow  # heavy compile (r3 durations); full tier only
class TestFreezeD:
    def test_mask_ordering_and_step(self):
        """freeze_d_mask freezes fromrgb→conv0→conv1→skip from the top block
        (ref networks_stylegan2.py:585-607 threads trainable_iter through all
        four), and a dreg step leaves frozen params untouched."""
        import dataclasses

        import jax.numpy as jnp

        from nerffaceediting_tpu.models.discriminator import (
            freeze_d_mask, init_dual_discriminator)

        cfg = DiscriminatorConfig(img_resolution=32, channel_base=512,
                                  channel_max=32, mbstd_group_size=2,
                                  freezed=4)
        params = init_dual_discriminator(jax.random.key(0), cfg)
        mask = freeze_d_mask(params, cfg)
        # top block (b32): fromrgb, conv0, conv1, skip frozen (4 layers) —
        # the resnet skip freezes with its block; b16 starts trainable
        assert not mask["b32"]["fromrgb"]["weight"]
        assert not mask["b32"]["conv0"]["weight"]
        assert not mask["b32"]["conv1"]["weight"]
        assert not mask["b32"]["skip"]["weight"]
        assert mask["b16"]["conv0"]["weight"]
        assert mask["b16"]["conv1"]["weight"]
        assert mask["b16"]["skip"]["weight"]
        assert mask["b4"]["fc"]["weight"]

        from nerffaceediting_tpu.models import triplane
        from nerffaceediting_tpu.train.loss import LossConfig
        from nerffaceediting_tpu.train.step import (
            OptimizerConfig, dreg_step, init_train_state)
        from tests.test_train import tiny_setup

        g_cfg, d_cfg = tiny_setup()
        d_cfg = dataclasses.replace(d_cfg, freezed=3)
        g_params = triplane.init_generator(jax.random.key(1), g_cfg)
        state = init_train_state(g_params, init_dual_discriminator(
            jax.random.key(2), d_cfg), OptimizerConfig())
        top = f"b{d_cfg.img_resolution}"
        before = np.asarray(state.d_params[top]["conv0"]["weight"]).copy()
        before_free = np.asarray(state.d_params["b8"]["conv1"]["weight"]).copy()

        real = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (4, 3, d_cfg.img_resolution, d_cfg.img_resolution)).astype(np.float32))
        # nonzero camera labels: c=0 nulls the cmap head (embed biases init
        # to 0, as in the reference) and with it every gradient
        c = jnp.asarray(np.random.default_rng(1).normal(
            size=(4, 25)).astype(np.float32))
        state, _ = dreg_step(state, real, c, jax.random.key(3), d_cfg=d_cfg,
                             loss_cfg=LossConfig(), opt_cfg=OptimizerConfig())
        np.testing.assert_array_equal(
            np.asarray(state.d_params[top]["conv0"]["weight"]), before)
        assert np.abs(np.asarray(
            state.d_params["b8"]["conv1"]["weight"]) - before_free).max() > 0


class TestDatasetToolSources:
    def test_cifar10(self, tmp_path):
        """Synthetic cifar-10-python.tar.gz → zip with class labels
        (ref dataset_tool.py open_cifar10)."""
        import pickle
        import tarfile

        rng = np.random.default_rng(0)
        src = str(tmp_path / "cifar-10-python.tar.gz")
        with tarfile.open(src, "w:gz") as tar:
            for b in range(1, 6):
                data = {
                    "data": rng.integers(0, 255, (2, 3072), dtype=np.uint8),
                    "labels": [int(b % 10), int((b + 1) % 10)],
                }
                buf = pickle.dumps(data)
                info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{b}")
                info.size = len(buf)
                import io as _io
                tar.addfile(info, _io.BytesIO(buf))

        from nerffaceediting_tpu.apps.dataset_tool import convert
        dest = str(tmp_path / "cifar.zip")
        n = convert(src, dest, resolution=32)
        assert n == 10
        with zipfile.ZipFile(dest) as z:
            labels = json.loads(z.read("dataset.json"))["labels"]
            assert len(labels) == 10

    def test_mnist(self, tmp_path):
        """Synthetic idx-format MNIST (ref dataset_tool.py open_mnist)."""
        import gzip

        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, (3, 28, 28), dtype=np.uint8)
        labs = np.asarray([1, 2, 3], np.uint8)
        src = str(tmp_path / "train-images-idx3-ubyte.gz")
        with gzip.open(src, "wb") as f:
            f.write(b"\x00" * 16 + imgs.tobytes())
        with gzip.open(str(tmp_path / "train-labels-idx1-ubyte.gz"), "wb") as f:
            f.write(b"\x00" * 8 + labs.tobytes())

        from nerffaceediting_tpu.apps.dataset_tool import convert
        dest = str(tmp_path / "mnist.zip")
        n = convert(src, dest)
        assert n == 3
        with zipfile.ZipFile(dest) as z:
            assert len([f for f in z.namelist() if f.endswith(".png")]) == 3
            labels = json.loads(z.read("dataset.json"))["labels"]
            assert [l for _, l in labels] == [1, 2, 3]
