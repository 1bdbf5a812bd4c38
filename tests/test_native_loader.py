"""Native C++ data loader: build + correctness vs the Python loader."""

import json
import os
import zipfile

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset_zip(tmp_path_factory):
    import PIL.Image

    tmp = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    path = str(tmp / "ds.zip")
    labels = []
    imgs = {}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for i in range(5):
            arr = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
            name = f"img{i:04d}.png"
            import io

            buf = io.BytesIO()
            PIL.Image.fromarray(arr).save(buf, format="PNG")
            z.writestr(name, buf.getvalue())
            lab = rng.normal(size=25).astype(np.float32)
            labels.append([name, lab.tolist()])
            imgs[name] = arr
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    return path, imgs, labels


class TestNativeLoader:
    def test_builds_and_loads(self, dataset_zip):
        from nerffaceediting_tpu.native import NativeDataLoader, NativeLoaderUnavailable

        path, imgs, labels = dataset_zip
        try:
            loader = NativeDataLoader(path, resolution=24, batch_size=4, num_threads=2)
        except NativeLoaderUnavailable as e:
            pytest.skip(f"native loader unavailable: {e}")
        assert loader.dataset_size == 5
        assert loader.label_dim == 25
        batch = next(loader)
        assert batch["image"].shape == (4, 3, 24, 24)
        assert batch["label"].shape == (4, 25)
        assert batch["image"].min() >= -1.0 and batch["image"].max() <= 1.0
        loader.close()

    def test_pixel_and_label_fidelity(self, dataset_zip):
        """Every decoded image must exactly equal one source image (PNG is
        lossless, no resize at native resolution) with its matching label."""
        from nerffaceediting_tpu.native import NativeDataLoader, NativeLoaderUnavailable

        path, imgs, labels = dataset_zip
        try:
            loader = NativeDataLoader(path, resolution=24, batch_size=8, num_threads=1)
        except NativeLoaderUnavailable as e:
            pytest.skip(f"native loader unavailable: {e}")
        label_by_img = {}
        for name, lab in labels:
            key = imgs[name].tobytes()
            label_by_img[key] = np.asarray(lab, np.float32)

        batch = next(loader)
        for b in range(8):
            u8 = ((batch["image"][b].transpose(1, 2, 0) + 1) * 127.5 + 0.5).astype(np.uint8)
            key = u8.tobytes()
            assert key in label_by_img, "decoded image doesn't match any source"
            np.testing.assert_allclose(batch["label"][b], label_by_img[key], atol=1e-6)
        loader.close()

    def test_resize_path(self, dataset_zip):
        from nerffaceediting_tpu.native import NativeDataLoader, NativeLoaderUnavailable

        path, _, _ = dataset_zip
        try:
            loader = NativeDataLoader(path, resolution=16, batch_size=2)
        except NativeLoaderUnavailable as e:
            pytest.skip(f"native loader unavailable: {e}")
        batch = next(loader)
        assert batch["image"].shape == (2, 3, 16, 16)
        assert np.all(np.isfinite(batch["image"]))
        loader.close()

    def test_sharded_streams_disjoint_rng(self, dataset_zip):
        from nerffaceediting_tpu.native import NativeDataLoader, NativeLoaderUnavailable

        path, _, _ = dataset_zip
        try:
            l0 = NativeDataLoader(path, resolution=8, batch_size=4, rank=0, num_replicas=2)
            l1 = NativeDataLoader(path, resolution=8, batch_size=4, rank=1, num_replicas=2)
        except NativeLoaderUnavailable as e:
            pytest.skip(f"native loader unavailable: {e}")
        b0 = next(l0)["image"]
        b1 = next(l1)["image"]
        assert not np.array_equal(b0, b1)  # different shards
        l0.close(); l1.close()
