"""Dataset: image folders / zips with camera-pose labels.

Rebuild of ref training/dataset.py:28-244: images as uint8 NCHW, labels the
25-float camera params (16 cam2world + 9 intrinsics) from dataset.json
(ref :230-242); optional xflip doubling (ref :49-53) and max_size capping.

The loader is host-side numpy feeding jitted steps; sharding across replicas
uses utils.misc.InfiniteSampler (the reference's rank-sharded sampler)."""

from __future__ import annotations

import json
import os
import zipfile
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..utils.misc import InfiniteSampler


class ImageFolderDataset:
    """Directory or zip of images + optional dataset.json with
    {"labels": [[fname, [25 floats]], ...]} (ref dataset.py:162-242)."""

    def __init__(self, path: str, resolution: Optional[int] = None,
                 use_labels: bool = True, max_size: Optional[int] = None,
                 xflip: bool = False):
        self._path = path
        self._zip = None
        if os.path.isdir(path):
            self._files = sorted(
                os.path.relpath(os.path.join(root, f), path)
                for root, _, files in os.walk(path) for f in files
            )
        elif path.endswith(".zip"):
            self._zip = zipfile.ZipFile(path)
            self._files = sorted(self._zip.namelist())
        else:
            raise IOError(f"{path} is neither a directory nor a zip")

        exts = (".png", ".jpg", ".jpeg")
        self._image_files = [f for f in self._files if f.lower().endswith(exts)]
        if not self._image_files:
            raise IOError("no image files found")

        self._labels = None
        if use_labels and "dataset.json" in [os.path.basename(f) for f in self._files]:
            raw = json.loads(self._read_bytes(self._label_file()))["labels"]
            label_map = {fname.replace("\\", "/"): np.asarray(lab, np.float32)
                         for fname, lab in raw}
            self._labels = np.stack(
                [label_map[f.replace("\\", "/")] for f in self._image_files])

        self._raw_size = len(self._image_files)
        size = self._raw_size
        if max_size is not None and size > max_size:
            size = max_size
        self._xflip = xflip
        self._size = size * (2 if xflip else 1)
        self.resolution = resolution

    def _label_file(self) -> str:
        for f in self._files:
            if os.path.basename(f) == "dataset.json":
                return f
        raise IOError("dataset.json not found")

    def _read_bytes(self, fname: str) -> bytes:
        if self._zip is not None:
            return self._zip.read(fname)
        with open(os.path.join(self._path, fname), "rb") as f:
            return f.read()

    def __len__(self) -> int:
        return self._size

    @property
    def label_dim(self) -> int:
        return 0 if self._labels is None else self._labels.shape[1]

    def _load_image(self, raw_idx: int) -> np.ndarray:
        import io

        import PIL.Image

        data = self._read_bytes(self._image_files[raw_idx])
        img = PIL.Image.open(io.BytesIO(data)).convert("RGB")
        if self.resolution is not None and img.size != (self.resolution, self.resolution):
            img = img.resize((self.resolution, self.resolution), PIL.Image.LANCZOS)
        return np.asarray(img).transpose(2, 0, 1)  # HWC→CHW uint8

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        base = len(self._image_files) if not self._xflip else self._size // 2
        raw_idx = idx % base
        flip = self._xflip and idx >= base
        img = self._load_image(raw_idx)
        if flip:
            img = img[:, :, ::-1].copy()
        label = (self._labels[raw_idx].copy() if self._labels is not None
                 else np.zeros((0,), np.float32))
        # xflip of the camera pose: negate the yaw-related entries
        # (ref dataset.py handles flip only in pixel space; poses in FFHQ
        # rebalanced are mirror-augmented in the json itself).
        return img, label


def peek_resolution(path: str) -> int:
    """Native resolution of the first image in a dataset dir/zip — the
    reference derives the model resolution from training_set.resolution
    (ref train.py:183-189); PIL reads only the header."""
    import io

    import PIL.Image

    ds = ImageFolderDataset(path, resolution=None, use_labels=False)
    img = PIL.Image.open(io.BytesIO(ds._read_bytes(ds._image_files[0])))
    w, h = img.size
    if w != h:
        raise IOError(f"non-square image {w}x{h} in {path}")
    return w


def data_iterator(dataset: ImageFolderDataset, batch_size: int, rank: int = 0,
                  num_replicas: int = 1, seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite batches {image float32 (−1,1) NCHW, label (B, 25)}."""
    sampler = iter(InfiniteSampler(len(dataset), rank, num_replicas, seed=seed))
    while True:
        imgs, labels = [], []
        for _ in range(batch_size):
            img, lab = dataset[next(sampler)]
            imgs.append(img)
            labels.append(lab)
        images = np.stack(imgs).astype(np.float32) / 127.5 - 1.0
        yield {"image": images, "label": np.stack(labels)}
