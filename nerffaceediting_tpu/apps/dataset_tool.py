"""Offline dataset ingestion (rebuild of ref dataset_tool.py:320+).

Sources (ref dataset_tool.py open_dataset): image folder, zip of images
(+ optional dataset.json camera labels), LMDB database (LSUN), CIFAR-10
python archive, MNIST idx archive. Output: uint8 PNG zip with dataset.json —
the training dataset format (ref training/dataset.py). Supports center-crop
and center-crop-wide transforms (ref dataset_tool.py:217).

  python -m nerffaceediting_tpu.apps.dataset_tool \
      --source raw_images/ --dest ffhq512.zip --resolution 512 \
      [--transform center-crop]
"""

from __future__ import annotations

import argparse
import gzip
import io
import json
import os
import pickle
import tarfile
import zipfile
from typing import Iterator, Optional, Tuple


def transform_image(img, resolution: Optional[int], transform: Optional[str]):
    """Returns the transformed PIL image, or None when the transform REJECTS
    the input (too small for center-crop-wide — ref dataset_tool.py:242-243;
    rejected images are skipped, matching the reference's error-on-None
    contract per image)."""
    import PIL.Image

    if transform == "center-crop":
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    elif transform == "center-crop-wide":
        # ref dataset_tool.py:240-252 center_crop_wide with the wide-output
        # convention (width=resolution, height=resolution//2): center-crop
        # rows to ch = round(width·h/w), resize to (width, height), letterbox
        # onto a black square canvas. Undersized inputs are rejected.
        if resolution is None:
            raise ValueError("center-crop-wide requires --resolution")
        width, height = resolution, resolution // 2
        w, h = img.size
        ch = int(round(width * h / w))
        if w < width or ch < height:
            return None
        img = img.crop((0, (h - ch) // 2, w, (h + ch) // 2))
        img = img.resize((width, height), PIL.Image.LANCZOS)
        canvas = PIL.Image.new("RGB", (width, width))
        canvas.paste(img, (0, (width - height) // 2))
        return canvas
    if resolution is not None and img.size != (resolution, resolution):
        img = img.resize((resolution, resolution), PIL.Image.LANCZOS)
    return img


# ---------------------------------------------------------------------------
# Source iterators: yield (PIL.Image, label-or-None)

def _iter_folder_or_zip(source: str) -> Iterator[Tuple[object, object]]:
    import PIL.Image

    if os.path.isdir(source):
        files = sorted(
            os.path.relpath(os.path.join(r, f), source)
            for r, _, fs in os.walk(source) for f in fs)
        read = lambda f: open(os.path.join(source, f), "rb").read()
    else:
        zin = zipfile.ZipFile(source)
        files = sorted(zin.namelist())
        read = zin.read

    labels = {}
    if any(os.path.basename(f) == "dataset.json" for f in files):
        jf = next(f for f in files if os.path.basename(f) == "dataset.json")
        raw = json.loads(read(jf))["labels"]
        labels = {fn.replace("\\", "/"): lab for fn, lab in raw}

    exts = (".png", ".jpg", ".jpeg")
    for f in files:
        if not f.lower().endswith(exts):
            continue
        img = PIL.Image.open(io.BytesIO(read(f))).convert("RGB")
        yield img, labels.get(f.replace("\\", "/"))


def _iter_lmdb(source: str) -> Iterator[Tuple[object, object]]:
    """LSUN-style LMDB (ref dataset_tool.py open_lmdb). Requires `lmdb`."""
    import PIL.Image

    try:
        import lmdb  # not in the base image; clear error if absent
    except ImportError as e:
        raise IOError("lmdb source requires the 'lmdb' package") from e

    with lmdb.open(source, readonly=True, lock=False).begin(write=False) as txn:
        for _key, value in txn.cursor():
            try:
                img = PIL.Image.open(io.BytesIO(value)).convert("RGB")
            except IOError:
                continue
            yield img, None


def _iter_cifar10(source: str) -> Iterator[Tuple[object, object]]:
    """cifar-10-python.tar.gz → images + class labels
    (ref dataset_tool.py open_cifar10)."""
    import numpy as np
    import PIL.Image

    images, labels = [], []
    with tarfile.open(source, "r:gz") as tar:
        for batch in range(1, 6):
            member = f"cifar-10-batches-py/data_batch_{batch}"
            with tar.extractfile(member) as f:
                data = pickle.load(f, encoding="latin1")
            images.append(np.asarray(data["data"], np.uint8))
            labels.append(np.asarray(data["labels"], np.int64))
    images = np.concatenate(images).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    labels = np.concatenate(labels)
    for img, lab in zip(images, labels):
        yield PIL.Image.fromarray(img, "RGB"), int(lab)


def _iter_mnist(source: str) -> Iterator[Tuple[object, object]]:
    """train-images-idx3-ubyte.gz (+ sibling labels file)
    (ref dataset_tool.py open_mnist)."""
    import numpy as np
    import PIL.Image

    labels_path = source.replace("-images-idx3", "-labels-idx1")
    with gzip.open(source, "rb") as f:
        images = np.frombuffer(f.read(), np.uint8, offset=16)
    with gzip.open(labels_path, "rb") as f:
        labels = np.frombuffer(f.read(), np.uint8, offset=8)
    images = images.reshape(-1, 28, 28)
    images = np.pad(images, [(0, 0), (2, 2), (2, 2)], "constant")  # → 32×32
    for img, lab in zip(images, labels):
        yield PIL.Image.fromarray(img, "L").convert("RGB"), int(lab)


def open_source(source: str) -> Iterator[Tuple[object, object]]:
    """Dispatch on source shape (ref dataset_tool.py open_dataset)."""
    if os.path.isdir(source):
        if os.path.exists(os.path.join(source, "data.mdb")):
            return _iter_lmdb(source)
        return _iter_folder_or_zip(source)
    base = os.path.basename(source)
    if base == "cifar-10-python.tar.gz" or base.startswith("cifar-10"):
        return _iter_cifar10(source)
    if base.endswith("-idx3-ubyte.gz"):
        return _iter_mnist(source)
    if source.endswith(".zip"):
        return _iter_folder_or_zip(source)
    raise IOError(f"unsupported source {source}")


def convert(source: str, dest: str, resolution: Optional[int] = None,
            transform: Optional[str] = None, max_images: Optional[int] = None) -> int:
    count = 0
    out_labels = []
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as zout:
        for img, label in open_source(source):
            if max_images is not None and count >= max_images:
                break
            img = transform_image(img, resolution, transform)
            if img is None:  # rejected by the transform (too small)
                continue
            # sharded archive naming like the reference tool
            arcname = f"{count // 1000:05d}/img{count:08d}.png"
            buf = io.BytesIO()
            img.save(buf, format="PNG", compress_level=0, optimize=False)
            zout.writestr(arcname, buf.getvalue())
            if label is not None:
                out_labels.append([arcname, label])
            count += 1
        if out_labels:
            zout.writestr("dataset.json", json.dumps({"labels": out_labels}))
    return count


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--transform", default=None,
                   choices=[None, "center-crop", "center-crop-wide"])
    p.add_argument("--max-images", type=int, default=None)
    args = p.parse_args(argv)
    n = convert(args.source, args.dest, args.resolution, args.transform, args.max_images)
    print(f"wrote {n} images to {args.dest}")


if __name__ == "__main__":
    main()
