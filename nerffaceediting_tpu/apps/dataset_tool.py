"""Offline dataset ingestion (rebuild of ref dataset_tool.py:320+).

Folder/zip of images (+ optional dataset.json camera labels) → uint8 PNG zip
with dataset.json — the training dataset format (ref training/dataset.py).
Supports center-crop and resize transforms (ref dataset_tool.py:217).

  python -m nerffaceediting_tpu.apps.dataset_tool \
      --source raw_images/ --dest ffhq512.zip --resolution 512 \
      [--transform center-crop]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import zipfile
from typing import Optional


def transform_image(img, resolution: Optional[int], transform: Optional[str]):
    import PIL.Image

    if transform == "center-crop":
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    if resolution is not None and img.size != (resolution, resolution):
        img = img.resize((resolution, resolution), PIL.Image.LANCZOS)
    return img


def convert(source: str, dest: str, resolution: Optional[int] = None,
            transform: Optional[str] = None, max_images: Optional[int] = None) -> int:
    import PIL.Image

    if os.path.isdir(source):
        files = sorted(
            os.path.relpath(os.path.join(r, f), source)
            for r, _, fs in os.walk(source) for f in fs)
        read = lambda f: open(os.path.join(source, f), "rb").read()
    elif source.endswith(".zip"):
        zin = zipfile.ZipFile(source)
        files = sorted(zin.namelist())
        read = zin.read
    else:
        raise IOError(f"unsupported source {source}")

    labels = {}
    if any(os.path.basename(f) == "dataset.json" for f in files):
        jf = next(f for f in files if os.path.basename(f) == "dataset.json")
        raw = json.loads(read(jf))["labels"]
        labels = {fn.replace("\\", "/"): lab for fn, lab in raw}

    exts = (".png", ".jpg", ".jpeg")
    image_files = [f for f in files if f.lower().endswith(exts)]
    if max_images is not None:
        image_files = image_files[:max_images]

    out_labels = []
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as zout:
        for idx, f in enumerate(image_files):
            img = PIL.Image.open(io.BytesIO(read(f))).convert("RGB")
            img = transform_image(img, resolution, transform)
            # sharded archive naming like the reference tool
            arcname = f"{idx // 1000:05d}/img{idx:08d}.png"
            buf = io.BytesIO()
            img.save(buf, format="PNG", compress_level=0, optimize=False)
            zout.writestr(arcname, buf.getvalue())
            key = f.replace("\\", "/")
            if key in labels:
                out_labels.append([arcname, labels[key]])
        if out_labels:
            zout.writestr("dataset.json", json.dumps({"labels": out_labels}))
    return len(image_files)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--transform", default=None, choices=[None, "center-crop"])
    p.add_argument("--max-images", type=int, default=None)
    args = p.parse_args(argv)
    n = convert(args.source, args.dest, args.resolution, args.transform, args.max_images)
    print(f"wrote {n} images to {args.dest}")


if __name__ == "__main__":
    main()
