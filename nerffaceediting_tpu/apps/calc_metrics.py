"""Metric evaluation CLI (rebuild of ref calc_metrics.py:31-183).

  python -m nerffaceediting_tpu.apps.calc_metrics \
      --checkpoint ckpt_dir --data ffhq512.zip --metrics fid,kid \
      [--inception path/to/torchscript.pt]
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--metrics", default="fid")
    p.add_argument("--num-real", type=int, default=50000)
    p.add_argument("--num-gen", type=int, default=50000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--inception", default=None, help="local detector weights")
    p.add_argument("--detector", default="auto", choices=["auto", "jax", "torch"],
                   help="jax: torch-free InceptionV3 (metrics/inception_jax.py, "
                        "weights via $NFE_INCEPTION_WEIGHTS); torch: "
                        "torchscript/torchvision; auto prefers jax")
    p.add_argument("--cache-dir", default=".metric-cache")
    p.add_argument("--run-dir", default=None)
    p.add_argument("--sg3-checkpoint", default=None,
                   help="SG3 generator checkpoint for eqt50k_int/eqt50k_frac/"
                        "eqr50k (the EQ metrics are SG3-specific, ref "
                        "metric_main.py:100-114); expects {params, static} "
                        "or a converted pickle")
    args = p.parse_args(argv)

    from ..config import ffhq_generator_config
    from ..io.checkpoint import load_checkpoint
    from ..metrics.metric_main import (
        calc_metric, inception_features_fn, report_metric)
    from ..train.dataset import ImageFolderDataset

    cfg = ffhq_generator_config()
    params = load_checkpoint(args.checkpoint)
    if "g_ema" in params:
        params = params["g_ema"]
    dataset = ImageFolderDataset(args.data, resolution=cfg.img_resolution)
    feature_fn = None
    if args.detector in ("auto", "jax"):
        try:
            from ..metrics.inception_jax import inception_features_fn_jax

            feature_fn = inception_features_fn_jax()
        except RuntimeError:
            if args.detector == "jax":
                raise
    if feature_fn is None:
        feature_fn = inception_features_fn(args.inception)

    sg3_params = sg3_static = None
    if args.sg3_checkpoint:
        sg3 = load_checkpoint(args.sg3_checkpoint)
        sg3_params, sg3_static = sg3["params"], sg3["static"]

    probs_fn = None
    if "is50k" in args.metrics:
        from ..metrics.inception_jax import inception_probs_fn_jax

        probs_fn = inception_probs_fn_jax()

    for metric in args.metrics.split(","):
        result = calc_metric(
            metric.strip(), params=params, cfg=cfg, dataset=dataset,
            feature_fn=feature_fn, probs_fn=probs_fn,
            sg3_params=sg3_params, sg3_static=sg3_static,
            num_real=args.num_real, num_gen=args.num_gen,
            batch=args.batch, cache_dir=args.cache_dir,
        )
        report_metric(result, run_dir=args.run_dir, snapshot=args.checkpoint)


if __name__ == "__main__":
    main()
