"""Full-budget inversion demonstration (VERDICT r3 item 9 / missing #4).

Runs the reference's complete two-phase projector budget
(ref projector.py:50,66,137,188 — 500 W-optimization steps + 500
pivotal-tuning steps) at the FULL ffhq config against a HELD-OUT "photo":
an image from the synthetic 3D-consistent dataset (runs/synth512.zip),
i.e. NOT a render of the generator itself — the generator has never seen
it and cannot represent it exactly, exactly the regime of inverting a real
photograph.

Feature loss: LPIPS-grade VGG16 when $NFE_VGG16_WEIGHTS is present, else
the multiscale-L2 fallback (zero-egress environment, docs/PARITY.md).

Artifacts → debug/inversion_{target,wopt,pti}.png; PSNR/feature-distance
numbers print as a JSON line and land in debug/inversion_metrics.json.

Usage: python scripts/demo_inversion.py [--steps N] [--steps-pti N]
         [--data runs/synth512.zip] [--index I] [--cpu] [--tiny]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def psnr(a, b, rng=2.0):
    import numpy as np

    mse = float(np.square(np.asarray(a) - np.asarray(b)).mean())
    return 10 * np.log10(rng * rng / max(mse, 1e-20))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--steps-pti", type=int, default=500)
    ap.add_argument("--w-avg-samples", type=int, default=10000)
    ap.add_argument("--data", default="runs/synth512.zip")
    ap.add_argument("--index", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--network", default=None,
                    help="orbax network-snapshot dir (e.g. from "
                         "train_demo.sh); inverts with its g_ema instead of "
                         "a random-init generator — a random-init G at the "
                         "full config renders far outside [-1,1] and is not "
                         "a meaningful inversion subject")
    ap.add_argument("--out", default="debug")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from nerffaceediting_tpu.apps.gen_samples import save_png, to_uint8_image
    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.editing.projector import (
        ProjectorConfig, pivotal_tuning, project)
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.train.dataset import ImageFolderDataset

    if args.tiny:
        from tests.test_apps import tiny_config

        cfg = tiny_config()
    else:
        cfg = ffhq_generator_config()

    dataset = ImageFolderDataset(args.data, resolution=cfg.img_resolution)
    img_u8, label = dataset[args.index]
    target = jnp.asarray(img_u8, jnp.float32)[None] / 127.5 - 1.0  # (1,3,R,R)
    c = jnp.asarray(label, jnp.float32)[None]                      # (1,25)

    if args.network:
        from nerffaceediting_tpu.io.checkpoint import load_checkpoint

        snap = load_checkpoint(args.network)
        params = jax.tree.map(jnp.asarray, snap["g_ema"])
        print(f"loaded g_ema from {args.network}")
    else:
        params = triplane.init_generator(jax.random.key(0), cfg)
    pcfg = ProjectorConfig(num_steps=args.steps,
                           num_steps_pti=args.steps_pti,
                           w_avg_samples=args.w_avg_samples)

    save_png(os.path.join(args.out, "inversion_target.png"),
             to_uint8_image(target)[0])

    render = jax.jit(lambda p, w: triplane.synthesis(
        p, w, c, cfg, noise_mode="const")["image"])

    t0 = time.time()
    w_opt, hist1 = project(params, target, c, cfg, pcfg, verbose=True)
    t1 = time.time()
    img_wopt = render(params, w_opt)
    save_png(os.path.join(args.out, "inversion_wopt.png"),
             to_uint8_image(img_wopt)[0])
    psnr_wopt = psnr(img_wopt, target)
    print(f"phase 1 done: {args.steps} steps, {t1 - t0:.0f}s, "
          f"PSNR {psnr_wopt:.2f} dB", flush=True)

    # w_avg baseline (what "no inversion" looks like) — computed BEFORE
    # pivotal tuning, which donates the params buffers.
    from nerffaceediting_tpu.editing.projector import compute_w_stats
    from nerffaceediting_tpu.models.stylegan2 import num_synthesis_ws

    w_avg, _ = compute_w_stats(params, cfg, pcfg, c, jax.random.key(0))
    n_ws = num_synthesis_ws(cfg.backbone_resolution)
    img_avg = render(params, jnp.tile(w_avg, (1, n_ws, 1)))  # w_avg (1,1,D)
    psnr_avg = psnr(img_avg, target)

    tuned, hist2 = pivotal_tuning(params, w_opt, target, c, cfg, pcfg,
                                  verbose=True)
    t2 = time.time()
    img_pti = render(tuned, w_opt)
    save_png(os.path.join(args.out, "inversion_pti.png"),
             to_uint8_image(img_pti)[0])
    psnr_pti = psnr(img_pti, target)

    line = {
        "target": f"{args.data}[{args.index}] (held-out, not a G render)",
        "psnr_w_avg_db": round(psnr_avg, 2),
        "psnr_wopt_db": round(psnr_wopt, 2),
        "psnr_pti_db": round(psnr_pti, 2),
        "loss_first": round(float(hist1["loss"][0]), 5),
        "loss_after_wopt": round(float(hist1["loss"][-1]), 5),
        "loss_after_pti": round(float(hist2["loss"][-1]), 5),
        "steps": args.steps, "steps_pti": args.steps_pti,
        "seconds_wopt": round(t1 - t0, 1), "seconds_pti": round(t2 - t1, 1),
        "feature_fn": ("vgg16-lpips" if os.environ.get("NFE_VGG16_WEIGHTS")
                       else "multiscale-l2 fallback (zero egress)"),
    }
    print(json.dumps(line))
    with open(os.path.join(args.out, "inversion_metrics.json"), "w") as f:
        json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
