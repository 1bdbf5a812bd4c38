"""Training CLI (rebuild of ref train.py:129-398).

Maps the reference's click options to our config dataclasses and launches the
training loop. No process spawning: one JAX process drives all local devices
(multi-host via jax.distributed, SURVEY §2.5 TPU-native equivalent).

Example (the official config, ref start.sh):
  python -m nerffaceediting_tpu.apps.train --data ffhq512.zip --outdir runs \
      --batch 32 --gamma 1 --gen-pose-cond --hist-type per_label
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Optional

import jax


def maybe_init_distributed() -> int:
    """Multi-host bring-up (SURVEY §2.5: the TPU-native replacement for the
    reference's torch.multiprocessing.spawn + NCCL init, ref train.py:32-103).

    One JAX process per host; DCN rendezvous via jax.distributed.initialize.
    Triggered by the standard env vars (JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID, or cloud-TPU auto-detection when
    NFE_MULTIHOST=1). Single-host runs skip it entirely. Returns process_id
    (0 on single host)."""
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = os.environ.get("NFE_MULTIHOST") == "1"
    if not coord and not auto:
        return 0
    kwargs = {}
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    print(f"distributed: process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    return jax.process_index()


def make_run_dir(outdir: str, desc: str) -> str:
    """Auto-numbered run dirs (ref train.py:60-67)."""
    os.makedirs(outdir, exist_ok=True)
    existing = [
        int(m.group(1))
        for d in os.listdir(outdir)
        if (m := re.match(r"^(\d+)-", d))
    ]
    run_id = max(existing, default=-1) + 1
    run_dir = os.path.join(outdir, f"{run_id:05d}-{desc}")
    os.makedirs(run_dir)
    return run_dir


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True, help="dataset dir or zip")
    p.add_argument("--res", type=int, default=None,
                   help="output resolution (default: the dataset's native "
                        "resolution, as the reference derives it from "
                        "training_set.resolution, ref train.py:183-189)")
    p.add_argument("--outdir", default="runs")
    p.add_argument("--cfg", default="ffhq", choices=["ffhq", "afhq", "shapenet"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--gamma", type=float, default=1.0, help="R1 weight")
    p.add_argument("--glr", type=float, default=0.0025)
    p.add_argument("--dlr", type=float, default=0.002)
    p.add_argument("--cbase", type=int, default=32768)
    p.add_argument("--cmax", type=int, default=512)
    p.add_argument("--map-depth", type=int, default=2)
    p.add_argument("--kimg", type=int, default=25000)
    p.add_argument("--tick", type=float, default=4,
                   help="kimg per tick (fractional ok, ref train.py:161)")
    p.add_argument("--snap", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gen-pose-cond", action="store_true")
    p.add_argument("--gpc-reg-prob", type=float, default=0.5)
    p.add_argument("--c-scale", type=float, default=1.0)
    p.add_argument("--density-reg", type=float, default=0.25)
    p.add_argument("--density-reg-every", type=int, default=4)
    p.add_argument("--density-reg-p-dist", type=float, default=0.004)
    p.add_argument("--reg-type", default="l1",
                   choices=["l1", "monotonic-detach", "monotonic-fixed"])
    p.add_argument("--seg-weight", type=float, default=1.0)
    p.add_argument("--hist-weight", type=float, default=30.0)
    p.add_argument("--hist-adv", type=float, default=1.0)
    p.add_argument("--hist-type", default="per_label", choices=["per_label", "whole"])
    p.add_argument("--blur-fade-kimg", type=float, default=200.0)
    p.add_argument("--depth-resolution", type=int, default=None,
                   help="coarse samples per ray (default: cfg preset, 48 for "
                        "ffhq — ref train.py:306)")
    p.add_argument("--depth-resolution-importance", type=int, default=None,
                   help="importance samples per ray (ref train.py:307)")
    p.add_argument("--neural-rendering-resolution-initial", type=int, default=64)
    p.add_argument("--neural-rendering-resolution-final", type=int, default=None)
    p.add_argument("--neural-rendering-resolution-fade-kimg", type=int, default=1000)
    p.add_argument("--aug", default="noaug", choices=["noaug", "ada", "fixed"])
    p.add_argument("--p", type=float, default=0.2,
                   help="fixed ADA strength for --aug fixed (ref train.py:147)")
    p.add_argument("--target", type=float, default=0.6,
                   help="ADA sign target for --aug ada (ref train.py:148)")
    p.add_argument("--disc-c-noise", type=float, default=0.0)
    p.add_argument("--freezed", type=int, default=0,
                   help="freeze first N D layers for transfer learning")
    p.add_argument("--face-parser", default=None,
                   help="path to 79999_iter.pth for the seg loss, or "
                        "'random' for a fixed-seed random-init BiSeNet "
                        "(mechanics demo in weightless environments)")
    p.add_argument("--resume", default=None, help="orbax checkpoint to resume")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ threaded data loader (zip datasets)")
    p.add_argument("--loader-threads", type=int, default=4)
    # TPU speed policy (the reference's fp32/tf32 + fp16-top-res scheme,
    # ref train.py:383-387, becomes two orthogonal TPU knobs):
    p.add_argument("--precision", default="default",
                   choices=["highest", "default"],
                   help="MXU pass count for fp32 convs/matmuls: 'highest' "
                        "= multi-pass bf16 (parity runs), 'default' = one "
                        "bf16 pass (the tf32-equivalent training setting)")
    p.add_argument("--amp", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="bf16 activations in the SR module + discriminator "
                        "(the reference's num_fp16_res=4 + conv_clamp=256; "
                        "its default too). Default ON — the r4 on-chip grid "
                        "measured -12%% step time at grad-cosine >=0.96 "
                        "(docs/PERF.md); --no-amp restores full fp32")
    return p


# output resolution → SR module (ref train.py:305-335 picks the sr_module
# alongside each rendering block; the 2X/4X variants are the reference's
# shapenet-128 / afhq-256 choices)
SR_BY_RESOLUTION = {
    512: "SuperresolutionHybrid8XDC",
    256: "SuperresolutionHybrid4X",
    128: "SuperresolutionHybrid2X",
}


def configs_from_args(args, img_resolution: int = 512):
    from ..config import (
        DiscriminatorConfig, ffhq_generator_config, ffhq_rendering_config)
    from ..train.loss import LossConfig
    from ..train.step import OptimizerConfig

    if img_resolution not in SR_BY_RESOLUTION:
        raise ValueError(
            f"unsupported output resolution {img_resolution} "
            f"(supported: {sorted(SR_BY_RESOLUTION)}); pass --res to override "
            f"the dataset's native resolution")
    sr_module = SR_BY_RESOLUTION[img_resolution]
    depth_overrides = {}
    if args.depth_resolution is not None:
        depth_overrides["depth_resolution"] = args.depth_resolution
    if args.depth_resolution_importance is not None:
        depth_overrides["depth_resolution_importance"] = \
            args.depth_resolution_importance

    # cfg-specific rendering block (ref train.py:305-335)
    if args.cfg == "ffhq":
        rendering = ffhq_rendering_config(
            image_resolution=img_resolution,
            superresolution_module=sr_module,
            c_gen_conditioning_zero=not args.gen_pose_cond,
            c_scale=args.c_scale,
            density_reg=args.density_reg,
            density_reg_p_dist=args.density_reg_p_dist,
            reg_type=args.reg_type,
            **depth_overrides,
        )
    elif args.cfg == "afhq":
        rendering = ffhq_rendering_config(
            image_resolution=img_resolution,
            superresolution_module=sr_module,
            avg_camera_pivot=(0.0, 0.0, -0.06),
            c_gen_conditioning_zero=not args.gen_pose_cond,
            c_scale=args.c_scale, density_reg=args.density_reg,
            density_reg_p_dist=args.density_reg_p_dist, reg_type=args.reg_type,
            **depth_overrides,
        )
    else:  # shapenet (ref train.py:327-335)
        rendering = ffhq_rendering_config(
            image_resolution=img_resolution,
            superresolution_module=sr_module,
            ray_start=0.1, ray_end=2.6, box_warp=1.6, white_back=True,
            **{"depth_resolution": 64, "depth_resolution_importance": 64,
               **depth_overrides},
            avg_camera_radius=1.7, avg_camera_pivot=(0.0, 0.0, 0.0),
            c_gen_conditioning_zero=not args.gen_pose_cond,
            c_scale=args.c_scale, density_reg=args.density_reg,
            density_reg_p_dist=args.density_reg_p_dist, reg_type=args.reg_type,
        )

    g_cfg = ffhq_generator_config(
        img_resolution=img_resolution,
        channel_base=args.cbase, channel_max=args.cmax,
        mapping_layers=args.map_depth, rendering=rendering,
    )
    d_cfg = DiscriminatorConfig(
        img_resolution=img_resolution,
        channel_base=args.cbase, channel_max=args.cmax,
        disc_c_noise=args.disc_c_noise, freezed=args.freezed,
    )
    loss_cfg = LossConfig(
        r1_gamma=args.gamma,
        gpc_reg_prob=args.gpc_reg_prob if args.gen_pose_cond else None,
        seg_weight=args.seg_weight, hist_weight=args.hist_weight,
        hist_adv=args.hist_adv, hist_type=args.hist_type,
        blur_init_sigma=10.0 if args.blur_fade_kimg > 0 else 0.0,
        # ref train.py:345: fade duration scales with batch size.
        blur_fade_kimg=args.batch * args.blur_fade_kimg / 32,
        neural_rendering_resolution_initial=args.neural_rendering_resolution_initial,
        neural_rendering_resolution_final=args.neural_rendering_resolution_final,
        neural_rendering_resolution_fade_kimg=args.neural_rendering_resolution_fade_kimg,
        amp=getattr(args, "amp", False),
    )
    opt_cfg = OptimizerConfig(
        g_lr=args.glr, d_lr=args.dlr,
        g_reg_interval=args.density_reg_every if args.density_reg > 0 else None,
        d_reg_interval=16,
    )
    return g_cfg, d_cfg, loss_cfg, opt_cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    maybe_init_distributed()
    # Global MXU precision is baked in at trace time — set it before any
    # phase program compiles (ops/precision.py).
    from ..ops import precision as prec
    from jax import lax
    prec.set_precision(lax.Precision.HIGHEST if args.precision == "highest"
                       else lax.Precision.DEFAULT)
    res = args.res
    if res is None:
        from ..train.dataset import peek_resolution

        try:
            res = peek_resolution(args.data)
        except (OSError, IndexError):
            if not args.dry_run:
                raise
            res = 512  # dry-run config validation without a real dataset
        else:
            print(f"dataset native resolution: {res}")
    g_cfg, d_cfg, loss_cfg, opt_cfg = configs_from_args(args, img_resolution=res)

    desc = f"{args.cfg}-b{args.batch}-gamma{args.gamma}"
    run_dir = make_run_dir(args.outdir, desc)
    with open(os.path.join(run_dir, "training_options.json"), "w") as f:
        json.dump({k: str(v) for k, v in vars(args).items()}, f, indent=2)
    print(f"run dir: {run_dir}; devices: {jax.devices()}")

    if args.dry_run:
        print("dry run OK")
        return

    from ..train.loop import TrainingConfig, training_loop

    data_iter = None
    if args.native_loader:
        from ..native import NativeDataLoader, NativeLoaderUnavailable

        try:
            data_iter = iter(NativeDataLoader(
                args.data, resolution=g_cfg.img_resolution,
                batch_size=args.batch, num_threads=args.loader_threads,
                seed=args.seed))
            print("using native C++ data loader")
        except NativeLoaderUnavailable as e:
            print(f"native loader unavailable ({e}); falling back to Python")
    if data_iter is None:
        from ..train.dataset import ImageFolderDataset, data_iterator

        dataset = ImageFolderDataset(args.data, resolution=g_cfg.img_resolution)
        data_iter = data_iterator(dataset, args.batch, seed=args.seed)

    tcfg = TrainingConfig(
        run_dir=run_dir, total_kimg=args.kimg, kimg_per_tick=args.tick,
        snapshot_ticks=args.snap, image_snapshot_ticks=args.snap,
        batch_size=args.batch, seed=args.seed,
        ema_kimg=args.batch * 10 / 32,  # ref train.py:269
        face_parser_path=args.face_parser,
        aug=args.aug, ada_target=args.target, augment_p=args.p,
    )
    resume_state = None
    if args.resume:
        import dataclasses as _dc

        from ..train.loop import restore_snapshot

        resume_state = restore_snapshot(args.resume, g_cfg, d_cfg, opt_cfg)
        # Resume disables warm-start rampups (ref train.py:372-378): no EMA
        # rampup, no blur fade, no gpc fade, faster ADA adjustment.
        tcfg = _dc.replace(tcfg, ema_rampup=None, ada_kimg=100.0)
        loss_cfg = _dc.replace(loss_cfg, blur_init_sigma=0.0,
                               blur_fade_kimg=0.0, gpc_reg_fade_kimg=0.0)
    training_loop(g_cfg, d_cfg, loss_cfg, opt_cfg, tcfg, data_iter,
                  resume_state=resume_state, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
