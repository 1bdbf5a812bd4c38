"""Training-step benchmark on the real TPU chip (VERDICT r1 #5).

Measures sec/kimg for the production config (512² images, 64² neural render,
48+48 samples, seg loss via random-init BiSeNet, histogram Greg, R1 Dreg)
at a given per-chip batch and microbatch. Reports per-phase wall times and
the amortized sec/kimg for the reference cadence (Greg every 4, Dreg
every 16).

Usage: python scripts/bench_train.py [batch] [microbatch] [amp]
(amp=1 enables bf16 SR/D activations — LossConfig.amp)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    micro = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    amp = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False

    from jax import lax

    from nerffaceediting_tpu.ops import precision as prec

    prec.set_precision(lax.Precision.DEFAULT)

    from nerffaceediting_tpu.config import (
        DiscriminatorConfig, ffhq_generator_config)
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.models.bisenet import init_bisenet
    from nerffaceediting_tpu.models.discriminator import init_dual_discriminator
    from nerffaceediting_tpu.train.loss import LossConfig
    from nerffaceediting_tpu.train.step import (
        OptimizerConfig, dmain_step, dreg_step, ema_step, gmain_step,
        greg_step, init_train_state)

    g_cfg = ffhq_generator_config()
    d_cfg = DiscriminatorConfig()
    loss_cfg = LossConfig(gpc_reg_prob=0.5, amp=amp)
    opt_cfg = OptimizerConfig()

    print(f"batch={batch} microbatch={micro} amp={amp}", flush=True)
    # jit the initializers: eager init is thousands of tunnel dispatches
    t0 = time.perf_counter()
    state = jax.jit(lambda kg, kd: init_train_state(
        triplane.init_generator(kg, g_cfg),
        init_dual_discriminator(kd, d_cfg), opt_cfg))(
            jax.random.key(0), jax.random.key(1))
    parser_params = jax.jit(init_bisenet)(jax.random.key(2))
    jax.block_until_ready(parser_params)
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (batch, 3, 512, 512)).astype(np.float32))
    # realistic FFHQ-distribution cameras: rays must hit the scene box so the
    # backward pass through the plane-sampling scatter carries real values
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)
    c = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7,
                    batch_size=batch, rng=jax.random.key(3),
                    horizontal_stddev=0.3, vertical_stddev=0.2),
        fov_to_intrinsics(18.837))
    z = jnp.asarray(rng.normal(size=(batch, 512)).astype(np.float32))

    common = dict(g_cfg=g_cfg, d_cfg=d_cfg, loss_cfg=loss_cfg,
                  opt_cfg=opt_cfg, microbatch=micro)
    phases = {
        "Gmain": lambda s, k: gmain_step(s, z, c, k, has_parser=True,
                                         face_parser_params=parser_params,
                                         **common),
        "Greg": lambda s, k: greg_step(s, z, c, k, **common),
        "Dmain": lambda s, k: dmain_step(s, real, c, z, c, k, **common),
        "Dreg": lambda s, k: dreg_step(s, real, c, k, d_cfg=d_cfg,
                                       loss_cfg=loss_cfg, opt_cfg=opt_cfg,
                                       microbatch=micro),
    }

    def barrier(state, stats):
        # donated-buffer aliasing makes block_until_ready unreliable on the
        # async tunnel backend; fetching a VALUE is the only hard barrier
        for leaf in jax.tree.leaves(stats)[:1]:
            float(leaf)
        float(jnp.sum(jax.tree.leaves(state.g_params)[0]))

    times = {}
    for name, fn in phases.items():
        t0 = time.perf_counter()
        state, stats = fn(state, jax.random.key(1))
        barrier(state, stats)
        compile_s = time.perf_counter() - t0
        n_iters = 3
        t0 = time.perf_counter()
        for i in range(n_iters):
            state, stats = fn(state, jax.random.key(2 + i))
        barrier(state, stats)
        times[name] = (time.perf_counter() - t0) / n_iters
        print(f"{name:<6} {times[name]*1e3:9.1f} ms/step "
              f"(compile {compile_s:.0f}s)", flush=True)

    t0 = time.perf_counter()
    state = ema_step(state, batch_size=batch)
    float(jnp.sum(jax.tree.leaves(state.g_ema)[0]))
    compile_s = time.perf_counter() - t0
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state = ema_step(state, batch_size=batch)
    float(jnp.sum(jax.tree.leaves(state.g_ema)[0]))
    times["EMA"] = (time.perf_counter() - t0) / n_iters
    print(f"{'EMA':<6} {times['EMA']*1e3:9.1f} ms/step "
          f"(compile {compile_s:.1f}s)", flush=True)

    # reference cadence: Gmain+Dmain every step, Greg/4, Dreg/16
    per_step = (times["Gmain"] + times["Dmain"] + times["EMA"]
                + times["Greg"] / 4 + times["Dreg"] / 16)
    sec_per_kimg = per_step * 1000 / batch
    print(f"amortized {per_step*1e3:.1f} ms/step -> "
          f"{sec_per_kimg:.1f} sec/kimg at batch {batch}")


if __name__ == "__main__":
    main()
