"""Benchmark: 512² edited frames/sec on one TPU chip.

Measures the headline workload (BASELINE.json config 4): appearance-edited
tri-plane → full 512² frame, i.e. the fused planes→frame device program
(normalize/denorm-swap planes → 64² two-pass render (48+48) → SR 8XDC).
This is the editing hot path a NeRFFaceEditing user runs per video frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to an estimated 25 frames/sec for the PyTorch
reference on one V100 (the reference publishes no numbers — BASELINE.md;
EG3D reports ~36 fps on an RTX 3090 for the plain model, and
NeRFFaceEditing's dual-decoder + seg rendering roughly halves that on the
slower V100). The ≥5× north star therefore means vs_baseline ≥ 5.
"""

import json
import os
import time

# Persistent XLA compile cache (set before jax init): a cold compile of the
# default rung is ~6 min through the tunnel (runs/hw_r4/bench_newdefault.*);
# with the cache a repeat run starts timing in seconds. Harmless if the dir
# is empty — it just fills.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nfe_jaxcache")

import numpy as np
import jax
import jax.numpy as jnp

V100_BASELINE_FPS = 25.0

# A/B overrides (bench experiments; defaults are the committed fastest —
# the r4 sweep table in docs/PERF.md, logs in runs/hw_r4/):
#   NFE_BENCH_FRAMES  — orbit length per dispatch (default 128)
#   NFE_BENCH_GROUP   — frames per scan body (default 1; >=2 with the
#                       pull-back merge SIGABRTs the current libtpu)
#   NFE_BENCH_SR_BF16 — SR module activation dtype (default 1 = bf16)
#   NFE_RESIDENT_CANVAS (read by ops/triplane_kernel) — resident-canvas kernel


_LADDER_KEYS = (
    "NFE_BENCH_FRAMES", "NFE_BENCH_GROUP", "NFE_BENCH_FUSED",
    "NFE_BENCH_SR_BF16", "NFE_RESIDENT_CANVAS", "NFE_COMPOSITE_KERNEL",
    "NFE_WIN_GEOM", "NFE_MERGE_PULLBACK", "NFE_PATCH", "NFE_TILE_ORDER",
    "NFE_TILE_P", "NFE_SORTED_KERNEL", "NFE_TILED_COMPOSITE", "NFE_SR_NHWC",
    "NFE_MAX_MT", "NFE_INKERNEL_PTS", "NFE_FUSED_PHASE", "NFE_COORDS_T",
    "NFE_KERNEL_ILP")


def main():
    # Fallback ladder: the default settings are the fastest measured
    # configuration, but if an aggressive setting fails to compile on the
    # driver's chip (Mosaic/VMEM regressions are environment-sensitive),
    # retry progressively more conservative variants rather than reporting
    # nothing. Explicit env overrides pin a single variant (A/B sweeps).
    # The JSON line carries WHICH rung produced the number ("variant") and
    # every crashed upper rung ("fallbacks") so a fast-path regression is
    # visible in BENCH_r*.json instead of masquerading as a slowdown
    # (VERDICT r3 weak #5).
    pinned = any(k in os.environ for k in _LADDER_KEYS)
    ladder = [("pinned", {})] if pinned else [
        ("default", {}),                   # committed fastest (109.0 fps r5:
        # static composite kernel + transposed coords on by default)
        # known-compiling alternates: the r4 default first (proven 92.8,
        # new r5 defaults pinned OFF), then fp32 SR, then the r2-style
        # merge at group 2, then the decomposed kernel as the most
        # conservative rung (r4 LLO-crash matrix + sweep, runs/hw_r4).
        ("r4-default", {"NFE_TILED_COMPOSITE": "0",
                        "NFE_COORDS_T": "0"}),           # 92.8 fps r4
        ("f64g1-fp32sr", {"NFE_BENCH_FRAMES": "64", "NFE_BENCH_GROUP": "1",
                          "NFE_TILED_COMPOSITE": "0", "NFE_COORDS_T": "0",
                          "NFE_BENCH_SR_BF16": "0"}),    # 70.8 fps r4
        ("f64g2-unify", {"NFE_BENCH_FRAMES": "64", "NFE_BENCH_GROUP": "2",
                         "NFE_BENCH_SR_BF16": "0",
                         "NFE_TILED_COMPOSITE": "0", "NFE_COORDS_T": "0",
                         "NFE_MERGE_PULLBACK": "0"}),    # 63.0 fps r4
        ("f16g1-decomposed", {"NFE_BENCH_FRAMES": "16", "NFE_BENCH_GROUP": "1",
                              "NFE_BENCH_SR_BF16": "0",
                              "NFE_TILED_COMPOSITE": "0", "NFE_COORDS_T": "0",
                              "NFE_BENCH_FUSED": "0"}),  # most conservative
    ]
    base_env = {k: os.environ.get(k) for k in _LADDER_KEYS}
    last_err = None
    fallbacks = []
    for name, overrides in ladder:
        for k, v in base_env.items():  # reset leakage from the prior rung
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        os.environ.update(overrides)
        try:
            return _run(variant=name, fallbacks=fallbacks)
        except Exception as e:  # noqa: BLE001 — report via the next rung
            last_err = e
            import traceback
            traceback.print_exc()
            import sys
            fallbacks.append({"variant": name,
                              "error": f"{type(e).__name__}: "
                                       + str(e).splitlines()[0][:160]})
            print(f"bench variant {name} failed; falling back",
                  file=sys.stderr)
    raise last_err


def _run(variant: str = "pinned", fallbacks=None):
    from jax import lax

    from nerffaceediting_tpu.ops import precision as prec

    # Serving precision: one bf16 MXU pass for convs/matmuls (the Pallas
    # render kernel manages its own precision; depth-critical contractions
    # pin HIGHEST locally). Parity tests run at HIGHEST.
    prec.set_precision(lax.Precision.DEFAULT)

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.editing.api import (
        decode_frames, encode, plane_canvas, swap_appearance_stats)
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    cfg = ffhq_generator_config()
    params = triplane.init_generator(jax.random.key(0), cfg)

    # Source identity + style identity planes (computed once, outside the
    # timed edit loop — an editing session reuses cached planes).
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    c0 = camera_params(
        lookat_pose(np.pi / 2, np.pi / 2, (0, 0, 0.2), radius=2.7),
        fov_to_intrinsics(18.837),
    )
    ws = triplane.mapping(params, z, c0, cfg)
    planes_src = encode(params, ws, cfg)
    planes_sty = encode(
        params, triplane.mapping(params, jax.random.normal(jax.random.key(2), (1, cfg.z_dim)), c0, cfg),
        cfg,
    )

    # camera orbit (gen_videos-style trajectory), rendered as ONE fused
    # device program (lax.scan over frames) — the production video path.
    # Per-dispatch tunnel latency (~30-40 ms in this environment) would
    # otherwise dominate; a real serving system amortizes it the same way.
    # 128 frames ≈ two seconds of orbit video per dispatch: long enough to
    # amortize the ~35-40 ms tunnel dispatch + per-orbit canvas build
    # (f64→f128 measured +1.5 fps, f128→f256 +0.5 — the r4 sweep).
    n_frames = int(os.environ.get("NFE_BENCH_FRAMES", "128"))
    cams = jnp.concatenate([
        camera_params(
            lookat_pose(np.pi / 2 + 0.4 * np.sin(2 * np.pi * i / n_frames),
                        np.pi / 2 - 0.25 * np.cos(2 * np.pi * i / n_frames),
                        (0, 0, 0.2), radius=2.7),
            fov_to_intrinsics(18.837),
        )
        for i in range(n_frames)
    ])  # (n_frames, 25)

    # Frames per scan body, rendered as ONE flattened decode_frames call
    # (NOT per-frame decode calls: >=2 separate fused-decode calls per body
    # SIGABRT the current libtpu's custom-call windowing with the pull-back
    # merge — bisect matrix in runs/hw_r4/, docs/PERF.md r4. The flattened
    # form is a single fused-decode call whatever the group, so it dodges
    # that limit while amortizing the ~1.9 ms/iteration scan overhead).
    GROUP = int(os.environ.get("NFE_BENCH_GROUP", "1"))  # frames per scan body
    # bf16 SR activations (weights stay fp32): +13 fps measured (r4 sweep
    # D vs A), output parity eyeballed + the reference itself runs its SR
    # stack in fp16 (ref superresolution.py use_fp16=True).
    sr_dtype = (jnp.bfloat16 if os.environ.get("NFE_BENCH_SR_BF16", "1") == "1"
                else jnp.float32)
    # NFE_BENCH_FUSED=0: decomposed render (windowed sampling kernel + XLA
    # decoder MLPs) instead of the fused sampling+decode kernel — the path
    # the resident-canvas variant (NFE_RESIDENT_CANVAS=1) applies to.
    fused = os.environ.get("NFE_BENCH_FUSED", "1") == "1"

    @jax.jit
    def edited_orbit(params, planes_src, planes_sty, ws, cams):
        norm, stats = swap_appearance_stats(planes_src, planes_sty)
        # ONE canvas build per orbit, OUTSIDE the frame scan (r3: XLA does
        # not hoist the build out of the scan body — was ~5 ms/frame).
        canvas = plane_canvas(norm)

        def body(carry, cam_group):
            # serving config: statically-coherent windowed kernel (validated
            # once per workload via fast_path_pred) + fused sampling/decoder
            # epilogue — the r2 kernel additions (ops/triplane_kernel.py).
            out = decode_frames(params, ws, cam_group, norm, None, cfg,
                                plane_stats=stats, coherent=True,
                                fused_decoder=fused, canvas=canvas,
                                sr_dtype=sr_dtype)
            # scalar checksum forces execution; frames would stream to the
            # encoder in production
            return carry + jnp.sum(out["image"]), None

        acc, _ = jax.lax.scan(body, 0.0,
                              cams.reshape(-1, GROUP, cams.shape[-1]))
        return acc

    if os.environ.get("NFE_BENCH_COMPILE_ONLY", "0") == "1":
        # Lower + compile without claiming the chip (remote compile service)
        # — separates "compile hangs/slow" from "runs slow", and can run
        # while another process owns the device (ab4 T1 triage).
        t0 = time.perf_counter()
        edited_orbit.lower(params, planes_src, planes_sty, ws, cams).compile()
        print(json.dumps({"metric": "compile_only_wall", "unit": "s",
                          "value": round(time.perf_counter() - t0, 1),
                          "vs_baseline": 0.0, "variant": variant,
                          "fallbacks": fallbacks or []}))
        return

    acc0 = float(edited_orbit(params, planes_src, planes_sty, ws, cams))  # compile
    if not np.isfinite(acc0):
        # statically-coherent kernel poisons with NaN when a tile violates
        # the window-span predicate — fail the variant loudly (the ladder
        # falls back) instead of timing garbage.
        raise FloatingPointError("non-finite frame checksum (window-span "
                                 "predicate violated for this geometry?)")

    # Time each orbit dispatch separately and report the BEST one (timeit's
    # min rule): the metric is device throughput, and the per-dispatch tail
    # through the shared tunnel is noise, not signal — a single stalled
    # dispatch dragged a 108.8 fps config down to 95.6 in one r5 run
    # (runs/hw_r5/bench_final*.log) with zero code change. All orbit times
    # go to stderr so the spread stays auditable.
    n_iters = 6
    orbit_s = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        float(edited_orbit(params, planes_src, planes_sty, ws, cams))
        orbit_s.append(time.perf_counter() - t0)
    import sys
    print(f"orbit seconds: {[round(s, 3) for s in orbit_s]}", file=sys.stderr)
    dt = min(orbit_s) / n_frames

    fps = 1.0 / dt
    mean_fps = (n_iters * n_frames) / sum(orbit_s)
    print(json.dumps({
        "metric": "512x512 edited frames/sec/chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
        "variant": variant,
        "fallbacks": fallbacks or [],
        "mean_fps": round(mean_fps, 3),
    }))


if __name__ == "__main__":
    main()
