"""Attribution profile of the decode program: compile → dump HLO → trace →
map the top exclusive-time ops to their JAX source metadata.

Usage: python scripts/profile_decode.py [n_frames]
"""

import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from nerffaceediting_tpu.ops import precision as prec

    prec.set_precision(lax.Precision.DEFAULT)

    from nerffaceediting_tpu.config import ffhq_generator_config
    from nerffaceediting_tpu.editing.api import (
        decode_frames, encode, swap_appearance_stats)
    from nerffaceediting_tpu.models import triplane
    from nerffaceediting_tpu.render.cameras import (
        camera_params, fov_to_intrinsics, lookat_pose)

    cfg = ffhq_generator_config()
    params = triplane.init_generator(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
    cams = jnp.concatenate([
        camera_params(lookat_pose(np.pi / 2 + 0.4 * np.sin(2 * np.pi * i / F),
                                  np.pi / 2 - 0.25 * np.cos(2 * np.pi * i / F),
                                  (0, 0, 0.2), radius=2.7),
                      fov_to_intrinsics(18.837)[None]) for i in range(F)])
    ws = triplane.mapping(params, z, cams[:1], cfg)
    planes = encode(params, ws, cfg)
    sty = encode(params, triplane.mapping(
        params, jax.random.normal(jax.random.key(2), (1, cfg.z_dim)),
        cams[:1], cfg), cfg)
    norm, stats = swap_appearance_stats(planes, sty)

    # bench.py's scan program: GROUP frames per body rendered as ONE
    # flattened decode_frames call (the r4 body — per-frame fused-decode
    # calls SIGABRT this image's compiler for >=2 per body, runs/hw_r4).
    from nerffaceediting_tpu.editing.api import plane_canvas

    GROUP = int(os.environ.get("GROUP", "1"))
    GROUP = min(GROUP, F)
    assert F % GROUP == 0
    sr_dtype = (jnp.bfloat16 if os.environ.get("NFE_BENCH_SR_BF16", "1") == "1"
                else jnp.float32)

    def fn_inner(p, w, c, n):
        canvas = plane_canvas(n)  # mirrors bench.py: one build per orbit

        def body(carry, cam_group):
            out = decode_frames(p, w, cam_group, n, None, cfg,
                                plane_stats=stats, coherent=True,
                                fused_decoder=True, canvas=canvas,
                                sr_dtype=sr_dtype)
            return carry + jnp.sum(out["image"]), None

        acc, _ = lax.scan(body, 0.0, c.reshape(-1, GROUP, c.shape[-1]))
        return acc

    fn = jax.jit(fn_inner)
    lowered = fn.lower(params, ws, cams, norm)
    comp = lowered.compile()
    hlo = comp.as_text()

    # name → (kind, dtype+shape, metadata). Shape may be a tuple with spaces
    # ("(f32[4]{0}, s32[])"), so match the kind as the token directly before
    # the "(" and take everything between "=" and it as the shape.
    meta = {}
    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*?)\s+([\w\-]+)\(")
    mpat = re.compile(r"metadata=\{[^}]*op_name=\"([^\"]*)\"")
    for line in hlo.splitlines():
        m = pat.match(line)
        if m:
            name, shape, kind = m.groups()
            om = mpat.search(line)
            meta[name] = (kind, shape, om.group(1) if om else "")

    out = fn(params, ws, cams, norm)
    jax.block_until_ready(out)

    # MFU for the whole orbit program: XLA's own flop count over measured
    # wall time, against the v5e peak (197 TFLOP/s bf16 / 98.5 fp32 —
    # cost_analysis counts a bf16 MAC like an fp32 one, so quote both).
    try:
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001 — backend may not support it
        print(f"cost_analysis unavailable: {e}")
        flops = 0.0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = fn(params, ws, cams, norm)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    if flops:
        fl_s = flops / dt
        print(f"program flops={flops:.3e}  wall={dt * 1e3:.1f} ms "
              f"({dt * 1e3 / F:.2f} ms/frame)  "
              f"=> {fl_s / 1e12:.2f} TFLOP/s = "
              f"{100 * fl_s / 197e12:.1f}% of v5e bf16 peak / "
              f"{100 * fl_s / 98.5e12:.1f}% of fp32 peak")

    trace_dir = "/tmp/jaxtrace_attr"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = fn(params, ws, cams, norm)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    path = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e.get("tid")): e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}

    durs = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pid_names.get(e.get("pid"), "")
                and tid_names.get((e["pid"], e["tid"])) == "XLA Ops"):
            durs[e["name"]] += e["dur"]

    # Container ops (while/call/conditional — e.g. the remat-wrapped eval
    # calls named "checkpoint.N") have durations that INCLUDE their children,
    # which appear as separate X events; classify by HLO kind, not name.
    containers = {n for n in durs
                  if meta.get(n, ("?",))[0] in ("while", "conditional", "call")
                  or n.split(".")[0] in ("while", "conditional", "call")}
    leaf = {n: d for n, d in durs.items() if n not in containers}
    total = sum(leaf.values())
    print(f"leaf op time: {total / 3e3:.2f} ms/call "
          f"({total / (3e3 * F):.2f} ms/frame, F={F}); "
          f"containers: {[(n, round(durs[n] / (3e3 * F), 2)) for n in containers]}")

    def stage_of(name):
        _, _, op_name = meta.get(name, ("?", "?", ""))
        base = name.split(".")[0]
        for key, tag in (
                ("triplane_sample_decode", "fused-kernel+prep+untile"),
                ("_untile_perm", "untile"),
                ("build_plane_canvas", "canvas-build"),
                ("_build_canvas", "canvas-build"),
                ("superresolution", "SR"),
                ("mip_ray_marcher", "marcher"),
                ("_composite", "marcher"),
                ("unify_samples", "merge"),
                ("sample_pdf", "pdf"),
                ("sample_importance", "pdf"),
                ("sample_stratified", "depths"),
                ("sample_rays", "ray-sampler"),
                ("get_ray_limits_box", "ray-bounds"),
                ("plane_canvas", "canvas-build"),
        ):
            if key in op_name:
                return tag
        if base in ("custom-call",) or "pallas" in op_name:
            return "fused-kernel"
        if op_name:
            # last two path segments of the jax source scope
            parts = op_name.strip("/").split("/")
            return "~" + "/".join(parts[-2:])[:46]
        return "~unattributed:" + name.split(".")[0]

    stages = collections.Counter()
    for n, d in leaf.items():
        stages[stage_of(n)] += d
    print("\n-- stage rollup (ms/frame) --")
    for s, d in stages.most_common(24):
        print(f"{d / (3e3 * F):7.3f}  {s}")

    print("\n-- top leaf ops --")
    for name, d in collections.Counter(leaf).most_common(32):
        kind, shape, op_name = meta.get(name, ("?", "?", ""))
        print(f"{d / (3e3 * F):7.3f} ms/f  {name[:28]:<28} {shape[:30]:<30} "
              f"{op_name[-64:]}")


if __name__ == "__main__":
    main()
