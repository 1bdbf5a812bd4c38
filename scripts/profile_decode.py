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

    fn = jax.jit(lambda p, w, c, n: decode_frames(
        p, w, c, n, None, cfg, plane_stats=stats, coherent=True,
        fused_decoder=True))
    lowered = fn.lower(params, ws, cams, norm)
    comp = lowered.compile()
    hlo = comp.as_text()

    # name → (kind, dtype+shape, metadata)
    meta = {}
    pat = re.compile(
        r"%?([\w.\-]+) = (\S+) (\w+)\(.*?(?:metadata=\{op_name=\"([^\"]*)\")?",
    )
    for line in hlo.splitlines():
        m = pat.search(line)
        if m:
            name, shape, kind, op_name = m.groups()
            meta[name] = (kind, shape, op_name or "")

    out = fn(params, ws, cams, norm)
    jax.block_until_ready(out)

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

    total = sum(durs.values())
    print(f"total op time: {total / 3e3:.2f} ms/call "
          f"({total / (3e3 * F):.2f} ms/frame, F={F})")
    for name, d in durs.most_common(28):
        kind, shape, op_name = meta.get(name, ("?", "?", ""))
        print(f"{d / (3e3 * F):7.3f} ms/f  {name[:30]:<30} {shape[:34]:<34} "
              f"{op_name[-58:]}")


if __name__ == "__main__":
    main()
