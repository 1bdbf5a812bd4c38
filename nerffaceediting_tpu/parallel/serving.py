"""Multi-chip SPMD serving: jax.sharding + shard_map over the session Mesh.

Two scaling modes for the editing hot path (planes → edited frames), both
pure SPMD with replicated params/planes (~30 MB — negligible per HBM):

* ``orbit_sharded`` — THROUGHPUT: the F orbit frames split over the mesh's
  ``data`` axis. Frames are independent, so the program has ZERO
  collectives; frames/sec scales linearly from chip to slice. This is the
  production path for orbit-video serving (the bench.py workload, F per
  dispatch).
* ``frame_sharded`` — LATENCY: ONE frame's ray rows split over the ``data``
  axis. Each device renders a ``(res/n, res)`` horizontal band — a valid
  coherence grid for the windowed tri-plane kernel (rays stay row-major
  within the band) — and the band-sharded feature image flows into the SR
  convolutions under a GSPMD spatial-partitioning constraint, so XLA
  lowers the convs to halo exchanges on ICI instead of an all_gather.

The reference has no analogue: it serves one frame per GPU process
(ref gen_videos.py:246-318 renders trajectories frame-by-frame on a single
device). Multi-chip serving is a TPU-native addition; correctness is pinned
against the single-device renderer on the 8-device CPU mesh
(tests/test_parallel_serving.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map


def orbit_sharded(params, ws, cams, norm_planes, denorm_planes, cfg, mesh: Mesh,
                  *,
                  plane_stats: Optional[Tuple[jax.Array, jax.Array]] = None,
                  neural_rendering_resolution: Optional[int] = None,
                  coherent: Optional[bool] = None,
                  fused_decoder: bool = True,
                  scan_group: Optional[int] = None,
                  sr_dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Render an F-frame orbit with frames sharded over ``mesh['data']``.

    Per-device body is ``editing.api.decode_frames`` on F/n frames;
    params/ws/planes are replicated operands. Returns the same dict as
    ``decode_frames`` with leading axis F, sharded over ``data``.

    scan_group: frames per lax.scan body on each device (bench.py's GROUP).
    Long per-device orbits MUST set this on TPU — unrolling many fused
    tri-plane kernel calls into one program crashes the Mosaic compiler
    (docs/PERF.md compiler limits). 1 is both the measured optimum and the
    only compile-safe value on the current libtpu (r4 bisect: >=2 frames
    per body SIGABRTs with the pull-back merge, flattened or not).
    """
    from ..editing.api import decode_frames

    n = mesh.shape["data"]
    F = cams.shape[0]
    if F % n != 0:
        raise ValueError(f"orbit length {F} must divide over data={n} devices")
    if scan_group is not None and (F // n) % scan_group != 0:
        raise ValueError(f"per-device orbit {F // n} must divide into "
                         f"scan groups of {scan_group}")

    def render_group(params_, ws_, cams_, norm_, denorm_, stats_):
        return decode_frames(
            params_, ws_, cams_, norm_, denorm_, cfg,
            plane_stats=stats_,
            neural_rendering_resolution=neural_rendering_resolution,
            coherent=coherent, fused_decoder=fused_decoder,
            sr_dtype=sr_dtype)

    def local_frames(params_, ws_, cams_, norm_, denorm_, stats_):
        F_local = cams_.shape[0]
        if scan_group is None or scan_group >= F_local:
            return render_group(params_, ws_, cams_, norm_, denorm_, stats_)

        def body(_, cam_group):
            return None, render_group(params_, ws_, cam_group, norm_,
                                      denorm_, stats_)

        _, outs = jax.lax.scan(
            body, None, cams_.reshape(-1, scan_group, cams_.shape[-1]))
        # (n_groups, group, ...) → (F_local, ...)
        return jax.tree.map(
            lambda a: a.reshape((F_local,) + a.shape[2:]), outs)

    return shard_map(
        local_frames, mesh=mesh,
        in_specs=(P(), P(), P("data"), P(), P(), P()),
        out_specs=P("data"),
        check_vma=False,  # body is per-frame independent by construction
    )(params, ws, cams, norm_planes, denorm_planes, plane_stats)


def frame_sharded(params, ws, cam, norm_planes, denorm_planes, cfg, mesh: Mesh,
                  *,
                  plane_stats: Optional[Tuple[jax.Array, jax.Array]] = None,
                  neural_rendering_resolution: Optional[int] = None,
                  coherent: Optional[bool] = None,
                  fused_decoder: bool = False,
                  canvas: Optional[jax.Array] = None,
                  sr_dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Render ONE frame with its ray rows sharded over ``mesh['data']``.

    cam: (1, 25). Each device renders a (res/n, res) band via shard_map
    (replicated planes/params, banded rays), then the SR stage runs under a
    spatial-partitioning constraint on the band axis — XLA keeps the
    feature image sharded and inserts halo exchanges for the conv aprons.

    Pass a prebuilt ``canvas`` (editing.api.plane_canvas) when rendering a
    trajectory frame-by-frame, exactly like the single-chip path.
    """
    from ..models.superresolution import superresolution
    from ..models.triplane import _decoder_fn
    from ..render.ray_sampler import sample_rays

    from ..render.renderer import render_rays

    n = mesh.shape["data"]
    res = neural_rendering_resolution or cfg.neural_rendering_resolution
    if res % n != 0:
        raise ValueError(f"render resolution {res} must divide over "
                         f"data={n} devices (row bands)")

    cam2world = cam[:, :16].reshape(-1, 4, 4)
    intrinsics = cam[:, 16:25].reshape(-1, 3, 3)
    ray_o, ray_d = sample_rays(cam2world, intrinsics, res)  # (1, R, 3), row-major

    def render_band(params_, norm_, denorm_, stats_, canvas_, o_, d_):
        feats, segs, depths, _ = render_rays(
            _decoder_fn(cfg), params_["decoder"], norm_, denorm_, o_, d_,
            cfg.rendering, rng=None, plane_stats=stats_,
            ray_grid=(res // n, res), coherent=coherent,
            fused_decoder=fused_decoder, canvas=canvas_)
        return feats, segs, depths

    feats, segs, depths = shard_map(
        render_band, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P(None, "data", None), P(None, "data", None)),
        out_specs=P(None, "data", None),
        check_vma=False,
    )(params, norm_planes, denorm_planes, plane_stats, canvas, ray_o, ray_d)

    band = NamedSharding(mesh, P(None, None, "data", None))
    seg_image = None
    if segs is not None:
        seg_image = jax.lax.with_sharding_constraint(
            segs.reshape(1, res, res, -1).transpose(0, 3, 1, 2), band)
    depth_image = jax.lax.with_sharding_constraint(
        depths.reshape(1, res, res, 1).transpose(0, 3, 1, 2), band)
    feature_image = jax.lax.with_sharding_constraint(
        feats.reshape(1, res, res, -1).transpose(0, 3, 1, 2), band)
    rgb_image = feature_image[:, :3]
    sr_image = superresolution(
        params["superresolution"], rgb_image, feature_image, ws,
        variant=cfg.rendering.superresolution_module,
        sr_antialias=cfg.rendering.sr_antialias,
        noise_mode=cfg.rendering.superresolution_noise_mode,
        rng=None, dtype=sr_dtype)
    sr_image = jax.lax.with_sharding_constraint(
        sr_image, NamedSharding(mesh, P(None, None, "data", None)))
    return {"image": sr_image, "image_seg": seg_image,
            "image_raw": rgb_image, "image_depth": depth_image}
