"""Interactive render session — the visualizer's engine, headless.

Rebuild of ref visualizer.py:39-324 + viz/ widgets + viz/renderer.py for a
TPU service context: the imgui/OpenGL shell is replaced by a stateful
`RenderSession` exposing every widget's control surface programmatically
(and over a tiny stdlib HTTP endpoint for remote UIs):

  widget (ref viz/)              session control
  ───────────────────────────    ─────────────────────────────────────────
  pickle_widget                  load_checkpoint()
  latent_widget                  set_seed()/set_w()
  stylemix_widget                set_style_mix(seed, cutoff)
  trunc_noise_widget             set_truncation(psi, cutoff), noise_mode
  pose_widget / zoom_widget      set_pose(yaw, pitch), set_fov()
  conditioning_pose_widget       set_conditioning_pose()
  render_type_widget             set_render_type('rgb'|'depth'|'seg')
  render_depth_sample_widget     set_depth_samples(coarse, fine)
  backbone_cache_widget          plane caching (automatic: planes are
                                 explicit state here, re-used across frames)
  performance_widget             frame timing in result dict

Rendering runs as one jitted planes→frame program per (render-type,
depth-resolution) combination; changing a latent re-encodes planes once and
orbiting the camera reuses them — the explicit-planes equivalent of the
reference's backbone cache (ref triplane.py:55, viz/renderer.py:125-157).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GeneratorConfig, ffhq_generator_config
from ..editing.api import decode, encode
from ..editing.masks import labels_to_colors
from ..models import triplane
from ..render.cameras import camera_params, fov_to_intrinsics, lookat_pose


@dataclasses.dataclass
class SessionState:
    seed: int = 0
    w: Optional[np.ndarray] = None          # explicit W override
    style_mix_seed: Optional[int] = None
    style_mix_cutoff: int = 7
    truncation_psi: float = 0.7
    truncation_cutoff: Optional[int] = 14
    yaw: float = 0.0
    pitch: float = 0.0
    fov_deg: float = 18.837
    cond_yaw: float = 0.0
    cond_pitch: float = 0.0
    render_type: str = "rgb"                # rgb | depth | seg
    depth_resolution: int = 48
    depth_resolution_importance: int = 48
    noise_mode: str = "const"


class RenderSession:
    def __init__(self, params=None, cfg: Optional[GeneratorConfig] = None):
        self.cfg = cfg or ffhq_generator_config()
        self.params = params or triplane.init_generator(jax.random.key(0), self.cfg)
        self.state = SessionState()
        self._planes = None
        self._stats = None
        self._ws = None
        self._dirty = True

    # ---- controls -------------------------------------------------------
    def load_checkpoint(self, path: str) -> None:
        from ..io.checkpoint import load_checkpoint

        params = load_checkpoint(path)
        self.params = params.get("g_ema", params)
        self._dirty = True

    def set_seed(self, seed: int):
        self.state.seed = int(seed)
        self.state.w = None
        self._dirty = True

    def set_w(self, w: np.ndarray):
        self.state.w = np.asarray(w)
        self._dirty = True

    def set_style_mix(self, seed: Optional[int], cutoff: int = 7):
        self.state.style_mix_seed = seed
        self.state.style_mix_cutoff = cutoff
        self._dirty = True

    def set_truncation(self, psi: float, cutoff: Optional[int] = None):
        self.state.truncation_psi = psi
        if cutoff is not None:
            self.state.truncation_cutoff = cutoff
        self._dirty = True

    def set_pose(self, yaw: float, pitch: float):
        self.state.yaw, self.state.pitch = yaw, pitch

    def set_fov(self, fov_deg: float):
        self.state.fov_deg = fov_deg

    def set_conditioning_pose(self, yaw: float, pitch: float):
        self.state.cond_yaw, self.state.cond_pitch = yaw, pitch
        self._dirty = True

    def set_render_type(self, kind: str):
        assert kind in ("rgb", "depth", "seg")
        self.state.render_type = kind

    def set_depth_samples(self, coarse: int, fine: int):
        self.state.depth_resolution = coarse
        self.state.depth_resolution_importance = fine

    # ---- rendering ------------------------------------------------------
    def _camera(self, yaw, pitch):
        pose = lookat_pose(np.pi / 2 + yaw, np.pi / 2 + pitch,
                           self.cfg.rendering.avg_camera_pivot,
                           radius=self.cfg.rendering.avg_camera_radius)
        return camera_params(pose, fov_to_intrinsics(self.state.fov_deg))

    def _encode_planes(self):
        s = self.state
        cfg = self.cfg
        c_cond = self._camera(s.cond_yaw, s.cond_pitch)
        if s.w is not None:
            ws = jnp.asarray(s.w)
            if ws.ndim == 2:
                ws = ws[None]
        else:
            z = jax.random.normal(jax.random.key(s.seed), (1, cfg.z_dim))
            ws = triplane.mapping(self.params, z, c_cond, cfg,
                                  truncation_psi=s.truncation_psi,
                                  truncation_cutoff=s.truncation_cutoff)
        if s.style_mix_seed is not None:
            z2 = jax.random.normal(jax.random.key(s.style_mix_seed), (1, cfg.z_dim))
            ws2 = triplane.mapping(self.params, z2, c_cond, cfg,
                                   truncation_psi=s.truncation_psi,
                                   truncation_cutoff=s.truncation_cutoff)
            idx = jnp.arange(ws.shape[1])[None, :, None]
            ws = jnp.where(idx < s.style_mix_cutoff, ws, ws2)
        self._ws = ws
        planes = encode(self.params, ws, cfg, noise_mode=s.noise_mode)
        flat = planes.reshape(planes.shape[0], -1, *planes.shape[-2:])
        norm, mean, var = triplane.normalize_plane(flat)
        self._planes = triplane.split_planes(norm, cfg)
        B = planes.shape[0]
        self._stats = (mean.reshape(B, cfg.num_planes, cfg.plane_channels),
                       (var + 1e-8).reshape(B, cfg.num_planes, cfg.plane_channels))
        self._dirty = False

    def render(self) -> Dict[str, np.ndarray]:
        """Render the current state; returns {'image': HxWx3 uint8,
        'render_time_ms': float, ...} (the performance widget's numbers)."""
        s = self.state
        if self._dirty:
            self._encode_planes()
        cfg = dataclasses.replace(
            self.cfg,
            rendering=dataclasses.replace(
                self.cfg.rendering,
                depth_resolution=s.depth_resolution,
                depth_resolution_importance=s.depth_resolution_importance,
            ),
        )
        cam = self._camera(s.yaw, s.pitch)
        t0 = time.perf_counter()
        out = triplane.render_planes(
            self.params, self._planes, None, cam, cfg, ws_sr=self._ws,
            plane_stats=self._stats, noise_mode=s.noise_mode)
        if s.render_type == "rgb":
            img = out["image"]
        elif s.render_type == "seg":
            img = labels_to_colors(out["image_seg"])
        else:  # depth
            d = out["image_depth"]
            d = (d - d.min()) / (d.max() - d.min() + 1e-8)
            img = jnp.tile(d * 2 - 1, (1, 3, 1, 1))
        arr = np.asarray(jnp.transpose(jnp.clip(img[0], -1, 1), (1, 2, 0)))
        dt = (time.perf_counter() - t0) * 1000
        return {
            "image": ((arr + 1) * 127.5).astype(np.uint8),
            "render_time_ms": dt,
            "render_type": s.render_type,
        }


def serve(session: RenderSession, port: int = 8000, host: str = "127.0.0.1"):
    """Minimal HTTP endpoint: GET /render?yaw=..&pitch=..&seed=..&type=rgb →
    PNG. The remote-UI analog of the reference's async render process.

    DEBUG TOOL ONLY: no authentication, and each GET mutates the shared
    session state — do not expose beyond localhost (default bind) or to
    untrusted users; front it with an authenticating proxy for anything
    more than single-user local inspection."""
    import io
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            if "seed" in q:
                session.set_seed(int(q["seed"][0]))
            if "type" in q:
                session.set_render_type(q["type"][0])
            session.set_pose(float(q.get("yaw", [0])[0]), float(q.get("pitch", [0])[0]))
            out = session.render()
            import PIL.Image

            buf = io.BytesIO()
            PIL.Image.fromarray(out["image"]).save(buf, format="PNG")
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(buf.getvalue())

        def log_message(self, *a):
            pass

    HTTPServer((host, port), Handler).serve_forever()


if __name__ == "__main__":
    serve(RenderSession())
