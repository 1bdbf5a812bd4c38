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


_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>NeRFFaceEditing-TPU visualizer</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;display:flex;background:#15171a;color:#ddd}
 #panel{width:270px;padding:14px;display:flex;flex-direction:column;gap:10px}
 #panel label{display:flex;justify-content:space-between;font-size:13px}
 #panel input[type=range]{width:150px}
 #panel input[type=number]{width:70px;background:#222;color:#ddd;border:1px solid #444}
 #panel select{background:#222;color:#ddd;border:1px solid #444}
 #view{flex:1;display:flex;align-items:center;justify-content:center;min-height:100vh}
 #frame{max-width:85vmin;max-height:85vmin;cursor:grab;border:1px solid #333;
        image-rendering:auto;background:#000;width:512px;height:512px}
 #stat{font-size:12px;color:#8a8}
 h3{margin:2px 0;font-size:14px;color:#fff}
</style></head><body>
<div id="panel">
 <h3>latent</h3>
 <label>seed <input id="seed" type="number" value="0"></label>
 <label>trunc ψ <input id="psi" type="range" min="0" max="1" step="0.05" value="0.7"></label>
 <label>mix seed <input id="mix" type="number" placeholder="off"></label>
 <label>mix cutoff <input id="cutoff" type="number" value="7"></label>
 <h3>camera</h3>
 <label>yaw <input id="yaw" type="range" min="-0.8" max="0.8" step="0.01" value="0"></label>
 <label>pitch <input id="pitch" type="range" min="-0.6" max="0.6" step="0.01" value="0"></label>
 <label>fov° <input id="fov" type="range" min="12" max="30" step="0.25" value="18.837"></label>
 <h3>render</h3>
 <label>type <select id="type"><option>rgb</option><option>seg</option><option>depth</option></select></label>
 <label>coarse <input id="coarse" type="number" value="48" step="4"></label>
 <label>fine <input id="fine" type="number" value="48" step="4"></label>
 <div id="stat">—</div>
 <div style="font-size:11px;color:#777">drag the image to orbit</div>
</div>
<div id="view"><img id="frame" alt="render"></div>
<script>
const $=id=>document.getElementById(id);
let busy=false, queued=false;
function url(){
  const p=new URLSearchParams({yaw:$("yaw").value,pitch:$("pitch").value,
    fov:$("fov").value,seed:$("seed").value||0,psi:$("psi").value,
    type:$("type").value,coarse:$("coarse").value,fine:$("fine").value,
    cutoff:$("cutoff").value});
  if($("mix").value!=="") p.set("mix",$("mix").value);
  return "/render?"+p.toString();
}
async function refresh(){
  if(busy){queued=true;return}
  busy=true; const t0=performance.now();
  try{
    const r=await fetch(url()); const b=await r.blob();
    $("frame").src=URL.createObjectURL(b);
    $("stat").textContent=(performance.now()-t0).toFixed(0)+" ms  ("+
      (r.headers.get("X-Render-Ms")||"?")+" ms device)";
  }finally{busy=false; if(queued){queued=false; refresh();}}
}
for(const id of["seed","psi","mix","cutoff","yaw","pitch","fov","type","coarse","fine"])
  $(id).addEventListener("input",refresh);
let drag=null;
$("frame").addEventListener("pointerdown",e=>{drag=[e.clientX,e.clientY,
  +$("yaw").value,+$("pitch").value]; $("frame").setPointerCapture(e.pointerId)});
$("frame").addEventListener("pointermove",e=>{ if(!drag)return;
  $("yaw").value=Math.max(-0.8,Math.min(0.8,drag[2]-(e.clientX-drag[0])/300));
  $("pitch").value=Math.max(-0.6,Math.min(0.6,drag[3]+(e.clientY-drag[1])/300));
  refresh()});
$("frame").addEventListener("pointerup",()=>drag=null);
refresh();
</script></body></html>"""


def make_server(session: RenderSession, port: int = 8000,
                host: str = "127.0.0.1"):
    """Build (without starting) the visualizer HTTP server; `serve` runs it.
    port=0 binds an ephemeral port (see server.server_address) — used by
    tests and by embedders that run the server on their own thread."""
    return _make_server(session, port, host)


def serve(session: RenderSession, port: int = 8000, host: str = "127.0.0.1"):
    """Browser visualizer: GET / → a single-page UI (sliders + drag-to-orbit,
    ref visualizer.py:39-324's widget surface); GET /render?yaw=..&pitch=..
    &fov=..&seed=..&psi=..&mix=..&cutoff=..&type=rgb|seg|depth&coarse=..
    &fine=.. → PNG frame (the remote-UI analog of the reference's async
    render process, viz/renderer.py:125-157).

    DEBUG TOOL ONLY: no authentication, and each GET mutates the shared
    session state — do not expose beyond localhost (default bind) or to
    untrusted users; front it with an authenticating proxy for anything
    more than single-user local inspection."""
    _make_server(session, port, host).serve_forever()


def _make_server(session: RenderSession, port: int, host: str):
    import io
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            path = urlparse(self.path)
            if path.path in ("/", "/index.html"):
                body = _INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if path.path != "/render":
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(path.query)

            def f(key, default):
                return float(q.get(key, [default])[0])

            if "seed" in q:
                session.set_seed(int(q["seed"][0]))
            if "psi" in q:
                session.set_truncation(f("psi", 0.7))
            if "mix" in q:
                session.set_style_mix(int(q["mix"][0]),
                                      int(f("cutoff", 7)))
            elif session.state.style_mix_seed is not None:
                session.set_style_mix(None)
            if "type" in q:
                session.set_render_type(q["type"][0])
            if "coarse" in q or "fine" in q:
                session.set_depth_samples(int(f("coarse", 48)),
                                          int(f("fine", 48)))
            if "fov" in q:
                session.set_fov(f("fov", 18.837))
            session.set_pose(f("yaw", 0.0), f("pitch", 0.0))
            out = session.render()
            import PIL.Image

            buf = io.BytesIO()
            PIL.Image.fromarray(out["image"]).save(buf, format="PNG")
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("X-Render-Ms", f"{out['render_time_ms']:.1f}")
            self.send_header("Content-Length", str(buf.getbuffer().nbytes))
            self.end_headers()
            self.wfile.write(buf.getvalue())

        def log_message(self, *a):
            pass

    return HTTPServer((host, port), Handler)


if __name__ == "__main__":
    serve(RenderSession())
