"""RenderSession (visualizer engine) tests."""

import numpy as np
import pytest
import jax

from tests.test_apps import tiny_config
from nerffaceediting_tpu.apps.visualizer import RenderSession
from nerffaceediting_tpu.models import triplane

# session fixture + renders ~100 s of compiles — full tier only
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def session():
    cfg = tiny_config()
    params = triplane.init_generator(jax.random.key(0), cfg)
    s = RenderSession(params, cfg)
    s.set_depth_samples(4, 4)
    return s


class TestRenderSession:
    def test_rgb_render(self, session):
        session.set_render_type("rgb")
        out = session.render()
        assert out["image"].shape == (session.cfg.img_resolution,
                                      session.cfg.img_resolution, 3)
        assert out["image"].dtype == np.uint8
        assert out["render_time_ms"] > 0

    def test_render_types(self, session):
        imgs = {}
        for kind in ("rgb", "seg", "depth"):
            session.set_render_type(kind)
            imgs[kind] = session.render()["image"]
        assert not np.array_equal(imgs["rgb"], imgs["seg"])
        assert not np.array_equal(imgs["rgb"], imgs["depth"])

    def test_pose_changes_image_planes_cached(self, session):
        session.set_render_type("rgb")
        session.set_pose(0.0, 0.0)
        a = session.render()["image"]
        session.set_pose(0.4, 0.1)
        b = session.render()["image"]
        assert not np.array_equal(a, b)
        assert not session._dirty  # camera moves reuse cached planes

    def test_seed_and_stylemix(self, session):
        session.set_pose(0.0, 0.0)
        session.set_seed(1)
        a = session.render()["image"]
        session.set_seed(2)
        b = session.render()["image"]
        assert not np.array_equal(a, b)
        session.set_style_mix(7, cutoff=3)
        c = session.render()["image"]
        assert not np.array_equal(b, c)
        session.set_style_mix(None)

    def test_truncation_psi_zero_collapses(self, session):
        session.set_style_mix(None)
        session.set_truncation(0.0)
        session.set_seed(5)
        a = session.render()["image"]
        session.set_seed(6)
        b = session.render()["image"]
        # psi=0 → everyone is the average face
        np.testing.assert_array_equal(a, b)
        session.set_truncation(0.7)


class TestHTTPFrontend:
    def test_index_and_render_endpoints(self, session):
        import threading
        import urllib.request

        from nerffaceediting_tpu.apps.visualizer import make_server

        srv = make_server(session, port=0)
        host, port = srv.server_address
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(f"http://{host}:{port}/") as r:
                page = r.read().decode()
            assert "drag the image to orbit" in page and "/render?" in page

            url = (f"http://{host}:{port}/render?yaw=0.2&pitch=-0.1"
                   "&fov=20&seed=3&psi=0.6&type=rgb&coarse=4&fine=4")
            with urllib.request.urlopen(url) as r:
                png = r.read()
                ms = r.headers["X-Render-Ms"]
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            assert float(ms) > 0
            assert session.state.yaw == pytest.approx(0.2)
            assert session.state.truncation_psi == pytest.approx(0.6)

            with urllib.request.urlopen(
                    f"http://{host}:{port}/nope") as r:  # pragma: no cover
                pass
        except urllib.error.HTTPError as e:
            assert e.code == 404
        finally:
            srv.shutdown()
