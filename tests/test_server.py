"""Render-server tests: binary frame protocol, endpoints, input plane."""

import json
import struct
import urllib.request

import numpy as np
import pytest

from multithreadedgameengine_tpu.models.balls import make_balls_engine
from multithreadedgameengine_tpu.server import RenderServer
from multithreadedgameengine_tpu.server.render_server import MAGIC, encode_frame


@pytest.fixture(scope="module")
def served():
    eng = make_balls_engine(n_balls=50, spawn=False, seed=3,
                            world_width=1000.0, world_height=700.0)
    for _ in range(30):
        eng.spawn("Ball", x=eng.rng() * 1000.0, y=eng.rng() * 700.0)
    eng.step(3)
    srv = RenderServer(eng, port=0).start()  # ephemeral port
    srv.publish()
    yield eng, srv
    srv.stop()


def get(srv, path):
    return urllib.request.urlopen(f"http://localhost:{srv.port}{path}", timeout=10)


class TestFrameProtocol:
    def test_encode_and_parse(self, served):
        eng, _ = served
        buf = encode_frame(eng)
        magic, step, n_e, n_p, n_s, n_l = struct.unpack_from("<IIIIII", buf, 0)
        assert magic == MAGIC
        assert n_e > 0
        ent = np.frombuffer(buf, "<f4", n_e * 8, 24).reshape(n_e, 8)
        assert np.isfinite(ent).all()
        assert (ent[:, 0] >= 0).all() and (ent[:, 0] <= 1000.0).all()
        rad = np.frombuffer(buf, "<f4", n_e, 24 + n_e * 32)
        assert (rad >= 0).all() and (rad <= 30.0).all()

    def test_http_endpoints(self, served):
        eng, srv = served
        cfg = json.loads(get(srv, "/config").read())
        assert cfg["world_width"] == 1000.0
        stats = json.loads(get(srv, "/stats").read())
        assert stats["pools"]["Ball"]["active"] == 30
        frame = get(srv, "/frame").read()
        assert struct.unpack_from("<I", frame, 0)[0] == MAGIC
        page = get(srv, "/").read()
        assert b"<canvas" in page

    def test_input_roundtrip(self, served):
        eng, srv = served
        body = json.dumps({"mouse_x": 123.0, "mouse_y": 45.0, "button0": 1,
                           "keys_down": ["m"], "camera": [5.0, 6.0, 2.0]}).encode()
        req = urllib.request.Request(
            f"http://localhost:{srv.port}/input", data=body, method="POST")
        urllib.request.urlopen(req, timeout=10)
        srv.apply_inputs()
        assert eng.input.mouse_x == 123.0
        assert eng.input.mouse_is_down
        assert eng.input.is_down("m")
        assert eng.input.camera_zoom == 2.0
