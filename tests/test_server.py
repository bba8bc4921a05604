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
        from multithreadedgameengine_tpu.server.render_server import ENT_LANES

        magic, step, n_e, n_p, n_s, n_l, dbg_mask, n_dbg = struct.unpack_from(
            "<IIIIIIII", buf, 0
        )
        assert magic == MAGIC
        assert n_e > 0
        assert dbg_mask == 0 and n_dbg == 0
        ent = np.frombuffer(buf, "<f4", n_e * ENT_LANES, 32).reshape(n_e, ENT_LANES)
        assert np.isfinite(ent).all()
        assert (ent[:, 0] >= 0).all() and (ent[:, 0] <= 1000.0).all()
        # index lane holds real entity ids
        assert (ent[:, 12] >= 0).all() and (ent[:, 12] < 51).all()
        rad = np.frombuffer(buf, "<f4", n_e, 32 + n_e * ENT_LANES * 4)
        assert (rad >= 0).all() and (rad <= 30.0).all()

    def test_debug_section_present_when_flagged(self, served):
        eng, _ = served
        eng.debug.show_velocity()
        buf = encode_frame(eng)
        _, _, n_e, _, _, _, dbg_mask, n_dbg = struct.unpack_from("<IIIIIIII", buf, 0)
        assert dbg_mask & (1 << 1)  # velocity bit
        assert n_dbg == n_e
        eng.debug.disable_all()

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

    def test_atlas_endpoints(self):
        """Predators-style engine + procedural atlas: /atlas serves a PNG,
        /atlas.json maps the ENGINE's numeric ids to frame rects (the
        client's drawImage sub-rect tables, pixi_worker.js:1683-1822)."""
        from multithreadedgameengine_tpu.models.predators import (
            make_predators_engine,
        )
        from multithreadedgameengine_tpu.render.atlas import decode_png
        from multithreadedgameengine_tpu.server.render_server import (
            build_demo_atlas,
        )

        eng = make_predators_engine(
            n_prey=4, n_predators=1, n_lights=1,
            particle=dict(max_particles=0), lighting=dict(enabled=False),
        )
        atlas = build_demo_atlas(eng)
        srv = RenderServer(eng, port=0, atlas=atlas).start()
        try:
            png = get(srv, "/atlas").read()
            img = decode_png(png)
            assert img.shape[2] == 4 and img.shape[0] >= 1024
            payload = json.loads(get(srv, "/atlas.json").read())
            # every civil sheet id maps its walk_down animation (index from
            # the engine registry) to 9 frame rects
            sid = eng.sprites.sheet_id("civil1")
            a_idx = eng.sprites.animation_index("civil1", "walk_down")
            rects = payload["sheets"][str(sid)][str(a_idx)]
            assert len(rects) == 9
            x, y, w, h = rects[0]
            assert w == 64 and h == 64
            # frame pixels in the atlas are non-empty (a drawn character)
            assert img[y:y+h, x:x+w, 3].sum() > 0
            # static textures mapped by texture id
            tid = eng.sprites.texture_id("bunny")
            assert str(tid) in payload["textures"]
        finally:
            srv.stop()

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


class TestSpriteOverrides:
    """The sprite-override RPC plane (gameObject.js:546-582 →
    pixi_worker.js:2009-2053): host API → /overrides endpoint → client."""

    def test_override_through_server(self, served):
        eng, srv = served
        eng.set_sprite_prop(3, "tint", 0xFF0000)
        eng.set_sprite_prop(3, "alpha", 0.25)
        eng.call_sprite_method(7, "gotoAndStop", 2)
        o = json.loads(get(srv, "/overrides").read())
        assert o["props"]["3"] == {"tint": 0xFF0000, "alpha": 0.25}
        assert o["calls"][-1]["index"] == 7
        assert o["calls"][-1]["method"] == "gotoAndStop"
        assert o["calls"][-1]["args"] == [2]
        seq = o["calls"][-1]["seq"]
        # one-shot calls are sequence-numbered so a polling client
        # replays each exactly once
        eng.call_sprite_method(7, "setVisible", False)
        o2 = json.loads(get(srv, "/overrides").read())
        assert o2["calls"][-1]["seq"] == seq + 1
        # clearing a prop removes it from the table
        eng.set_sprite_prop(3, "alpha", None)
        o3 = json.loads(get(srv, "/overrides").read())
        assert o3["props"]["3"] == {"tint": 0xFF0000}
        eng.set_sprite_prop(3, "tint", None)
        assert "3" not in json.loads(get(srv, "/overrides").read())["props"]
        # client script consumes the plane
        page = get(srv, "/").read().decode()
        assert "/overrides" in page and "gotoAndStop" in page
