"""Render extraction + headless renderer tests (pixi_worker.js behaviors:
visible compaction, Y-sort, animation frame advance, PNG output)."""

import os

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu.models.balls import make_balls_engine
from multithreadedgameengine_tpu.models.predators import make_predators_engine


@pytest.fixture(scope="module")
def scene():
    eng = make_balls_engine(n_balls=80, spawn=False, seed=11,
                            world_width=1500.0, world_height=1000.0)
    for _ in range(60):
        eng.spawn("Ball", x=eng.rng() * 1500.0, y=eng.rng() * 1000.0)
    eng.input.camera_x = 0.0
    eng.input.camera_y = 0.0
    eng.step(3)
    return eng


class TestRenderPacket:
    def test_packet_contains_visible_only(self, scene):
        pkt = scene.render_packet()
        count = int(pkt.count)
        assert count > 0
        w = jax.device_get(scene.world)
        vis = np.asarray(
            w.transform.active & w.sprite.active & w.sprite.render_visible
            & w.sprite.is_on_screen
        )
        assert count == vis.sum()
        ids = pkt.index[:count]
        assert np.all(ids >= 0)
        assert set(ids.tolist()) == set(np.nonzero(vis)[0].tolist())

    def test_y_sorted(self, scene):
        pkt = scene.render_packet()
        count = int(pkt.count)
        assert np.all(np.diff(pkt.y[:count]) >= 0)  # ySorting=true default

    def test_fields_match_world(self, scene):
        pkt = scene.render_packet()
        w = jax.device_get(scene.world)
        i = int(pkt.index[0])
        assert pkt.x[0] == w.transform.x[i]
        assert pkt.tint[0] == w.sprite.tint[i]
        assert pkt.scale_x[0] == w.sprite.scale_x[i]


class TestAnimationAdvance:
    def test_frames_advance_and_wrap(self):
        eng = make_predators_engine(n_prey=5, n_predators=0, n_lights=0)
        reg = eng.classes["Prey"]
        sl = slice(reg.start_index, reg.start_index + 5)
        frames = []
        for _ in range(30):
            eng.step(1)
            w = jax.device_get(eng.world)
            frames.append(np.asarray(w.sprite.animation_frame)[sl].copy())
        frames = np.stack(frames)
        # idle animations (2 frames at speed .15): frames change over time
        assert len(np.unique(frames)) > 1
        # frame never exceeds the animation's frame count (idle=2, walk=9...)
        assert frames.max() <= 12
        assert frames.min() >= 0


class TestHeadless:
    def test_screenshot_writes_png(self, scene, tmp_path):
        path = str(tmp_path / "frame.png")
        img = scene.screenshot(path, width=320, height=200)
        assert img.shape == (200, 320, 3)
        assert os.path.exists(path)
        with open(path, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"
        # some balls are in view: non-background pixels exist
        assert (img.std(axis=2) > 5).sum() > 10


class TestDebugOverlays:
    def test_all_flags_render(self, scene, tmp_path):
        """Every Debug flag produces a changed image (aabb/indices/trail/
        fps/info overlay parity, Debug.js:254-267, pixi_worker.js:337-646)."""
        from multithreadedgameengine_tpu.render.headless import render_frame

        eng = scene
        base = render_frame(eng, 320, 240)
        for flag in ("colliders", "aabb", "indices", "trail", "fps", "info"):
            eng.debug.disable_all()
            eng.debug._set(flag, True)
            if flag == "trail":
                eng.debug._trails = {}
                render_frame(eng, 320, 240)
                eng.step(2)  # move so the trail has 2+ points
            img = render_frame(eng, 320, 240)
            assert img.shape == (240, 320, 3)
            assert (img != base).any(), f"{flag} overlay drew nothing"
        eng.debug.disable_all()

    def test_micro_font_digits(self):
        from multithreadedgameengine_tpu.render.headless import _draw_text

        img = np.zeros((20, 80, 3), np.float32)
        _draw_text(img, 1, 1, "0123456789.5", (255, 255, 255), 2)
        assert (img > 0).any()
