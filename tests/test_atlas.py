"""Atlas pipeline tests: PNG round-trip, MaxRects invariants, big-atlas
assembly + proxy metadata (SpriteSheetRegistry.js:438-902)."""

import numpy as np
import pytest

from multithreadedgameengine_tpu.assets import SpriteRegistry
from multithreadedgameengine_tpu.render.atlas import (
    BigAtlas,
    MaxRectsPacker,
    create_big_atlas,
    decode_png,
    inspect_atlas,
    light_gradient_texture,
)
from multithreadedgameengine_tpu.render.headless import write_png


class TestPNG:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, (37, 53, 3), np.uint8)
        p = str(tmp_path / "t.png")
        write_png(p, rgb)
        with open(p, "rb") as f:
            out = decode_png(f.read())
        np.testing.assert_array_equal(out[..., :3], rgb)
        assert (out[..., 3] == 255).all()


class TestMaxRects:
    def test_no_overlaps_and_in_bounds(self):
        rng = np.random.default_rng(1)
        packer = MaxRectsPacker(256, 256)
        placed = []
        for _ in range(60):
            w, h = int(rng.integers(4, 40)), int(rng.integers(4, 40))
            r = packer.insert(w, h)
            if r is None:
                continue
            assert 0 <= r.x and r.x + r.w <= 256
            assert 0 <= r.y and r.y + r.h <= 256
            for o in placed:
                assert (r.x >= o.x + o.w or o.x >= r.x + r.w
                        or r.y >= o.y + o.h or o.y >= r.y + r.h), "overlap"
            placed.append(r)
        assert len(placed) > 30

    def test_rejects_oversize(self):
        packer = MaxRectsPacker(64, 64)
        assert packer.insert(100, 10) is None


class TestBigAtlas:
    def make_sheet(self):
        # 2x2 frame sheet: 4 frames of 8x8, distinct colors
        sheet = np.zeros((16, 16, 4), np.uint8)
        colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
        frames = {}
        anims = {"walk_down": [], "idle_down": []}
        for k, (r, g, b) in enumerate(colors):
            y, x = (k // 2) * 8, (k % 2) * 8
            sheet[y:y + 8, x:x + 8] = (r, g, b, 255)
            name = f"f{k}"
            frames[name] = {"frame": {"x": x, "y": y, "w": 8, "h": 8}}
            (anims["walk_down"] if k < 2 else anims["idle_down"]).append(name)
        return sheet, {"frames": frames, "animations": anims}

    def test_pack_and_recover_frames(self, tmp_path):
        ball = np.full((14, 14, 4), (255, 128, 0, 255), np.uint8)
        sheet, meta = self.make_sheet()
        reg = SpriteRegistry()
        atlas = create_big_atlas({"ball": ball}, {"civ": (sheet, meta)},
                                 size=128, registry=reg)
        # every frame recoverable, pixel-exact
        np.testing.assert_array_equal(atlas.frame_image("ball"), ball)
        np.testing.assert_array_equal(
            atlas.frame_image("civ/f0"), sheet[0:8, 0:8]
        )
        # builtin glow injected (SpriteSheetRegistry.js:774-788)
        assert "_lightGradient" in atlas.frames
        # registry got the texture + sheet with animation index space
        assert reg.texture_id("ball") > 0
        assert reg.animation_index("civ", "walk_down") == 0
        assert reg.animation_index("civ", "idle_down") == 1
        # proxy metadata in the json
        assert atlas.json["sheets"]["civ"]["animations"] == ["walk_down", "idle_down"]
        # inspector writes a PNG
        p = str(tmp_path / "atlas.png")
        inspect_atlas(atlas, p)
        assert open(p, "rb").read(4) == b"\x89PNG"[:4]

    def test_grows_until_fit(self):
        imgs = {f"t{k}": np.zeros((60, 60, 4), np.uint8) for k in range(12)}
        atlas = create_big_atlas(imgs, size=64)  # must grow past 64
        assert atlas.image.shape[0] >= 256

    def test_light_gradient_shape(self):
        g = light_gradient_texture(50)
        assert g.shape == (100, 100, 4)
        c = g[50, 50, 3]
        e = g[50, 2, 3]
        assert c > 200 and e < 10  # bright center, transparent edge
