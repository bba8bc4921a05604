"""Asset tooling CLIs (tools/texture_packer, tools/sprite_visualizer) — the
spritesheet_stuff/ analogs (texturepacker.html, animatedSpriteVisualizer.html)
driven end-to-end over procedurally generated sheets."""

import json
import os

import numpy as np

from multithreadedgameengine_tpu.render.headless import encode_png
from multithreadedgameengine_tpu.render.procgen import (
    make_character_sheet,
    make_demo_textures,
)
from multithreadedgameengine_tpu.tools.sprite_visualizer import main as viz_main
from multithreadedgameengine_tpu.tools.texture_packer import (
    main as pack_main,
    slice_sheet,
)


def _write_assets(tmp_path):
    sheet, meta = make_character_sheet(seed=3)
    sheet_path = str(tmp_path / "civil.png")
    with open(sheet_path, "wb") as f:
        f.write(encode_png(sheet))
    tex = make_demo_textures()["bunny"]
    tex_path = str(tmp_path / "bunny.png")
    with open(tex_path, "wb") as f:
        f.write(encode_png(tex))
    fh, fw = next(iter(meta["frames"].values()))["frame"]["h"], next(
        iter(meta["frames"].values())
    )["frame"]["w"]
    return sheet_path, tex_path, sheet, fw, fh


class TestTexturePacker:
    def test_pack_cli_roundtrip(self, tmp_path):
        sheet_path, tex_path, sheet, fw, fh = _write_assets(tmp_path)
        out_png = str(tmp_path / "atlas.png")
        out_json = str(tmp_path / "atlas.json")
        dbg = str(tmp_path / "atlas_dbg.png")
        rc = pack_main([
            tex_path,
            "--sheet", f"civil={sheet_path}:{fw}x{fh}:idle_up,idle_right",
            "--out", out_png, "--json", out_json, "--inspect", dbg,
        ])
        assert rc == 0
        assert os.path.getsize(out_png) > 0 and os.path.getsize(dbg) > 0
        meta = json.load(open(out_json))
        # loose texture + builtin gradient + sliced frames all present
        assert "bunny" in meta["frames"]
        assert "_lightGradient" in meta["frames"]
        assert any(k.startswith("civil/idle_up_") for k in meta["frames"])
        assert "civil" in meta["sheets"]
        side = meta["meta"]["size"]["w"]
        for fr in meta["frames"].values():
            f = fr["frame"]
            assert 0 <= f["x"] and f["x"] + f["w"] <= side
            assert 0 <= f["y"] and f["y"] + f["h"] <= side

    def test_slice_names_and_trim(self):
        img = np.zeros((32, 64, 4), np.uint8)
        img[0:16, 0:48, 3] = 255  # row 0: 3 frames then an empty one
        img[16:32, :, 3] = 255  # row 1: all 4 frames
        meta = slice_sheet(img, 16, 16, ["walk"])
        assert [len(v) for v in meta["animations"].values()] == [3, 4]
        assert list(meta["animations"]) == ["walk", "row1"]


class TestSpriteVisualizer:
    def test_visualizer_outputs(self, tmp_path):
        sheet_path, _tex, sheet, fw, fh = _write_assets(tmp_path)
        out = str(tmp_path / "prev")
        rc = viz_main([sheet_path, f"{fw}x{fh}", "--out", out])
        assert rc == 0
        page = open(os.path.join(out, "index.html")).read()
        assert "@keyframes" in page and "steps(" in page
        strips = [p for p in os.listdir(out) if p.endswith(".png")]
        assert len(strips) >= 4  # one per animation row
