"""Asset metadata registry — the SpriteSheetRegistry analog
(src/core/SpriteSheetRegistry.js).

The reference's registry does two jobs:
 1. METADATA: string→index maps so workers can store sprite state in numeric
    SoA buffers — spritesheet numeric ids 1-255 (:389-431), per-sheet
    animation name→index spaces with a global cache (:37-133, :869-902),
    worker serialize/deserialize (:222-274).
 2. PIXELS: runtime MaxRects packing of every image into one big atlas
    (:438-902) for the WebGL renderer.

On TPU only job 1 touches the device program: ``animation_state`` /
``spritesheet_id`` / ``texture_id`` are ints in the world pytree, and ticks
need static int tables (e.g. [state, direction] → animation index) resolved at
init. Job 2 — the atlas bin-packing for the host renderer — lives in
render/atlas.py and consumes this registry's metadata.
"""

from __future__ import annotations

import difflib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple


@dataclass
class SheetMeta:
    """One spritesheet: ordered animations with frame counts. The animation
    index space is per-sheet and independent (SpriteSheetRegistry.js proxy
    sheets, :869-902)."""

    name: str
    sheet_id: int  # 1-255, 0 = "no sheet / static texture"
    animations: List[str] = field(default_factory=list)  # index = position
    frame_counts: List[int] = field(default_factory=list)
    image: Optional[str] = None  # path/url, for the host renderer

    def animation_index(self, anim: str) -> int:
        try:
            return self.animations.index(anim)
        except ValueError:
            hint = difflib.get_close_matches(anim, self.animations, n=1)
            extra = f" — did you mean {hint[0]!r}?" if hint else ""
            raise KeyError(
                f"sheet {self.name!r} has no animation {anim!r}{extra}"
            ) from None


class SpriteRegistry:
    """Host-side name→index registry. ``MAX_SHEETS`` mirrors the u8
    spritesheetId SAB storage (ids 1-255, SpriteSheetRegistry.js:389-431)."""

    MAX_SHEETS = 255

    def __init__(self):
        self._sheets: Dict[str, SheetMeta] = {}
        self._sheets_by_id: Dict[int, SheetMeta] = {}
        self._textures: Dict[str, int] = {}  # static textures (setSprite names)
        self._texture_images: Dict[str, Optional[str]] = {}
        self._next_sheet_id = 1

    # -- spritesheets --
    def register_spritesheet(
        self,
        name: str,
        animations: Sequence[Tuple[str, int]],
        image: Optional[str] = None,
    ) -> SheetMeta:
        """Register a sheet with its ordered (animation, frame_count) list.
        Registration order defines animation indices."""
        if name in self._sheets:
            return self._sheets[name]
        if self._next_sheet_id > self.MAX_SHEETS:
            raise RuntimeError(f"more than {self.MAX_SHEETS} spritesheets")
        meta = SheetMeta(
            name=name,
            sheet_id=self._next_sheet_id,
            animations=[a for a, _ in animations],
            frame_counts=[int(f) for _, f in animations],
            image=image,
        )
        self._next_sheet_id += 1
        self._sheets[name] = meta
        self._sheets_by_id[meta.sheet_id] = meta
        return meta

    def sheet(self, name: str) -> SheetMeta:
        if name not in self._sheets:
            hint = difflib.get_close_matches(name, list(self._sheets), n=1)
            extra = f" — did you mean {hint[0]!r}?" if hint else ""
            raise KeyError(f"unknown spritesheet {name!r}{extra}")
        return self._sheets[name]

    def sheet_by_id(self, sheet_id: int) -> SheetMeta:
        return self._sheets_by_id[sheet_id]

    def sheet_id(self, name: str) -> int:
        return self.sheet(name).sheet_id

    def animation_index(self, sheet_name: str, anim: str) -> int:
        """getAnimationIndex (:88-133) with typo suggestions (:294-327)."""
        return self.sheet(sheet_name).animation_index(anim)

    # -- static textures (setSprite / particle textures) --
    def register_texture(self, name: str, image: Optional[str] = None) -> int:
        if name not in self._textures:
            self._textures[name] = len(self._textures) + 1  # 0 = none
            self._texture_images[name] = image
        return self._textures[name]

    def texture_id(self, name: str) -> int:
        if name not in self._textures:
            hint = difflib.get_close_matches(name, list(self._textures), n=1)
            extra = f" — did you mean {hint[0]!r}?" if hint else ""
            raise KeyError(f"unknown texture {name!r}{extra}")
        return self._textures[name]

    @property
    def textures(self) -> Dict[str, int]:
        return dict(self._textures)

    # -- worker serialize/deserialize (:222-274) --
    def serialize(self) -> dict:
        return {
            "sheets": [
                {
                    "name": m.name,
                    "sheet_id": m.sheet_id,
                    "animations": list(m.animations),
                    "frame_counts": list(m.frame_counts),
                    "image": m.image,
                }
                for m in self._sheets.values()
            ],
            "textures": dict(self._textures),
            "texture_images": dict(self._texture_images),
        }

    @classmethod
    def deserialize(cls, data: dict) -> "SpriteRegistry":
        reg = cls()
        for m in data["sheets"]:
            meta = SheetMeta(
                name=m["name"], sheet_id=m["sheet_id"],
                animations=list(m["animations"]),
                frame_counts=list(m["frame_counts"]), image=m.get("image"),
            )
            reg._sheets[meta.name] = meta
            reg._sheets_by_id[meta.sheet_id] = meta
            reg._next_sheet_id = max(reg._next_sheet_id, meta.sheet_id + 1)
        reg._textures = dict(data["textures"])
        reg._texture_images = dict(data.get("texture_images", {}))
        return reg


# The LPC character-sheet animation set used by the predators demo's civil1-7
# sheets (demos/predators/img/civil*.json "animations" metadata). All seven
# sheets share this order, so animation indices are interchangeable across
# them — which is what lets one [state, direction] int table drive every prey.
LPC_ANIMATIONS: List[Tuple[str, int]] = [
    ("spellcast_up", 7), ("spellcast_left", 7), ("spellcast_down", 7), ("spellcast_right", 7),
    ("thrust_up", 8), ("thrust_left", 8), ("thrust_down", 8), ("thrust_right", 8),
    ("walk_up", 9), ("walk_left", 9), ("walk_down", 9), ("walk_right", 9),
    ("slash_up", 6), ("slash_left", 6), ("slash_down", 6), ("slash_right", 6),
    ("shoot_up", 13), ("shoot_left", 13), ("shoot_down", 13), ("shoot_right", 13),
    ("hurt", 6), ("climb", 6),
    ("idle_up", 2), ("idle_left", 2), ("idle_down", 2), ("idle_right", 2),
    ("jump_up", 5), ("jump_left", 5), ("jump_down", 5), ("jump_right", 5),
    ("sit_up", 3), ("sit_left", 3), ("sit_down", 3), ("sit_right", 3),
    ("emote_up", 3), ("emote_left", 3), ("emote_down", 3), ("emote_right", 3),
    ("run_up", 8), ("run_left", 8), ("run_down", 8), ("run_right", 8),
    ("combat_up", 2), ("combat_left", 2), ("combat_down", 2), ("combat_right", 2),
    ("1h_slash_up", 13), ("1h_slash_left", 13), ("1h_slash_down", 13), ("1h_slash_right", 13),
    ("1h_halfslash_up", 6), ("1h_halfslash_left", 6), ("1h_halfslash_down", 6), ("1h_halfslash_right", 6),
]
