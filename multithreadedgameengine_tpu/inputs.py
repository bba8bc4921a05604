"""Host→device input plane: mouse, keyboard, camera.

Replaces the reference's inputData / cameraData SABs and the Mouse-as-entity-0
convention (gameEngine.js:212-267 keyboard map → Int32 input buffer;
src/core/Mouse.js:30-104 mouse statics writing Transform[0]/MouseComponent[0];
cameraData 3 floats gameEngine.js:724-738). The whole input state is one small
pytree passed into the jitted step each frame.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np
from flax import struct

# Keyboard map — the reference builds ~73 key → index entries
# (gameEngine.js:212-267). Index space kept stable for SAB-format parity.
_KEY_NAMES = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
    + [
        "space", "enter", "escape", "tab", "backspace", "delete",
        "shift", "control", "alt", "meta",
        "arrowup", "arrowdown", "arrowleft", "arrowright",
        "home", "end", "pageup", "pagedown", "insert", "capslock",
    ]
    + [f"f{i}" for i in range(1, 13)]
    + ["minus", "equal", "bracketleft", "bracketright", "backslash",
       "semicolon", "quote", "comma", "period", "slash", "backquote"]
)
KEY_INDEX: Dict[str, int] = {name: i for i, name in enumerate(_KEY_NAMES)}
NUM_KEYS = 128  # padded, matches the reference's generously sized input SAB

# Aliases accepted by Keyboard proxy access (Keyboard.js:218-248)
KEY_ALIASES = {
    "up": "arrowup", "down": "arrowdown", "left": "arrowleft",
    "right": "arrowright", "ctrl": "control", "esc": "escape",
    " ": "space",
}


@struct.dataclass
class InputState:
    """Per-frame input snapshot (device pytree)."""

    mouse_x: jnp.ndarray  # f32 scalar, world coords
    mouse_y: jnp.ndarray
    mouse_buttons: jnp.ndarray  # bool[3]
    mouse_present: jnp.ndarray  # bool scalar
    keys: jnp.ndarray  # bool[NUM_KEYS]
    camera_x: jnp.ndarray  # f32 scalar
    camera_y: jnp.ndarray
    camera_zoom: jnp.ndarray

    @staticmethod
    def default() -> "InputState":
        return InputState(
            mouse_x=jnp.float32(0.0),
            mouse_y=jnp.float32(0.0),
            mouse_buttons=jnp.zeros((3,), jnp.bool_),
            mouse_present=jnp.asarray(False),
            keys=jnp.zeros((NUM_KEYS,), jnp.bool_),
            camera_x=jnp.float32(0.0),
            camera_y=jnp.float32(0.0),
            camera_zoom=jnp.float32(1.0),
        )


class InputController:
    """Host-side mutable input front-end; ``snapshot()`` produces the pytree
    handed to the step. The analog of the main thread's event listeners
    (gameEngine.js:1384-1500)."""

    def __init__(self):
        self.mouse_x = 0.0
        self.mouse_y = 0.0
        self.mouse_buttons = [False, False, False]
        self.mouse_present = False
        self._keys = np.zeros((NUM_KEYS,), dtype=bool)
        self.camera_x = 0.0
        self.camera_y = 0.0
        self.camera_zoom = 1.0
        self._snapshot_cache: InputState | None = None

    # -- keyboard (Keyboard.isDown, Keyboard.js:197-248) --
    def _key_idx(self, name: str) -> int:
        name = name.lower()
        name = KEY_ALIASES.get(name, name)
        if name not in KEY_INDEX:
            raise KeyError(f"unknown key {name!r}")
        return KEY_INDEX[name]

    def key_down(self, name: str) -> None:
        self._keys[self._key_idx(name)] = True
        self._snapshot_cache = None

    def key_up(self, name: str) -> None:
        self._keys[self._key_idx(name)] = False
        self._snapshot_cache = None

    def is_down(self, name: str) -> bool:
        return bool(self._keys[self._key_idx(name)])

    # -- mouse --
    def set_mouse(self, x: float, y: float, present: bool = True) -> None:
        self.mouse_x, self.mouse_y, self.mouse_present = float(x), float(y), present
        self._snapshot_cache = None

    def mouse_button(self, button: int, down: bool) -> None:
        self.mouse_buttons[button] = bool(down)
        self._snapshot_cache = None

    def set_camera(self, x: float = None, y: float = None, zoom: float = None) -> None:
        if x is not None:
            self.camera_x = float(x)
        if y is not None:
            self.camera_y = float(y)
        if zoom is not None:
            self.camera_zoom = float(zoom)
        self._snapshot_cache = None

    def zoom_at(self, screen_x: float, screen_y: float, factor: float) -> None:
        """Wheel zoom-to-cursor (gameEngine.js:1426-1450): multiply the zoom
        by ``factor`` while keeping the world point under the given SCREEN
        coordinate fixed — the camera recenters toward the cursor."""
        wx = self.camera_x + screen_x / self.camera_zoom
        wy = self.camera_y + screen_y / self.camera_zoom
        self.camera_zoom *= float(factor)
        self.camera_x = wx - screen_x / self.camera_zoom
        self.camera_y = wy - screen_y / self.camera_zoom
        self._snapshot_cache = None

    @property
    def mouse_is_down(self) -> bool:
        return self.mouse_buttons[0]

    def snapshot(self) -> InputState:
        """The per-frame input pytree. Leaves are NUMPY scalars/arrays (jit
        commits them at dispatch — building device arrays here would pay an
        eager-op roundtrip per field per frame, which dominated churn-rate
        host frames), and the snapshot is CACHED until an input mutator
        invalidates it (the typical frame changes nothing).

        Direct attribute writes (``input.camera_x = ...``) are caught by a
        cheap host-side staleness compare, so every mutation path is safe."""
        snap = self._snapshot_cache
        if (
            snap is None
            or float(snap.mouse_x) != self.mouse_x
            or float(snap.mouse_y) != self.mouse_y
            or float(snap.camera_x) != self.camera_x
            or float(snap.camera_y) != self.camera_y
            or float(snap.camera_zoom) != self.camera_zoom
            or bool(snap.mouse_present) != bool(self.mouse_present)
            or not (
                snap.mouse_buttons.tolist() == self.mouse_buttons
                and np.array_equal(snap.keys, self._keys)
            )
        ):
            snap = InputState(
                mouse_x=np.float32(self.mouse_x),
                mouse_y=np.float32(self.mouse_y),
                mouse_buttons=np.asarray(self.mouse_buttons, np.bool_),
                mouse_present=np.bool_(self.mouse_present),
                keys=self._keys.copy(),
                camera_x=np.float32(self.camera_x),
                camera_y=np.float32(self.camera_y),
                camera_zoom=np.float32(self.camera_zoom),
            )
            self._snapshot_cache = snap
        return snap

    def invalidate(self) -> None:
        """Drop the cached snapshot (call after direct attribute writes)."""
        self._snapshot_cache = None


def key_index(name: str) -> int:
    name = name.lower()
    return KEY_INDEX[KEY_ALIASES.get(name, name)]
