"""Host-side particle emission API — the ParticleEmitter static façade
(src/core/ParticleEmitter.js). Game/host code calls
``engine.emitter.emit(...)``; emissions queue and flush into the device pool
between steps (the control plane, like spawns).

Config keys mirror the reference's emit() options (ParticleEmitter.js:29-77),
snake_cased; any numeric field accepts a scalar or a ``{min, max}``
dict / ``(min, max)`` tuple resolved per particle via randomRange
(utils.js:49-56) — drawn from the engine's seeded stream for reproducibility
(the reference draws from Math.random; documented determinism deviation).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import numpy as np


def _as_range(value):
    if isinstance(value, dict):
        return float(value["min"]), float(value["max"])
    if isinstance(value, tuple) and len(value) == 2:
        return float(value[0]), float(value[1])
    return None


class ParticleEmitterAPI:
    # emission batches pad to buckets so the device program compiles once
    # per bucket size
    BUCKETS = (16, 64, 256, 1024, 4096)

    def __init__(self, engine):
        self._engine = engine
        self._pending: List[Dict[str, Any]] = []

    def _rr(self, value, default=0.0) -> float:
        """randomRange (utils.js:49-56)."""
        if value is None:
            return float(default)
        rng_pair = _as_range(value)
        if rng_pair is None:
            return float(value)
        lo, hi = rng_pair
        return lo + self._engine.rng() * (hi - lo)

    def _rcolor(self, value, default=0xFFFFFF) -> int:
        """randomColor (utils.js:65-93): per-channel lerp by one t draw."""
        if value is None:
            return int(default)
        rng_pair = _as_range(value)
        if rng_pair is None:
            return int(value)
        lo, hi = int(rng_pair[0]), int(rng_pair[1])
        t = self._engine.rng()
        out = 0
        for shift in (16, 8, 0):
            a = (lo >> shift) & 0xFF
            b = (hi >> shift) & 0xFF
            out |= round(a + t * (b - a)) << shift
        return out

    def emit(
        self,
        count=1,
        x=0.0,
        y=0.0,
        z=0.0,
        angle_xy=None,
        speed=None,
        vx=0.0,
        vy=0.0,
        vz=0.0,
        lifespan=1000.0,
        gravity=0.15,
        texture: str = None,
        tint=None,
        scale=1.0,
        alpha=1.0,
        fade_on_the_floor=0.0,
        stay_on_the_floor: bool = False,
    ) -> int:
        """ParticleEmitter.emit (ParticleEmitter.js:78-173). Returns the
        number of particles queued (actual spawns are bounded by pool space
        at flush time, like the reference's exhausted scan)."""
        if self._engine.config.particle.max_particles <= 0:
            return 0
        n = int(round(self._rr(count, 1)))
        if n <= 0:
            return 0
        texture_id = 0
        if texture is not None:
            texture_id = self._engine.sprites.texture_id(texture)

        # Vectorized drawing: ONE rng.draw for all particles' range fields,
        # consuming the seeded stream in exactly the per-particle order the
        # scalar loop used — x, y, z, velocity pair, tint, vz, lifespan,
        # scale, alpha (fields given as plain scalars consume no draws).
        # Collision hooks emit per event (predator.js:94-125); the scalar
        # loop's ~70 python rng calls per emit dominated event dispatch.
        polar = angle_xy is not None and speed is not None
        order = [("x", x, 0.0), ("y", y, 0.0), ("z", z, 0.0)]
        order += (
            [("angle_xy", angle_xy, 0.0), ("speed", speed, 0.0)]
            if polar else [("vx", vx, 0.0), ("vy", vy, 0.0)]
        )
        order += [("tint", tint, None), ("vz", vz, 0.0),
                  ("lifespan", lifespan, 1000.0), ("scale", scale, 1.0),
                  ("alpha", alpha, 1.0)]
        self._pending.append(self._draw_cols(
            n, order, polar, gravity, texture_id, fade_on_the_floor,
            stay_on_the_floor,
        ))
        return n

    def emit_batch(
        self,
        x,
        y,
        count=1,
        z=0.0,
        angle_xy=None,
        speed=None,
        vx=0.0,
        vy=0.0,
        vz=0.0,
        lifespan=1000.0,
        gravity=0.15,
        texture: str = None,
        tint=None,
        scale=1.0,
        alpha=1.0,
        fade_on_the_floor=0.0,
        stay_on_the_floor: bool = False,
    ) -> int:
        """Multi-burst emit: one burst at each ``(x[b], y[b])`` with a shared
        field config — the vectorized host analog of B scalar :meth:`emit`
        calls (what a per-pair collision hook like predator.js:94-125 does).
        ``count`` (scalar or range, drawn per burst) sets each burst's size.

        Stream-order note: range fields draw one rng call across ALL bursts'
        particles (burst-major per field), so the seeded stream order differs
        from B scalar emits — batch hooks are a new vectorized surface, not a
        bit-parity path."""
        if self._engine.config.particle.max_particles <= 0:
            return 0
        xb = np.asarray(x, np.float32).ravel()
        yb = np.asarray(y, np.float32).ravel()
        b = int(xb.size)
        if b == 0:
            return 0
        cr = _as_range(count)
        if cr is None:
            counts = np.full((b,), max(0, int(round(float(count)))), np.int64)
        else:
            t = np.asarray(self._engine.rng.draw(b))
            counts = np.maximum(
                0, np.round(cr[0] + t * (cr[1] - cr[0])).astype(np.int64)
            )
        n = int(counts.sum())
        if n <= 0:
            return 0
        texture_id = 0
        if texture is not None:
            texture_id = self._engine.sprites.texture_id(texture)
        polar = angle_xy is not None and speed is not None
        order = [("z", z, 0.0)]
        order += (
            [("angle_xy", angle_xy, 0.0), ("speed", speed, 0.0)]
            if polar else [("vx", vx, 0.0), ("vy", vy, 0.0)]
        )
        order += [("tint", tint, None), ("vz", vz, 0.0),
                  ("lifespan", lifespan, 1000.0), ("scale", scale, 1.0),
                  ("alpha", alpha, 1.0)]
        cols = self._draw_cols(
            n, order, polar, gravity, texture_id, fade_on_the_floor,
            stay_on_the_floor,
        )
        cols["x"] = np.repeat(xb, counts)
        cols["y"] = np.repeat(yb, counts)
        self._pending.append(cols)
        return n

    def _draw_cols(
        self, n, order, polar, gravity, texture_id, fade_on_the_floor,
        stay_on_the_floor,
    ) -> Dict[str, np.ndarray]:
        """Shared column builder: resolve each (key, value, default) in
        ``order`` to an [n] array, drawing ranges from the seeded stream in
        field order (one draw batch for all range fields)."""
        consumers = [
            (key, _as_range(val)) for key, val, _d in order
            if val is not None and _as_range(val) is not None
        ]
        if consumers:
            draws = self._engine.rng.draw(n * len(consumers)).reshape(
                n, len(consumers)
            )
        cols: Dict[str, np.ndarray] = {}
        ci = 0
        for key, val, default in order:
            rng_pair = _as_range(val) if val is not None else None
            if rng_pair is None:
                if key == "tint":
                    cols[key] = np.full(
                        (n,),
                        0xFFFFFF if val is None else int(val), np.uint32,
                    )
                else:
                    cols[key] = np.full(
                        (n,), float(default if val is None else val),
                        np.float32,
                    )
                continue
            t = draws[:, ci]
            ci += 1
            lo, hi = rng_pair
            if key == "tint":
                # randomColor (utils.js:65-93): per-channel lerp by one t
                ilo, ihi = int(lo), int(hi)
                out = np.zeros((n,), np.uint32)
                for shift in (16, 8, 0):
                    a = (ilo >> shift) & 0xFF
                    b = (ihi >> shift) & 0xFF
                    out |= np.round(a + t * (b - a)).astype(np.uint32) << shift
                cols[key] = out
            else:
                cols[key] = (lo + t * (hi - lo)).astype(np.float32)
        if polar:
            ang = np.radians(cols.pop("angle_xy"))
            spd = cols.pop("speed")
            cols["vx"] = (spd * np.cos(ang)).astype(np.float32)
            cols["vy"] = (spd * np.sin(ang)).astype(np.float32)
        cols["gravity"] = np.full(
            (n,), float(gravity if gravity is not None else 0.15), np.float32
        )
        cols["texture_id"] = np.full((n,), texture_id, np.int32)
        cols["fade_on_the_floor"] = np.full(
            (n,), float(fade_on_the_floor or 0.0), np.float32
        )
        cols["stay_on_the_floor"] = np.full((n,), bool(stay_on_the_floor))
        return cols

    def clear(self) -> None:
        """Drop queued emissions (engine.destroy)."""
        self._pending.clear()

    def build_batch(self):
        """Drain the queue (per-emit column blocks) into a padded field-array
        batch + real count. Returns (batch dict of numpy arrays, n) or
        (None, 0)."""
        if not self._pending:
            return None, 0
        n = sum(int(c["x"].shape[0]) for c in self._pending)
        bucket = next((b for b in self.BUCKETS if b >= n), self.BUCKETS[-1])
        n = min(n, bucket)  # beyond the largest bucket: truncate (pool-bounded)
        keys = (
            ("x", np.float32), ("y", np.float32), ("z", np.float32),
            ("vx", np.float32), ("vy", np.float32), ("vz", np.float32),
            ("lifespan", np.float32), ("gravity", np.float32),
            ("scale", np.float32), ("alpha", np.float32),
            ("fade_on_the_floor", np.float32),
            ("tint", np.uint32), ("texture_id", np.int32),
            ("stay_on_the_floor", bool),
        )
        batch: Dict[str, np.ndarray] = {}
        for k, dt in keys:
            arr = np.zeros((bucket,), dt)
            arr[:n] = np.concatenate([c[k] for c in self._pending])[:n]
            batch[k] = arr
        self._pending.clear()
        return batch, n
