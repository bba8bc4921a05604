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
        texture_id = 0
        if texture is not None:
            texture_id = self._engine.sprites.texture_id(texture)
        for _ in range(n):
            px = self._rr(x)
            py = self._rr(y)
            pz = self._rr(z, 0.0)
            if angle_xy is not None and speed is not None:
                # polar mode (ParticleEmitter.js:127-134): degrees, 0=right
                ang = math.radians(self._rr(angle_xy, 0.0))
                spd = self._rr(speed, 0.0)
                pvx, pvy = spd * math.cos(ang), spd * math.sin(ang)
            else:
                pvx, pvy = self._rr(vx, 0.0), self._rr(vy, 0.0)
            color = self._rcolor(tint)
            self._pending.append(dict(
                x=px, y=py, z=pz, vx=pvx, vy=pvy, vz=self._rr(vz, 0.0),
                lifespan=self._rr(lifespan, 1000.0),
                gravity=float(gravity if gravity is not None else 0.15),
                scale=self._rr(scale, 1.0), alpha=self._rr(alpha, 1.0),
                tint=color, texture_id=texture_id,
                fade_on_the_floor=float(fade_on_the_floor or 0.0),
                stay_on_the_floor=bool(stay_on_the_floor),
            ))
        return n

    def clear(self) -> None:
        """Drop queued emissions (engine.destroy)."""
        self._pending.clear()

    def build_batch(self):
        """Drain the queue into a padded field-array batch + real count.
        Returns (batch dict of numpy arrays, n) or (None, 0)."""
        if not self._pending:
            return None, 0
        n = len(self._pending)
        bucket = next((b for b in self.BUCKETS if b >= n), self.BUCKETS[-1])
        if n > bucket:  # beyond the largest bucket: truncate (pool-bounded anyway)
            self._pending = self._pending[:bucket]
            n = bucket
        keys_f32 = ("x", "y", "z", "vx", "vy", "vz", "lifespan", "gravity",
                    "scale", "alpha", "fade_on_the_floor")
        batch: Dict[str, np.ndarray] = {}
        for k in keys_f32:
            arr = np.zeros((bucket,), np.float32)
            arr[:n] = [p[k] for p in self._pending]
            batch[k] = arr
        tintarr = np.zeros((bucket,), np.uint32)
        tintarr[:n] = [p["tint"] for p in self._pending]
        batch["tint"] = tintarr
        tex = np.zeros((bucket,), np.int32)
        tex[:n] = [p["texture_id"] for p in self._pending]
        batch["texture_id"] = tex
        stay = np.zeros((bucket,), bool)
        stay[:n] = [p["stay_on_the_floor"] for p in self._pending]
        batch["stay_on_the_floor"] = stay
        self._pending.clear()
        return batch, n
