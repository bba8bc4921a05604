"""Sequential numpy oracle for the reference's physics semantics.

A from-scratch transliteration of the *math* of physics_worker.js (cited per
function) used as the golden model for trajectory tests (SURVEY.md §4: "golden
trajectory tests against a faithful NumPy port of physics_worker.js:240-316").

It deliberately preserves the reference's sequential Gauss–Seidel pair
processing (positions mutate pair-by-pair within a substep), which is what the
TPU kernel's Jacobi accumulation is measured against:
 - exact agreement: no-collision motion, boundary bounces, isolated pairs;
 - tolerance-band agreement: stacks / multi-contact scenes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


@dataclass
class GoldenState:
    x: np.ndarray
    y: np.ndarray
    px: np.ndarray
    py: np.ndarray
    vx: np.ndarray
    vy: np.ndarray
    ax: np.ndarray
    ay: np.ndarray
    radius: np.ndarray
    max_vel: np.ndarray
    active: np.ndarray  # bool
    rb_active: np.ndarray  # bool
    collider_active: np.ndarray  # bool
    static: np.ndarray  # bool
    is_trigger: np.ndarray  # bool
    speed: np.ndarray = field(default=None)
    velocity_angle: np.ndarray = field(default=None)
    collision_count: np.ndarray = field(default=None)

    def __post_init__(self):
        n = len(self.x)
        if self.speed is None:
            self.speed = np.zeros(n)
        if self.velocity_angle is None:
            self.velocity_angle = np.zeros(n)
        if self.collision_count is None:
            self.collision_count = np.zeros(n, dtype=np.int64)

    @staticmethod
    def of(n, **kw):
        d = dict(
            x=np.zeros(n), y=np.zeros(n), px=np.zeros(n), py=np.zeros(n),
            vx=np.zeros(n), vy=np.zeros(n), ax=np.zeros(n), ay=np.zeros(n),
            radius=np.zeros(n), max_vel=np.zeros(n),
            active=np.ones(n, bool), rb_active=np.ones(n, bool),
            collider_active=np.ones(n, bool), static=np.zeros(n, bool),
            is_trigger=np.zeros(n, bool),
        )
        for k, v in kw.items():
            d[k] = np.asarray(v, dtype=d[k].dtype if k in d else None)
        return GoldenState(**d)


def brute_neighbors(s: GoldenState, visual_range: np.ndarray):
    """All-pairs neighbor lists (ascending j): acceptance 0 < d² < vr²
    (spatial_worker.js:257)."""
    n = len(s.x)
    out = []
    for i in range(n):
        lst = []
        if s.active[i] and np.isfinite(s.x[i]) and np.isfinite(s.y[i]):
            for j in range(n):
                if j == i or not s.active[j]:
                    continue
                if not (np.isfinite(s.x[j]) and np.isfinite(s.y[j])):
                    continue
                d2 = (s.x[j] - s.x[i]) ** 2 + (s.y[j] - s.y[i]) ** 2
                if 0 < d2 < visual_range[i] ** 2:
                    lst.append(j)
        out.append(lst)
    return out


def golden_step(
    s: GoldenState,
    neighbors,
    world_w: float,
    world_h: float,
    gravity=(0.0, 0.0),
    damping: float = 0.995,
    sub_steps: int = 4,
    boundary_elasticity: float = 0.8,
    response_strength: float = 0.5,
    min_speed_for_rotation: float = 0.1,
    dt_ratio: float = 1.0,
) -> GoldenState:
    """One full physics frame (updateVerlet, physics_worker.js:145-233)."""
    n = len(s.x)
    gx, gy = gravity
    s.collision_count[:] = 0

    # --- moveBallsVerlet (:240-316) ---
    gscale = dt_ratio ** 2
    for i in range(n):
        if not (s.active[i] and s.rb_active[i]) or s.static[i]:
            continue
        ox, oy = s.x[i], s.y[i]
        dx = (s.x[i] - s.px[i]) * damping + gscale * gx + s.ax[i] * dt_ratio
        dy = (s.y[i] - s.py[i]) * damping + gscale * gy + s.ay[i] * dt_ratio
        cap = s.max_vel[i] if s.max_vel[i] > 0 else 100.0
        dx = max(-cap, min(cap, dx))
        dy = max(-cap, min(cap, dy))
        s.x[i], s.y[i] = ox + dx, oy + dy
        s.px[i], s.py[i] = ox, oy
        s.vx[i], s.vy[i] = dx / dt_ratio, dy / dt_ratio
        s.ax[i] = s.ay[i] = 0.0

    # --- applyConstraintsVerlet × sub_steps (:203-217, :323-395) ---
    for _ in range(sub_steps):
        # boundary clamp + bounce (:344-376)
        for i in range(n):
            if not (s.active[i] and s.rb_active[i]) or s.static[i]:
                continue
            r = s.radius[i]
            if s.x[i] < r:
                s.x[i] = r
                s.px[i] = s.x[i] + (s.x[i] - s.px[i]) * boundary_elasticity
            if s.x[i] > world_w - r:
                s.x[i] = world_w - r
                s.px[i] = s.x[i] + (s.x[i] - s.px[i]) * boundary_elasticity
            if s.y[i] < r:
                s.y[i] = r
                s.py[i] = s.y[i] + (s.y[i] - s.py[i]) * boundary_elasticity
            if s.y[i] > world_h - r:
                s.y[i] = world_h - r
                s.py[i] = s.y[i] + (s.y[i] - s.py[i]) * boundary_elasticity

        # resolveCollisionsVerlet (:405-568) — Gauss–Seidel, pair-once i<j
        for i in range(n):
            if not (s.active[i] and s.collider_active[i]):
                continue
            for j in neighbors[i]:
                if i >= j or not (s.active[j] and s.collider_active[j]):
                    continue
                dx = s.x[i] - s.x[j]
                dy = s.y[i] - s.y[j]
                d2 = dx * dx + dy * dy
                min_dist = s.radius[i] + s.radius[j]
                if d2 >= min_dist * min_dist:
                    continue
                dist = math.sqrt(d2)
                either_trigger = s.is_trigger[i] or s.is_trigger[j]
                if dist == 0.0:
                    # exact overlap: the kernel uses a pair hash instead of
                    # the reference's rng() angle; golden tests avoid exact
                    # coincidence, so just count.
                    s.collision_count[i] += 1
                    s.collision_count[j] += 1
                    continue
                depth = min_dist - dist
                if depth > 0 and not either_trigger:
                    nx, ny = dx / dist, dy / dist
                    corr = depth * response_strength
                    if s.static[i] and s.static[j]:
                        pass
                    elif s.static[i]:
                        s.x[j] -= nx * corr
                        s.y[j] -= ny * corr
                    elif s.static[j]:
                        s.x[i] += nx * corr
                        s.y[i] += ny * corr
                    else:
                        half = corr * 0.5
                        s.x[i] += nx * half
                        s.y[i] += ny * half
                        s.x[j] -= nx * half
                        s.y[j] -= ny * half
                s.collision_count[i] += 1
                s.collision_count[j] += 1

    # --- updateDerivedProperties (:575-604) ---
    for i in range(n):
        if not (s.active[i] and s.rb_active[i]):
            continue
        sp = math.hypot(s.vx[i], s.vy[i])
        s.speed[i] = sp
        if sp > min_speed_for_rotation:
            s.velocity_angle[i] = math.atan2(s.vy[i], s.vx[i]) + math.pi / 2
    return s
