"""Golden-trajectory tests: TPU physics kernel vs the sequential numpy oracle
(tests/golden_ref.py). Exact agreement for collision-free motion, boundary
bounces and isolated pairs; tolerance bands for multi-contact stacks
(SURVEY.md §7.2 — Jacobi vs the reference's Gauss–Seidel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multithreadedgameengine_tpu import make_config, make_world
from multithreadedgameengine_tpu.ops.physics import physics_step
from multithreadedgameengine_tpu.ops.spatial import neighbor_lists_bruteforce

from golden_ref import GoldenState, brute_neighbors, golden_step


def world_from_golden(s: GoldenState, cfg):
    n = len(s.x)
    w = make_world(n, max_collision_pairs=cfg.physics.max_collision_pairs)
    w = w.replace(
        transform=w.transform.replace(
            active=jnp.asarray(s.active),
            x=jnp.asarray(s.x, jnp.float32),
            y=jnp.asarray(s.y, jnp.float32),
        ),
        rigid_body=w.rigid_body.replace(
            active=jnp.asarray(s.rb_active),
            static=jnp.asarray(s.static),
            px=jnp.asarray(s.px, jnp.float32),
            py=jnp.asarray(s.py, jnp.float32),
            vx=jnp.asarray(s.vx, jnp.float32),
            vy=jnp.asarray(s.vy, jnp.float32),
            ax=jnp.asarray(s.ax, jnp.float32),
            ay=jnp.asarray(s.ay, jnp.float32),
            max_vel=jnp.asarray(s.max_vel, jnp.float32),
        ),
        collider=w.collider.replace(
            active=jnp.asarray(s.collider_active),
            radius=jnp.asarray(s.radius, jnp.float32),
            is_trigger=jnp.asarray(s.is_trigger),
            visual_range=jnp.full((n,), 1000.0, jnp.float32),
        ),
    )
    return w


def run_kernel(s: GoldenState, cfg, steps=1):
    w = world_from_golden(s, cfg)

    @jax.jit
    def one(w):
        t, c = w.transform, w.collider
        nbr = neighbor_lists_bruteforce(t.x, t.y, t.active, c.visual_range, cfg)
        w = physics_step(w, nbr, cfg, cfg.dt_ratio)
        return w.replace(step_count=w.step_count + 1)

    for _ in range(steps):
        w = one(w)
    return jax.device_get(w)


def run_golden(s: GoldenState, cfg, steps=1):
    vr = np.full(len(s.x), 1000.0)
    for _ in range(steps):
        nbrs = brute_neighbors(s, vr)
        s = golden_step(
            s, nbrs,
            world_w=cfg.world_width, world_h=cfg.world_height,
            gravity=cfg.physics.gravity,
            damping=cfg.physics.verlet_damping,
            sub_steps=cfg.physics.sub_step_count,
            boundary_elasticity=cfg.physics.boundary_elasticity,
            response_strength=cfg.physics.collision_response_strength,
            min_speed_for_rotation=cfg.physics.min_speed_for_rotation,
            dt_ratio=cfg.dt_ratio,
        )
    return s


def base_cfg(**phys):
    d = dict(gravity=(0.0, 0.5), sub_step_count=2, boundary_elasticity=0.3,
             collision_response_strength=0.8, verlet_damping=0.99)
    d.update(phys)
    return make_config(
        world_width=1000.0, world_height=800.0,
        # K must exceed the densest test scene's neighbor count — the golden
        # oracle has no cap, so a truncated list would silently drop pairs
        spatial=dict(max_neighbors=32, method="bruteforce"),
        physics=d,
    )


class TestFreeMotion:
    def test_free_fall_matches_golden(self):
        cfg = base_cfg()
        s = GoldenState.of(3, x=[100.0, 200.0, 300.0], y=[100.0, 150.0, 90.0],
                           px=[99.0, 200.5, 300.0], py=[100.0, 150.0, 88.0],
                           radius=[5.0, 5.0, 5.0])
        w = run_kernel(s, cfg, steps=10)
        g = run_golden(s, cfg, steps=10)
        np.testing.assert_allclose(w.transform.x, g.x, atol=1e-2)
        np.testing.assert_allclose(w.transform.y, g.y, atol=1e-2)
        np.testing.assert_allclose(w.rigid_body.vx, g.vx, atol=1e-2)
        np.testing.assert_allclose(w.rigid_body.vy, g.vy, atol=1e-2)

    def test_acceleration_applied_and_cleared(self):
        cfg = base_cfg(gravity=(0.0, 0.0))
        s = GoldenState.of(1, x=[500.0], y=[400.0], px=[500.0], py=[400.0],
                           ax=[2.0], ay=[-1.0], radius=[5.0])
        w = run_kernel(s, cfg)
        g = run_golden(s, cfg)
        np.testing.assert_allclose(w.transform.x, g.x, atol=1e-4)
        np.testing.assert_allclose(w.transform.y, g.y, atol=1e-4)
        assert w.rigid_body.ax[0] == 0.0 and w.rigid_body.ay[0] == 0.0

    def test_max_vel_clamp(self):
        cfg = base_cfg(gravity=(0.0, 0.0))
        # huge implicit velocity, per-axis clamp to max_vel (default cap 100)
        s = GoldenState.of(2, x=[500.0, 600.0], y=[400.0, 100.0],
                           px=[200.0, 600.0], py=[400.0, 300.0],
                           max_vel=[10.0, 0.0], radius=[1.0, 1.0])
        w = run_kernel(s, cfg)
        g = run_golden(s, cfg)
        np.testing.assert_allclose(w.transform.x, g.x, atol=1e-3)
        np.testing.assert_allclose(w.transform.y, g.y, atol=1e-3)
        assert abs(w.rigid_body.vx[0]) <= 10.0 + 1e-6

    def test_static_and_inactive_do_not_move(self):
        cfg = base_cfg()
        s = GoldenState.of(2, x=[100.0, 200.0], y=[100.0, 100.0],
                           px=[90.0, 190.0], py=[90.0, 90.0],
                           static=[True, False], active=[True, False],
                           radius=[5.0, 5.0])
        w = run_kernel(s, cfg, steps=3)
        assert w.transform.x[0] == 100.0 and w.transform.y[0] == 100.0
        assert w.transform.x[1] == 200.0 and w.transform.y[1] == 100.0


class TestBoundary:
    def test_boundary_bounce_matches_golden(self):
        cfg = base_cfg(boundary_elasticity=0.8, gravity=(0.0, 0.0))
        # heading out of every wall
        s = GoldenState.of(
            4,
            x=[6.0, 994.0, 500.0, 500.0], y=[400.0, 400.0, 6.0, 794.0],
            px=[12.0, 988.0, 500.0, 500.0], py=[400.0, 400.0, 12.0, 788.0],
            radius=[5.0, 5.0, 5.0, 5.0],
        )
        w = run_kernel(s, cfg, steps=4)
        g = run_golden(s, cfg, steps=4)
        np.testing.assert_allclose(w.transform.x, g.x, atol=1e-3)
        np.testing.assert_allclose(w.transform.y, g.y, atol=1e-3)
        np.testing.assert_allclose(w.rigid_body.px, g.px, atol=1e-3)

    def test_positions_stay_in_bounds(self):
        cfg = base_cfg(gravity=(0.0, 2.0))
        rng = np.random.default_rng(0)
        n = 50
        s = GoldenState.of(
            n,
            x=rng.uniform(10, 990, n), y=rng.uniform(10, 790, n),
            px=rng.uniform(10, 990, n), py=rng.uniform(10, 790, n),
            radius=np.full(n, 8.0),
        )
        w = run_kernel(s, cfg, steps=30)
        # NOTE: within a substep the order is boundary-then-collisions
        # (applyConstraintsVerlet, physics_worker.js:344-395), so the final
        # collision pass can leave a sub-radius penetration past the wall —
        # identical to the reference; allow a 1-unit band.
        assert np.all(w.transform.x >= 8.0 - 1.0)
        assert np.all(w.transform.x <= 1000.0 - 8.0 + 1.0)
        assert np.all(w.transform.y >= 8.0 - 1.0)
        assert np.all(w.transform.y <= 800.0 - 8.0 + 1.0)


class TestCollisions:
    def test_isolated_pair_matches_golden_exactly(self):
        """Single overlapping pair: Jacobi == Gauss–Seidel."""
        cfg = base_cfg(gravity=(0.0, 0.0), sub_step_count=1)
        s = GoldenState.of(2, x=[500.0, 508.0], y=[400.0, 400.0],
                           px=[500.0, 508.0], py=[400.0, 400.0],
                           radius=[6.0, 6.0])
        w = run_kernel(s, cfg)
        g = run_golden(s, cfg)
        np.testing.assert_allclose(w.transform.x, g.x, atol=1e-4)
        np.testing.assert_allclose(w.transform.y, g.y, atol=1e-4)
        assert list(w.rigid_body.collision_count) == list(g.collision_count)

    def test_pair_vs_static_full_push(self):
        cfg = base_cfg(gravity=(0.0, 0.0), sub_step_count=1)
        s = GoldenState.of(2, x=[500.0, 508.0], y=[400.0, 400.0],
                           px=[500.0, 508.0], py=[400.0, 400.0],
                           radius=[6.0, 6.0], static=[True, False])
        w = run_kernel(s, cfg)
        g = run_golden(s, cfg)
        assert w.transform.x[0] == 500.0  # static unmoved
        np.testing.assert_allclose(w.transform.x, g.x, atol=1e-4)

    def test_trigger_detected_but_no_response(self):
        cfg = base_cfg(gravity=(0.0, 0.0), sub_step_count=1)
        s = GoldenState.of(2, x=[500.0, 508.0], y=[400.0, 400.0],
                           px=[500.0, 508.0], py=[400.0, 400.0],
                           radius=[6.0, 6.0], is_trigger=[True, False])
        w = run_kernel(s, cfg)
        assert w.transform.x[0] == 500.0 and w.transform.x[1] == 508.0
        assert w.rigid_body.collision_count[0] == 1
        assert w.rigid_body.collision_count[1] == 1

    def test_exact_overlap_separates(self):
        cfg = base_cfg(gravity=(0.0, 0.0), sub_step_count=1)
        s = GoldenState.of(2, x=[500.0, 500.0], y=[400.0, 400.0],
                           px=[500.0, 500.0], py=[400.0, 400.0],
                           radius=[6.0, 6.0])
        # coincident entities are not each other's neighbors (d²>0 filter) —
        # the spatial pass drops them, matching spatial_worker.js:257; they
        # separate only once gravity/forces move them apart. Verify at a
        # just-barely-offset position that the jitterless path engages.
        s2 = GoldenState.of(2, x=[500.0, 500.0001], y=[400.0, 400.0],
                            px=[500.0, 500.0001], py=[400.0, 400.0],
                            radius=[6.0, 6.0])
        w = run_kernel(s2, cfg)
        assert w.transform.x[1] - w.transform.x[0] > 0.0002

    def test_stack_converges_with_tolerance(self):
        """Multi-contact settling pile: Jacobi vs GS reach the same coarse
        configuration (SURVEY.md §7.2 — exact bit-match is not expected for
        multi-contact; compare tolerance bands + invariants)."""
        cfg = base_cfg(gravity=(0.0, 0.5), sub_step_count=4,
                       collision_response_strength=0.5)
        rng = np.random.default_rng(42)
        n = 24
        # non-overlapping initial lattice just above the floor; settles gently
        # (a violent drop is chaotic — Jacobi and GS then diverge into
        # different-but-equally-valid configurations, not a useful oracle)
        gx, gy = np.meshgrid(np.arange(6), np.arange(4))
        x0 = 460.0 + gx.ravel() * 22.0 + rng.uniform(-1, 1, n)
        y0 = 700.0 + gy.ravel() * 22.0
        s = GoldenState.of(
            n, x=x0, y=y0, radius=np.full(n, 10.0), max_vel=np.full(n, 50.0),
        )
        s.px[:] = s.x
        s.py[:] = s.y
        w = run_kernel(s, cfg, steps=40)
        g = run_golden(s, cfg, steps=40)
        assert np.all(np.isfinite(w.transform.x))
        # both settle toward the floor with matching coarse statistics
        assert abs(np.mean(w.transform.y) - np.mean(g.y)) < 10.0
        assert abs(np.mean(w.transform.x) - np.mean(g.x)) < 10.0
        assert np.all(w.transform.y > 650.0)  # fell to the floor region
        # resting penetration is bounded (exactly-coincident pairs would have
        # d == 0: both engines drop them from neighbor lists via the d² > 0
        # acceptance filter, spatial_worker.js:257 — the gentle setup avoids
        # manufacturing them)
        x, y, r = w.transform.x, w.transform.y, 10.0
        d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
        np.fill_diagonal(d, 1e9)
        assert np.min(d) > 2 * r * 0.5  # no deep interpenetration


class TestDerived:
    def test_speed_and_angle(self):
        cfg = base_cfg(gravity=(0.0, 0.0))
        s = GoldenState.of(2, x=[500.0, 300.0], y=[400.0, 300.0],
                           px=[497.0, 300.0], py=[396.0, 300.0],
                           radius=[2.0, 2.0])
        w = run_kernel(s, cfg)
        g = run_golden(s, cfg)
        np.testing.assert_allclose(w.rigid_body.speed, g.speed, atol=1e-3)
        np.testing.assert_allclose(
            w.rigid_body.velocity_angle, g.velocity_angle, atol=1e-3
        )
        # below min_speed_for_rotation the angle is left untouched
        assert w.rigid_body.velocity_angle[1] == 0.0


class TestPairRecording:
    def test_collision_pairs_recorded_via_engine(self):
        """Pair recording happens in the engine step from the spatial
        payload (frame-start positions — the one-frame-stale pair set the
        reference's logic workers consume)."""
        from multithreadedgameengine_tpu import Collider, Engine, EntityClass, RigidBody

        class Blob(EntityClass):
            components = [RigidBody, Collider]
            uses_neighbors = False

            @classmethod
            def setup(cls, ctx):
                return {"collider.radius": 6.0, "collider.visual_range": 50.0}

        eng = Engine(make_config(
            world_width=1000.0, world_height=800.0,
            physics=dict(gravity=(0.0, 0.0), sub_step_count=1,
                         collision_response_strength=0.0,
                         max_collision_pairs=8),
            logic=dict(collision_events=True),
        ))
        eng.register_entity_class(Blob, 4)
        a = None
        eng.init()
        a = eng.spawn("Blob", x=100.0, y=100.0)
        b = eng.spawn("Blob", x=105.0, y=100.0)
        eng.spawn("Blob", x=300.0, y=300.0)
        eng.spawn("Blob", x=700.0, y=700.0)
        eng.step(2)  # second frame records pairs from settled positions
        w = eng.snapshot()
        assert int(w.collision_pair_count) >= 1
        pairs = {tuple(p) for p in np.asarray(w.collision_pairs) if p[0] >= 0}
        assert (min(a, b), max(a, b)) in pairs
