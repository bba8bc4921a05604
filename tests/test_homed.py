"""Position-homed spatial sharding (parallel/homed.py) vs the single-device
step: bit-exact trajectories with movers-only migration (round 4 — the
index-homed step routed EVERY entity every frame; here steady-state routed
rows scale with boundary-crossers)."""

import jax
import numpy as np

from multithreadedgameengine_tpu import Engine, make_config
from multithreadedgameengine_tpu.models.balls import make_balls_engine
from multithreadedgameengine_tpu.models.boids import Boid
from multithreadedgameengine_tpu.parallel import make_homed_step, make_mesh

D = 8


def _boids_engine(n_total=256):
    eng = Engine(make_config(
        world_width=2000.0, world_height=1600.0, seed=7,
        spatial=dict(cell_size=100.0, max_neighbors=64, cell_capacity=32),
        physics=dict(sub_step_count=2, gravity=(0.0, 0.0)),
    ))
    eng.register_entity_class(Boid, n_total - 1)
    eng.init()
    rng = np.random.default_rng(3)
    m = n_total - 1
    eng.spawn_batch(
        "Boid", m,
        x=rng.uniform(50, 1950, m).astype(np.float32),
        y=rng.uniform(50, 1550, m).astype(np.float32),
        vx=rng.uniform(-3, 3, m).astype(np.float32),
        vy=rng.uniform(-3, 3, m).astype(np.float32),
    )
    eng._flush_pending()
    return eng


def _run_single(eng, steps):
    for _ in range(steps):
        eng.step(1)
    eng.sync()
    return eng.snapshot()


def _run_homed(eng, steps, headroom=8.0, adjacent_frac=1.0):
    mesh = make_mesh(D, axis_name="slab")
    step, place, unplace = make_homed_step(
        eng, mesh, headroom=headroom, adjacent_frac=adjacent_frac)
    world, gid = place(eng.world)
    ins = eng.input.snapshot()
    metrics = None
    for _ in range(steps):
        world, gid, metrics = step(world, gid, ins)
    jax.device_get(world.step_count)
    return unplace(world, gid), metrics


def _assert_exact(s1, s2):
    pairs = [
        ("x", s1.transform.x, s2.transform.x),
        ("y", s1.transform.y, s2.transform.y),
        ("vx", s1.rigid_body.vx, s2.rigid_body.vx),
        ("vy", s1.rigid_body.vy, s2.rigid_body.vy),
        ("px", s1.rigid_body.px, s2.rigid_body.px),
        ("collision_count", s1.rigid_body.collision_count,
         s2.rigid_body.collision_count),
        ("active", s1.transform.active, s2.transform.active),
        ("animation_frame", s1.sprite.animation_frame, s2.sprite.animation_frame),
        ("speed", s1.rigid_body.speed, s2.rigid_body.speed),
        ("is_on_screen", s1.sprite.is_on_screen, s2.sprite.is_on_screen),
    ]
    for name, a, b in pairs:
        a, b = np.asarray(a), np.asarray(b)
        assert (a == b).all(), (
            f"{name} diverged: max |diff| = "
            f"{np.abs(a.astype(np.float64) - b.astype(np.float64)).max()}"
        )


class TestBoidsParity:
    def test_trajectory_bit_exact_20_steps(self):
        s1 = _run_single(_boids_engine(), 20)
        # adjacent_frac=1.0 (default): exchange capacity can never bind,
        # so clustering flocks stay exact
        s2, metrics = _run_homed(_boids_engine(), 20)
        _assert_exact(s1, s2)
        assert int(metrics["home_violators"]) == 0
        assert int(metrics["route_overflow_solver"]) == 0
        assert int(metrics["active_count"]) == 256
        assert int(metrics["n_binned"]) == 256

    def test_migration_is_movers_only(self):
        """The defining property: per-frame routed rows scale with
        boundary-crossers, a small fraction of N (the index-homed step
        routes ~N rows twice per frame)."""
        eng = _boids_engine()
        mesh = make_mesh(D, axis_name="slab")
        step, place, unplace = make_homed_step(eng, mesh, headroom=8.0)
        world, gid = place(eng.world)
        ins = eng.input.snapshot()
        moved = []
        for _ in range(10):
            world, gid, metrics = step(world, gid, ins)
            moved.append(int(metrics["migrated_rows"]))
        # boids drift a few px/frame across 200px bands: a few % migrate
        assert max(moved[2:]) < 256 // 4
        assert int(metrics["active_count"]) == 256


class TestBallsParity:
    def test_gravity_piles_bit_exact(self):
        """Balls under gravity (no neighbor ticks): piles stress migration
        volume and chunk imbalance — headroom=D means capacity can never
        bind, so trajectories stay exact."""
        def build():
            eng = make_balls_engine(
                n_balls=255, spawn=True, seed=99,
                world_width=1600.0, world_height=1000.0,
                spatial=dict(cell_size=50.0, max_neighbors=32),
            )
            eng._flush_pending()
            return eng

        s1 = _run_single(build(), 30)
        s2, metrics = _run_homed(build(), 30, headroom=float(D))
        _assert_exact(s1, s2)
        assert int(metrics["route_overflow_solver"]) == 0
        assert int(metrics["home_violators"]) == 0


class TestValidation:
    def test_event_scene_builds(self):
        """v2 (round 5): collision-event scenes build under homed — the
        per-slab pair recording + replicated diff (see test_homed_mixed.py
        for bit-exact parity)."""
        eng = _boids_engine()
        import dataclasses

        eng.config = dataclasses.replace(
            eng.config,
            logic=dataclasses.replace(eng.config.logic, collision_events=True),
        )
        step, place, unplace = make_homed_step(
            eng, make_mesh(D, axis_name="slab"))
        assert callable(step)

    def test_non_grid_spatial_raises(self):
        import pytest
        import dataclasses

        eng = _boids_engine()
        eng.config = dataclasses.replace(
            eng.config,
            spatial=dataclasses.replace(eng.config.spatial, method="none"),
        )
        with pytest.raises(ValueError, match="grid"):
            make_homed_step(eng, make_mesh(D, axis_name="slab"))


class _Runner:
    """Tick class that drifts right and despawns past x=900 (exercises
    device-side despawns + migration interplay)."""


def _make_runner():
    from multithreadedgameengine_tpu import EntityClass
    from multithreadedgameengine_tpu.components import (
        Collider, RigidBody, SpriteRenderer,
    )
    import jax.numpy as jnp

    class Runner(EntityClass):
        components = [RigidBody, Collider, SpriteRenderer]
        uses_neighbors = False

        @classmethod
        def setup(cls, ctx):
            return {"collider.radius": 5.0, "collider.visual_range": 40.0,
                    "rigid_body.max_vel": 80.0}

        @staticmethod
        def tick(ctx):
            return {
                "rigid_body.ay": jnp.where(ctx.y < 1500.0, 3.0, 0.0),
                "despawn": ctx.y > 1400.0,
            }

    return Runner


class TestDespawnAndPallasUnderHomed:
    def _build(self, solver="grid"):
        Runner = _make_runner()
        eng = Engine(make_config(
            world_width=800.0, world_height=1600.0, seed=5,
            spatial=dict(cell_size=100.0, max_neighbors=16),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.0), solver=solver),
        ))
        eng.register_entity_class(Runner, 63)
        eng.init()
        rng = np.random.default_rng(11)
        eng.spawn_batch(
            "Runner", 63,
            x=rng.uniform(50, 750, 63).astype(np.float32),
            y=rng.uniform(50, 400, 63).astype(np.float32),
        )
        eng._flush_pending()
        return eng

    def test_tick_despawn_matches_single_device(self):
        """Entities accelerate downward, cross bands (migrating), then
        despawn device-side — trajectories and final active sets match the
        single-device step exactly."""
        s1 = _run_single(self._build(), 40)
        s2, metrics = _run_homed(self._build(), 40)
        _assert_exact(s1, s2)
        a1 = np.asarray(s1.transform.active)
        assert a1.sum() < 63  # some despawned
        assert int(metrics["home_violators"]) == 0

    def test_pallas_solver_runs_under_homed(self):
        import dataclasses

        eng = self._build()
        eng.config = dataclasses.replace(
            eng.config,
            physics=dataclasses.replace(
                eng.config.physics, solver="pallas", solver_predicated="on",
            ),
        )
        s2, metrics = _run_homed(eng, 10)
        assert np.isfinite(np.asarray(s2.transform.y)).all()
        assert int(metrics["active_count"]) > 0


class TestMigrationConservation:
    def test_extreme_pile_never_loses_entities(self):
        """Round-4 review: the migration grant must count ALL occupied rows
        (including denied movers) against chunk capacity — an extreme pile
        with tight headroom bounces movers as violators but NEVER drops an
        entity from the simulation."""
        from multithreadedgameengine_tpu.models.balls import make_balls_engine

        eng = make_balls_engine(
            n_balls=255, spawn=True, seed=13,
            world_width=1600.0, world_height=1000.0,
            spatial=dict(cell_size=50.0, max_neighbors=32),
            physics=dict(
                sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
                boundary_elasticity=0.0, collision_response_strength=0.8,
                gravity=(0.0, 2.0),  # hard pile into the bottom band
            ),
        )
        eng._flush_pending()
        mesh = make_mesh(D, axis_name="slab")
        # headroom 1.6: fits the uniform initial placement, but the pile
        # fills the bottom chunks and movers get denied
        step, place, unplace = make_homed_step(eng, mesh, headroom=1.6)
        world, gid = place(eng.world)
        ins = eng.input.snapshot()
        saw_violators = 0
        for _ in range(40):
            world, gid, metrics = step(world, gid, ins)
            assert int(jax.device_get(metrics["active_count"])) == 256
            saw_violators = max(
                saw_violators, int(jax.device_get(metrics["home_violators"]))
            )
        snap = unplace(world, gid)
        assert int(np.asarray(snap.transform.active).sum()) == 256
        # the pile genuinely stressed capacity (otherwise this test is vacuous)
        assert saw_violators > 0
