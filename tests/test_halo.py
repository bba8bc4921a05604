"""Spatial-domain shard_map halo path (parallel/halo.py) vs the single-device
fused step: the multi-chip answer to BASELINE config 5. The bar is BIT-EXACT
trajectory equality — binning, scan order, truncation and accumulation order
are all reproduced per-slab (see module docstring of parallel/halo.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multithreadedgameengine_tpu import Engine, EntityClass, make_config
from multithreadedgameengine_tpu.components import Collider, RigidBody, SpriteRenderer
from multithreadedgameengine_tpu.models.balls import make_balls_engine
from multithreadedgameengine_tpu.models.boids import Boid
from multithreadedgameengine_tpu.parallel import make_halo_step, make_mesh

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


def _run_halo(eng, steps, oversub=4.0):
    mesh = make_mesh(D, axis_name="slab")
    step, place = make_halo_step(eng, mesh, oversub=oversub)
    world = place(eng.world)
    ins = eng.input.snapshot()
    metrics = None
    for _ in range(steps):
        world, metrics = step(world, ins)
    jax.device_get(world.step_count)
    return jax.device_get(world), metrics, world


def _assert_exact(s1, s2):
    pairs = [
        ("x", s1.transform.x, s2.transform.x),
        ("y", s1.transform.y, s2.transform.y),
        ("vx", s1.rigid_body.vx, s2.rigid_body.vx),
        ("vy", s1.rigid_body.vy, s2.rigid_body.vy),
        ("px", s1.rigid_body.px, s2.rigid_body.px),
        ("collision_count", s1.rigid_body.collision_count, s2.rigid_body.collision_count),
        ("active", s1.transform.active, s2.transform.active),
        ("animation_frame", s1.sprite.animation_frame, s2.sprite.animation_frame),
        ("speed", s1.rigid_body.speed, s2.rigid_body.speed),
        ("is_on_screen", s1.sprite.is_on_screen, s2.sprite.is_on_screen),
    ]
    for name, a, b in pairs:
        a, b = np.asarray(a), np.asarray(b)
        assert (a == b).all(), (
            f"{name} diverged: max |diff| = {np.abs(a.astype(np.float64) - b.astype(np.float64)).max()}"
        )


class TestBoidsParity:
    def test_trajectory_bit_exact_20_steps(self):
        """Flocking (neighbor-consuming ticks) + grid solver: the halo path
        must reproduce the single-device trajectory exactly."""
        s1 = _run_single(_boids_engine(), 20)
        s2, metrics, _ = _run_halo(_boids_engine(), 20)
        _assert_exact(s1, s2)
        assert int(metrics["route_overflow_logic"]) == 0
        assert int(metrics["route_overflow_solver"]) == 0
        assert int(metrics["active_count"]) == 256
        assert int(metrics["n_binned"]) == 256

    def test_per_device_buffers_are_one_eighth(self):
        """VERDICT r1 next-1: per-device world shards must actually be 1/D."""
        eng = _boids_engine()
        _, _, world = _run_halo(eng, 1)
        n = eng.world.n_entities if eng.world is not None else 256
        for leaf in (world.transform.x, world.rigid_body.vx,
                     world.sprite.animation_frame,
                     world.custom["flocking"].turn_factor):
            shapes = {s.data.shape for s in leaf.addressable_shards}
            assert shapes == {(256 // D,)}, shapes


class TestBallsParity:
    def test_gravity_piles_bit_exact(self):
        """Balls (no neighbor ticks — the at-home logic path) with gravity:
        piles at the floor stress slab imbalance and the solver halo."""
        def build():
            eng = make_balls_engine(
                n_balls=255, spawn=True, seed=99,
                world_width=1600.0, world_height=1000.0,
                spatial=dict(cell_size=50.0, max_neighbors=32),
            )
            eng._flush_pending()
            return eng

        s1 = _run_single(build(), 30)
        # oversub=D: routing can never overflow, so the pile stays exact
        s2, metrics, _ = _run_halo(build(), 30, oversub=float(D))
        _assert_exact(s1, s2)
        assert int(metrics["route_overflow_solver"]) == 0


class _Fugitive(EntityClass):
    """Tick-despawning class: crosses x=500 → despawns (exercises
    apply_despawn_mask under the masked runner + row transport)."""

    components = [RigidBody, Collider, SpriteRenderer]
    uses_neighbors = False

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 4.0, "rigid_body.max_vel": 50.0}

    @staticmethod
    def tick(ctx):
        return {
            "rigid_body.ax": jnp.float32(1.0),
            "despawn": ctx.x > 500.0,
        }


class TestDespawnUnderHalo:
    def test_tick_despawn_matches_single_device(self):
        def build():
            eng = Engine(make_config(
                world_width=1000.0, world_height=800.0, seed=5,
                spatial=dict(cell_size=50.0, max_neighbors=8),
                physics=dict(sub_step_count=1),
            ))
            eng.register_entity_class(_Fugitive, 63)
            eng.init()
            rng = np.random.default_rng(11)
            eng.spawn_batch(
                "_Fugitive", 63,
                x=rng.uniform(300, 520, 63).astype(np.float32),
                y=rng.uniform(50, 750, 63).astype(np.float32),
            )
            eng._flush_pending()
            return eng

        s1 = _run_single(build(), 12)
        s2, metrics, _ = _run_halo(build(), 12)
        _assert_exact(s1, s2)
        a1 = np.asarray(s1.transform.active)
        assert a1.sum() < 64  # some fugitives actually despawned
        assert int(metrics["active_count"]) == int(a1.sum())


class TestPredatorsStyleParity:
    def test_two_tick_classes_bit_exact(self):
        """Prey + Predator (two masked tick classes, per-instance randomized
        perception, LPC animation writes) under the halo step."""
        from multithreadedgameengine_tpu.models.predators import (
            make_predators_engine,
        )

        def build():
            eng = make_predators_engine(
                n_prey=240, n_predators=8, n_lights=7, spawn=True,
                world_width=3000.0, world_height=1500.0,
                spatial=dict(cell_size=128.0, max_neighbors=96, cell_capacity=32),
                particle=dict(max_particles=0),
                lighting=dict(enabled=False),
            )
            eng._flush_pending()
            return eng

        s1 = _run_single(build(), 10)
        s2, metrics, _ = _run_halo(build(), 10)
        _assert_exact(s1, s2)
        # animation state machine advanced on both paths identically
        assert (np.asarray(s1.sprite.animation_state)
                == np.asarray(s2.sprite.animation_state)).all()


class TestRouteOverflowDegrades:
    def test_overflow_counted_and_finite(self):
        """Cram every boid into one slab with a starved route capacity: the
        overflow metric must fire and the sim must stay finite (boundary-only
        fallback, the documented degradation)."""
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=7,
            spatial=dict(cell_size=100.0, max_neighbors=64, cell_capacity=32),
            physics=dict(sub_step_count=1),
        ))
        eng.register_entity_class(Boid, 255)
        eng.init()
        rng = np.random.default_rng(4)
        eng.spawn_batch(
            "Boid", 255,
            x=rng.uniform(50, 1950, 255).astype(np.float32),
            # all in the BOTTOM slab rows
            y=rng.uniform(1450, 1550, 255).astype(np.float32),
        )
        eng._flush_pending()
        _, metrics, world = _run_halo(eng, 2, oversub=0.5)
        assert int(metrics["route_overflow_logic"]) > 0
        x = np.asarray(jax.device_get(world.transform.x))
        assert np.isfinite(x).all()


class TestHaloValidation:
    def test_indivisible_entity_count_raises(self):
        eng = _boids_engine(n_total=250)  # 250 % 8 != 0
        mesh = make_mesh(D, axis_name="slab")
        with pytest.raises(ValueError, match="divisible"):
            make_halo_step(eng, mesh)


class TestHaloPallasSolver:
    def test_pallas_solver_runs_under_shard_map(self):
        """The Pallas pair kernel inside the slab shard_map (the real-TPU
        multi-chip configuration; interpret mode here). jax 0.9's check_vma
        cannot type pallas_call outputs — make_halo_step must disable it for
        the pallas solver (and ONLY then), or this raises at trace time.
        Trajectory must match the XLA grid solver bit-for-bit (the same
        parity test_pallas.py proves single-device)."""
        import dataclasses

        def build(solver):
            eng = _boids_engine(n_total=128)
            eng.config = dataclasses.replace(
                eng.config,
                physics=dataclasses.replace(eng.config.physics, solver=solver),
            )
            return eng

        s_grid, _, _ = _run_halo(build("grid"), 3)
        s_pal, metrics, _ = _run_halo(build("pallas"), 3)
        _assert_exact(s_grid, s_pal)
        assert int(metrics["route_overflow_solver"]) == 0

# collision events, device emit and shadow sprites are now supported under
# the halo step — parity tests live in tests/test_halo_mixed.py
