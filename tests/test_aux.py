"""Auxiliary subsystem tests: debug flags, profiling/stats, screen events,
checkpoint/resume (SURVEY.md §5.1-§5.5)."""

import numpy as np
import pytest

from multithreadedgameengine_tpu.debugging import Debug
from multithreadedgameengine_tpu.models.balls import make_balls_engine
from multithreadedgameengine_tpu.models.predators import make_predators_engine


class TestDebugFlags:
    def test_chainable_and_presets(self):
        d = Debug()
        d.show_colliders().show_grid().show_velocity(False)
        assert d["colliders"] and d["grid"] and not d["velocity"]
        d.disable_all().enable_physics_debug()
        assert d["colliders"] and d["velocity"] and d["acceleration"]
        assert not d["grid"]
        d.enable_ai_debug()
        assert d["neighbors"] and d["grid"]


class TestStats:
    def test_stats_and_timer(self):
        eng = make_balls_engine(n_balls=30, seed=2, spawn=False,
                                world_width=800.0, world_height=600.0)
        for _ in range(10):
            eng.spawn("Ball", x=eng.rng() * 800.0, y=eng.rng() * 600.0)
        eng.enable_profiling(True)
        eng.step(3)  # compile call: timing sample skipped
        eng.step(2)
        s = eng.stats()
        assert s["total_steps"] == 5
        assert s["steps_per_sec"] > 0
        assert s["active_count"] == 11  # 10 balls + mouse
        assert s["pools"]["Ball"]["active"] == 10
        assert len(eng.timeline.entries) >= 1

    def test_phase_profiler(self):
        eng = make_balls_engine(n_balls=20, seed=2, spawn=False,
                                world_width=800.0, world_height=600.0)
        for _ in range(10):
            eng.spawn("Ball", x=eng.rng() * 800.0, y=eng.rng() * 600.0)
        eng.step(1)
        phases = eng.profiler.profile_phases(reps=2)
        for key in ("spatial", "logic", "verlet_move", "derived", "full_step"):
            assert key in phases and phases[key] >= 0


class TestScreenEvents:
    def test_enter_exit_hooks_fire(self):
        from multithreadedgameengine_tpu.models.balls import Ball

        events = []

        class WatchedBall(Ball):
            pass

        WatchedBall.on_screen_enter = staticmethod(lambda i: events.append(("enter", i)))
        WatchedBall.on_screen_exit = staticmethod(lambda i: events.append(("exit", i)))

        from multithreadedgameengine_tpu import Engine
        from multithreadedgameengine_tpu.models.balls import balls_config

        eng = Engine(balls_config(
            world_width=5000.0, world_height=800.0,
            logic=dict(screen_events=True),
            physics=dict(gravity=(0.0, 0.0), max_collision_pairs=1),
        ))
        eng.register_entity_class(WatchedBall, 4)
        eng.init()
        i = eng.spawn("WatchedBall", x=100.0, y=100.0)  # on screen
        eng.input.camera_x = 0.0
        eng.input.camera_y = 0.0
        eng.step(2)
        assert ("enter", i) in events
        # teleport out of view via control plane
        eng.despawn(i)
        eng.step(1)
        assert ("exit", i) in events


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        path = str(tmp_path / "ckpt.npz")
        eng = make_balls_engine(n_balls=40, seed=9, spawn=False,
                                world_width=1000.0, world_height=700.0)
        for _ in range(25):
            eng.spawn("Ball", x=eng.rng() * 1000.0, y=eng.rng() * 700.0)
        eng.step(10)
        eng.save_checkpoint(path)
        eng.step(15)
        after = eng.snapshot()

        eng2 = make_balls_engine(n_balls=40, seed=9, spawn=False,
                                 world_width=1000.0, world_height=700.0)
        eng2.load_checkpoint(path)
        assert eng2.get_pool_stats("Ball")["active"] == 25
        eng2.step(15)
        again = eng2.snapshot()
        np.testing.assert_array_equal(after.transform.x, again.transform.x)
        np.testing.assert_array_equal(after.rigid_body.vy, again.rigid_body.vy)
        # rng stream resumes identically: next spawn gets the same radius
        r1 = eng.rng()
        r2 = eng2.rng()
        assert r1 == r2

    def test_mismatched_config_rejected(self, tmp_path):
        path = str(tmp_path / "ckpt.npz")
        eng = make_balls_engine(n_balls=10, seed=1, spawn=False,
                                world_width=1000.0, world_height=700.0)
        eng.step(1)
        eng.save_checkpoint(path)
        other = make_balls_engine(n_balls=12, seed=1, spawn=False,
                                  world_width=1000.0, world_height=700.0)
        with pytest.raises(ValueError, match="different config"):
            other.load_checkpoint(path)

    def test_roundtrip_preserves_decal_canvas_and_events(self, tmp_path):
        """Every World leaf rides the checkpoint — including the stamped
        decal canvas and the collision-event prev tables — so a resumed
        engine continues bit-exact through the renderer-visible state."""
        import jax.numpy as jnp
        from multithreadedgameengine_tpu import (
            Collider, Engine, EntityClass, RigidBody, SpriteRenderer,
            make_config,
        )

        class _Drop(EntityClass):
            components = [RigidBody, Collider, SpriteRenderer]
            uses_neighbors = False
            emit_cap = 2

            @classmethod
            def setup(cls, ctx):
                return {"collider.radius": 6.0, "collider.visual_range": 40.0}

            @staticmethod
            def tick(ctx):
                return {"emit": {
                    "count": jnp.int32(2), "vx": jnp.asarray([1.0, -1.0]),
                    "z": -2.0, "vz": 1.0, "gravity": 0.3,
                    "lifespan": 8000.0, "scale": 0.4,
                    "texture_id": jnp.int32(1),
                    "stay_on_the_floor": True,
                }}

        def build():
            eng = Engine(make_config(
                world_width=800.0, world_height=600.0, seed=5,
                spatial=dict(cell_size=50.0, max_neighbors=8),
                physics=dict(gravity=(0.0, 0.0)),
                logic=dict(collision_events=True),
                particle=dict(max_particles=64, decals=True,
                              decals_tile_size=200.0,
                              decals_resolution=0.25),
            ))
            eng.register_entity_class(_Drop, 16)
            eng.init()
            for k in range(8):
                eng.spawn("_Drop", x=100.0 + 60.0 * k, y=200.0)
            return eng

        path = str(tmp_path / "ckpt_decals.npz")
        eng = build()
        eng.step(8)  # particles land + stamp; contacts recorded
        eng.sync()
        assert np.asarray(eng.snapshot().decal_canvas).any()
        eng.save_checkpoint(path)
        eng.step(6)
        after = eng.snapshot()

        eng2 = build()
        eng2.load_checkpoint(path)
        eng2.step(6)
        again = eng2.snapshot()
        np.testing.assert_array_equal(
            np.asarray(after.decal_canvas), np.asarray(again.decal_canvas)
        )
        np.testing.assert_array_equal(
            np.asarray(after.particles.active),
            np.asarray(again.particles.active),
        )
        np.testing.assert_array_equal(
            np.asarray(after.prev_collision_pairs),
            np.asarray(again.prev_collision_pairs),
        )
