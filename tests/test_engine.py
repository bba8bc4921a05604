"""End-to-end engine tests: registration, pooling, spawning, stepping,
snapshot/restore, determinism — the balls demo at reduced scale as the
integration scenario (the reference's demos are its de-facto tests,
SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu import Engine, EntityClass, RigidBody, Collider, SpriteRenderer, make_config
from multithreadedgameengine_tpu.models.balls import Ball, balls_config, make_balls_engine


def small_engine(n=50, **overrides):
    over = dict(
        world_width=1000.0, world_height=800.0,
        spatial=dict(cell_size=50.0, max_neighbors=32),
    )
    over.update(overrides)
    return make_balls_engine(n_balls=n, spawn=False, **over)


class TestRegistration:
    def test_mouse_is_entity_zero(self):
        eng = small_engine()
        assert eng.classes["Mouse"].entity_type == 0
        assert eng.classes["Mouse"].start_index == 0
        assert eng.classes["Ball"].entity_type == 1
        assert eng.classes["Ball"].start_index == 1

    def test_entity_type_preinitialized(self):
        eng = small_engine(n=10)
        et = np.asarray(jax.device_get(eng.world.transform.entity_type))
        assert et[0] == 0
        assert np.all(et[1:11] == 1)

    def test_parent_chain_auto_registration(self):
        class Base(EntityClass):
            components = [RigidBody]

        class Derived(Base):
            components = [Collider]

        eng = Engine(make_config())
        eng.register_entity_class(Derived, 5)
        assert "Base" in eng.classes
        assert eng.classes["Base"].count == 0
        # Derived inherits Base's components
        paths = eng.classes["Derived"].component_paths
        assert "rigid_body" in paths and "collider" in paths and "transform" in paths

    def test_setup_values_applied(self):
        eng = small_engine(n=5)
        mv = np.asarray(jax.device_get(eng.world.rigid_body.max_vel))
        assert np.all(mv[1:6] == 50.0)  # ball.js:23
        vr = np.asarray(jax.device_get(eng.world.collider.visual_range))
        assert np.allclose(vr[1:6], 50.0 * 1.33)


class TestPooling:
    def test_spawn_index_order_interleaved(self):
        """LIFO pop order of the interleave-8 free list
        (gameObject.js:794-831): first pops are offset 7 series descending."""
        eng = small_engine(n=16)
        i1 = eng.spawn("Ball", x=10.0, y=10.0)
        i2 = eng.spawn("Ball", x=20.0, y=10.0)
        i3 = eng.spawn("Ball", x=30.0, y=10.0)
        # ball range starts at 1; count 16: last pushed = offset7 series [8, 16]
        assert [i1, i2, i3] == [16, 8, 15]

    def test_pool_exhaustion_returns_none(self):
        eng = small_engine(n=3)
        assert all(eng.spawn("Ball", x=1.0, y=1.0) is not None for _ in range(3))
        assert eng.spawn("Ball", x=1.0, y=1.0) is None
        stats = eng.get_pool_stats("Ball")
        assert stats == {"total": 3, "active": 3, "available": 0}

    def test_despawn_returns_to_pool(self):
        eng = small_engine(n=3)
        i = eng.spawn("Ball", x=1.0, y=1.0)
        eng.step()
        eng.despawn(i)
        eng.step()
        assert eng.get_pool_stats("Ball")["active"] == 0
        active = np.asarray(jax.device_get(eng.world.transform.active))
        assert not active[i]
        # slot is reusable
        j = eng.spawn("Ball", x=2.0, y=2.0)
        assert j == i

    def test_despawn_all(self):
        eng = small_engine(n=8)
        for _ in range(8):
            eng.spawn("Ball", x=5.0, y=5.0)
        eng.step()
        eng.despawn_all()
        eng.step()
        active = np.asarray(jax.device_get(eng.world.transform.active))
        assert active[0]  # mouse survives
        assert not np.any(active[1:])
        assert eng.get_pool_stats("Ball")["available"] == 8


class TestSpawnSemantics:
    def test_spawn_config_and_verlet_sync(self):
        eng = small_engine(n=4)
        i = eng.spawn("Ball", x=100.0, y=200.0, vx=3.0, vy=-2.0)
        eng.step()
        w = eng.snapshot()
        # px = x - vx at spawn (gameObject.js:938-940); after one step the
        # ball moved by ~vx*damping (+gravity on y)
        assert abs(float(w.transform.x[i]) - (100.0 + 3.0 * 0.99)) < 1e-3
        assert bool(w.transform.active[i])
        assert bool(w.rigid_body.active[i])
        assert bool(w.collider.active[i])

    def test_spawn_reset_values(self):
        eng = small_engine(n=4)
        i = eng.spawn("Ball", x=50.0, y=50.0)
        eng._flush_pending()
        w = eng.snapshot()
        assert float(w.sprite.alpha[i]) == 1.0
        assert int(w.sprite.tint[i]) in (
            0xFF6B6B, 0x4ECDC4, 0xFFE66D, 0xA29BFE,
            0x95E1D3, 0xFECA57, 0x48DBFB, 0xFF9FF3,
        )
        r = float(w.collider.radius[i])
        assert 10.0 <= r <= 30.0  # ball.js:66
        assert float(w.sprite.scale_x[i]) == pytest.approx(r * 2 / 14.0)


class TestStepping:
    def test_balls_scene_stays_finite_and_bounded(self):
        eng = small_engine(n=60)
        for _ in range(60):
            eng.spawn(
                "Ball",
                x=eng.rng() * eng.config.world_width,
                y=eng.rng() * eng.config.world_height,
                vx=0.0, vy=0.0,
            )
        eng.step(30)
        w = eng.snapshot()
        x = np.asarray(w.transform.x)[1:61]
        y = np.asarray(w.transform.y)[1:61]
        assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
        assert np.all(y <= 800.0 + 1e-3)

    def test_step_counts(self):
        eng = small_engine(n=4)
        eng.spawn("Ball", x=10.0, y=10.0)
        eng.step()
        eng.step(5)
        assert int(jax.device_get(eng.world.step_count)) == 6

    def test_determinism_same_seed(self):
        def run():
            eng = small_engine(n=30, seed=777)
            for _ in range(30):
                eng.spawn(
                    "Ball",
                    x=eng.rng() * eng.config.world_width,
                    y=eng.rng() * eng.config.world_height,
                )
            eng.step(20)
            return eng.snapshot()

        a, b = run(), run()
        np.testing.assert_array_equal(a.transform.x, b.transform.x)
        np.testing.assert_array_equal(a.transform.y, b.transform.y)

    def test_snapshot_restore_resumes_identically(self):
        eng = small_engine(n=20, seed=5)
        for _ in range(20):
            eng.spawn("Ball", x=eng.rng() * 1000.0, y=eng.rng() * 800.0)
        eng.step(5)
        snap = eng.snapshot()
        eng.step(7)
        after = eng.snapshot()
        eng.restore(snap)
        eng.step(7)
        again = eng.snapshot()
        np.testing.assert_array_equal(after.transform.x, again.transform.x)
        np.testing.assert_array_equal(after.rigid_body.vy, again.rigid_body.vy)

    def test_pause_resume(self):
        eng = small_engine(n=4)
        eng.spawn("Ball", x=10.0, y=10.0)
        eng.step()
        before = int(jax.device_get(eng.world.step_count))
        eng.pause()
        eng.step(3)
        assert int(jax.device_get(eng.world.step_count)) == before
        eng.resume()
        eng.step()
        assert int(jax.device_get(eng.world.step_count)) == before + 1

    def test_live_physics_config_update(self):
        eng = small_engine(n=4)
        i = eng.spawn("Ball", x=500.0, y=400.0)
        eng.step()
        eng.update_physics_config(gravity=(0.0, 0.0))
        y0 = float(jax.device_get(eng.world.transform.y)[i])
        eng.step()  # re-jitted with zero gravity: only damped residual motion
        y1 = float(jax.device_get(eng.world.transform.y)[i])
        assert abs(y1 - y0) < 1.0


class TestTick:
    def test_mouse_repulsion_applies_near_only(self):
        eng = small_engine(n=8)
        near = eng.spawn("Ball", x=110.0, y=100.0)
        far = eng.spawn("Ball", x=600.0, y=600.0)
        eng.input.set_mouse(100.0, 100.0)
        eng.input.mouse_button(0, True)
        eng.step()
        w = eng.snapshot()
        # near ball pushed away (+x), far ball only under gravity
        assert float(w.rigid_body.vx[near]) > 0.1
        assert abs(float(w.rigid_body.vx[far])) < 1e-4

    def test_mouse_entity_tracks_input(self):
        eng = small_engine(n=2)
        eng.input.set_mouse(123.0, 45.0)
        eng.step()
        w = eng.snapshot()
        assert float(w.transform.x[0]) == 123.0
        assert float(w.transform.y[0]) == 45.0


class TestSpawnBatch:
    def test_batch_matches_loop_bitwise(self):
        """spawn_batch must replay the exact loop semantics (same seeded
        draws, same resets, same px/py sync)."""
        def build(batch):
            eng = small_engine(n=50, seed=31)
            xs = [eng.rng() * 1000.0 for _ in range(30)]
            ys = [eng.rng() * 800.0 for _ in range(30)]
            if batch:
                eng.spawn_batch("Ball", 30, x=np.asarray(xs), y=np.asarray(ys))
            else:
                for k in range(30):
                    eng.spawn("Ball", x=xs[k], y=ys[k])
            eng.step(5)
            return eng.snapshot()

        a, b = build(False), build(True)
        np.testing.assert_array_equal(a.transform.x, b.transform.x)
        np.testing.assert_array_equal(a.collider.radius, b.collider.radius)
        np.testing.assert_array_equal(a.sprite.tint, b.sprite.tint)

    def test_batch_without_hooks(self):
        eng = small_engine(n=20, seed=2)
        idx = eng.spawn_batch(
            "Ball", 10, call_on_spawned=False,
            x=np.linspace(100, 900, 10), y=50.0,
            **{"collider.radius": 12.0},
        )
        assert len(idx) == 10
        eng.step(1)
        w = eng.snapshot()
        assert np.asarray(w.transform.active)[idx].all()
        np.testing.assert_allclose(np.asarray(w.collider.radius)[idx], 12.0)

    def test_batch_pool_exhaustion(self):
        eng = small_engine(n=5, seed=2)
        idx = eng.spawn_batch("Ball", 9, x=1.0, y=1.0)
        assert len(idx) == 5
        assert eng.get_pool_stats("Ball")["available"] == 0


class TestBatchControlPlane:
    """Vectorized churn-rate control plane: despawn_batch / active_indices
    (the device-side analog of the reference's free-list churn steady state,
    gameObject.js:668-691, :794-951)."""

    def test_despawn_batch_releases_and_clears(self):
        eng = small_engine(n=40, seed=5)
        idx = eng.spawn_batch("Ball", 30, x=1.0, y=1.0)
        victims = idx[:10]
        assert eng.despawn_batch(victims) == 10
        act = eng.active_indices("Ball")
        assert act.size == 20
        assert not np.intersect1d(act, victims).size
        w = eng.snapshot()
        assert not np.asarray(w.transform.active)[victims].any()
        assert np.asarray(w.transform.active)[act].all()

    def test_despawn_batch_double_despawn_guard(self):
        eng = small_engine(n=20, seed=5)
        idx = eng.spawn_batch("Ball", 10, x=1.0, y=1.0)
        assert eng.despawn_batch(idx[:4]) == 4
        # releasing again is a setwise no-op (double-despawn guard)
        assert eng.despawn_batch(idx[:4]) == 0
        assert eng.get_pool_stats("Ball")["active"] == 6
        # freed slots are reusable exactly once each
        again = eng.spawn_batch("Ball", 4, x=2.0, y=2.0)
        assert len(again) == 4
        assert eng.get_pool_stats("Ball")["active"] == 10

    def test_batch_matches_singles_after_churn(self):
        """A churn cycle through the batch APIs equals the same cycle through
        per-call spawn/despawn (same pool order, same seeded draws)."""
        def build(batch):
            eng = small_engine(n=30, seed=9)
            xs = [eng.rng() * 1000.0 for _ in range(12)]
            ys = [eng.rng() * 800.0 for _ in range(12)]
            if batch:
                idx = eng.spawn_batch("Ball", 12, x=np.asarray(xs), y=np.asarray(ys))
                eng.despawn_batch(idx[3:6])
            else:
                idx = [eng.spawn("Ball", x=xs[k], y=ys[k]) for k in range(12)]
                for i in idx[3:6]:
                    eng.despawn(i)
            eng.step(3)
            return eng.snapshot()

        a, b = build(False), build(True)
        np.testing.assert_array_equal(a.transform.active, b.transform.active)
        np.testing.assert_array_equal(a.transform.x, b.transform.x)
        np.testing.assert_array_equal(a.collider.radius, b.collider.radius)
