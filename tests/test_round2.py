"""Round-2 hardening tests: double-despawn guard, vectorized despawn_all,
destroy()/re-init, per-frame event dispatch under chunked stepping, the
device-side "emit" tick key, checkpoint solver-fingerprint normalization,
and the spatial-sharding constraint actually applying under a mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multithreadedgameengine_tpu import Engine, EntityClass, make_config
from multithreadedgameengine_tpu.components import Collider, RigidBody, SpriteRenderer
from multithreadedgameengine_tpu.models.balls import make_balls_engine


def small_engine(n=20, **overrides):
    over = dict(
        world_width=1000.0, world_height=800.0,
        spatial=dict(cell_size=50.0, max_neighbors=32),
    )
    over.update(overrides)
    return make_balls_engine(n_balls=n, spawn=False, **over)


class TestDespawnGuards:
    def test_double_despawn_is_noop(self):
        """gameObject.js:668-670: releasing a slot twice must not duplicate
        the free-list entry (two spawns would alias one slot)."""
        eng = small_engine(n=4)
        i = eng.spawn("Ball", x=10.0, y=10.0)
        free_before = eng.classes["Ball"].pool.free_count
        eng.despawn(i)
        eng.despawn(i)  # guarded no-op
        pool = eng.classes["Ball"].pool
        assert pool.free_count == free_before + 1
        assert pool.active_count == 0
        # the two next spawns must get DISTINCT slots
        a = eng.spawn("Ball", x=1.0, y=1.0)
        b = eng.spawn("Ball", x=2.0, y=1.0)
        assert a != b

    def test_despawn_never_spawned_is_noop(self):
        eng = small_engine(n=4)
        pool = eng.classes["Ball"].pool
        free_before = pool.free_count
        eng.despawn(pool.start)  # index sits in the free list already
        assert pool.free_count == free_before
        assert pool.active_count == 0

    def test_despawn_all_vectorized(self):
        eng = small_engine(n=32)
        idx = eng.spawn_batch("Ball", 32, x=np.linspace(10, 900, 32),
                              y=np.full(32, 50.0))
        assert idx.size == 32
        eng.despawn_all("Ball")
        stats = eng.get_pool_stats("Ball")
        assert stats["active"] == 0 and stats["available"] == 32
        active = np.asarray(jax.device_get(eng.world.transform.active))
        assert not active[1:].any()
        assert active[0]  # mouse survives
        # every component active flag cleared too
        assert not np.asarray(jax.device_get(eng.world.rigid_body.active))[1:].any()
        # pool coherent: a fresh spawn works
        assert eng.spawn("Ball", x=5.0, y=5.0) is not None

    def test_destroy_then_reinit(self):
        """ADVICE r1: destroy() must reset pools/event state so a re-init
        engine has a live Mouse slot and clean control plane."""
        eng = small_engine(n=4)
        eng.spawn("Ball", x=10.0, y=10.0)
        eng.step(1)
        eng.destroy()
        assert eng.world is None
        eng.init()
        assert eng.get_pool_stats("Mouse")["active"] == 1  # mouse respawned
        i = eng.spawn("Ball", x=10.0, y=10.0)
        assert i is not None
        eng.step(1)
        assert int(jax.device_get(eng.world.step_count)) == 1


class _Pair(EntityClass):
    components = [RigidBody, Collider, SpriteRenderer]
    uses_neighbors = False
    enters = 0
    stays = 0

    @classmethod
    def setup(cls, ctx):
        return {
            "collider.radius": 10.0, "collider.active": True,
            "collider.visual_range": 60.0, "rigid_body.static": True,
        }


def _on_enter(ctx, me, other):
    _Pair.enters += 1


def _on_stay(ctx, me, other):
    _Pair.stays += 1


_Pair.on_collision_enter = staticmethod(_on_enter)
_Pair.on_collision_stay = staticmethod(_on_stay)


class TestChunkedEventGranularity:
    def _run(self, event_chunk):
        _Pair.enters = 0
        _Pair.stays = 0
        eng = Engine(make_config(
            world_width=500.0, world_height=500.0,
            spatial=dict(cell_size=50.0, max_neighbors=8),
            logic=dict(collision_events=True, event_chunk=event_chunk),
        ))
        eng.register_entity_class(_Pair, 2)
        eng.init()
        eng.spawn("_Pair", x=100.0, y=100.0)
        eng.spawn("_Pair", x=110.0, y=100.0)  # overlapping statics
        eng.step(4)
        assert int(jax.device_get(eng.world.step_count)) == 4
        return _Pair.enters, _Pair.stays

    def test_step_n_dispatches_events_every_frame(self):
        """ADVICE r1: with events on, step(n>1) must not collapse
        Enter/Stay/Exit into one end-of-chunk diff. Both hooks fire per pair
        side (2 calls per event): enter on the first overlapping frame, stay
        on each subsequent frame."""
        assert self._run(event_chunk=1) == (2, 6)

    def test_device_event_log_chunk_matches_per_frame(self):
        """event_chunk>1: the device log must capture every intermediate
        frame's transitions — same hook counts as per-frame stepping."""
        assert self._run(event_chunk=3) == (2, 6)

    def test_event_log_partial_chunks(self):
        # chunk size larger than n, and n not a multiple of the chunk
        assert self._run(event_chunk=16) == (2, 6)


class _Sparkler(EntityClass):
    components = [Collider, SpriteRenderer]
    uses_neighbors = False
    emit_cap = 4

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 2.0}

    @staticmethod
    def tick(ctx):
        # 3 particles, per-particle vx variation via an [emit_cap] row
        return {
            "emit": {
                "count": jnp.int32(3),
                "vx": jnp.asarray([1.0, 2.0, 3.0, 4.0]),
                "vy": -5.0,
                "z": -1.0,
                "lifespan": 500.0,
                "tint": jnp.uint32(0xFF0000),
            }
        }


class TestDeviceEmit:
    def test_emit_tick_key_spawns_particles(self):
        eng = Engine(make_config(
            world_width=500.0, world_height=500.0,
            spatial=dict(cell_size=50.0, max_neighbors=8),
            particle=dict(max_particles=64),
        ))
        eng.register_entity_class(_Sparkler, 2)
        eng.init()
        eng.spawn("_Sparkler", x=100.0, y=200.0)
        eng.step(1)
        pool = jax.device_get(eng.world.particles)
        active = np.asarray(pool.active)
        assert active.sum() == 3
        live = np.nonzero(active)[0]
        # x/y default to the emitting entity's position
        assert np.allclose(np.asarray(pool.x)[live], 100.0)
        assert np.allclose(np.asarray(pool.y)[live], 200.0)
        # per-particle variation honored, truncated at count=3
        assert sorted(np.asarray(pool.vx)[live].tolist()) == [1.0, 2.0, 3.0]
        assert np.all(np.asarray(pool.tint)[live] == 0xFF0000)
        # next step: 3 more (6 total), first batch has moved
        eng.step(1)
        pool = jax.device_get(eng.world.particles)
        assert np.asarray(pool.active).sum() == 6

    def test_emit_budget_drops_excess(self):
        eng = Engine(make_config(
            world_width=500.0, world_height=500.0,
            spatial=dict(cell_size=50.0, max_neighbors=8),
            particle=dict(max_particles=64, max_emit_per_step=2),
        ))
        eng.register_entity_class(_Sparkler, 2)
        eng.init()
        eng.spawn("_Sparkler", x=100.0, y=200.0)
        eng.step(1)
        assert np.asarray(jax.device_get(eng.world.particles.active)).sum() == 2


class TestCheckpointFingerprint:
    def test_solver_normalized_in_fingerprint(self, tmp_path):
        """ADVICE r1: _build_step rewrites solver 'auto'->'pallas' on TPU;
        the fingerprint must not depend on the resolved backend."""
        eng = small_engine(n=8)
        eng.spawn("Ball", x=100.0, y=100.0)
        eng.step(1)
        # simulate the TPU auto->pallas rewrite
        eng.config = dataclasses.replace(
            eng.config,
            physics=dataclasses.replace(eng.config.physics, solver="pallas"),
        )
        path = str(tmp_path / "ck.npz")
        eng.save_checkpoint(path)
        fresh = small_engine(n=8)  # solver='auto'
        fresh.load_checkpoint(path)
        assert int(jax.device_get(fresh.world.step_count)) == 1


class TestShardingConstraintApplies:
    def test_spatial_rows_sharded_under_mesh(self):
        """The grid tensor must actually come out row-sharded (VERDICT r1
        weak #3: previously a silent no-op was possible)."""
        from multithreadedgameengine_tpu.ops.physics_grid import _shard_spatial_rows

        cfg = make_config(world_width=100.0, world_height=100.0)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("entities",))
        fn = jax.jit(lambda x: _shard_spatial_rows(x, cfg))
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            out = fn(jax.device_put(
                jnp.zeros((16, 4, 4), jnp.float32), NamedSharding(mesh, P())
            ))
        spec = out.sharding.spec
        assert spec[0] == "entities"
        shard_shapes = {s.data.shape for s in out.addressable_shards}
        assert shard_shapes == {(2, 4, 4)}

    def test_no_mesh_is_identity(self):
        from multithreadedgameengine_tpu.ops.physics_grid import _shard_spatial_rows

        cfg = make_config(world_width=100.0, world_height=100.0)
        x = jnp.zeros((16, 4, 4), jnp.float32)
        out = jax.jit(lambda a: _shard_spatial_rows(a, cfg))(x)
        assert out.shape == x.shape


class TestDroppedPairMetric:
    def test_dropped_pairs_observable(self):
        """A dense cluster with a tiny pair table must report drops."""
        eng = Engine(make_config(
            world_width=500.0, world_height=500.0,
            spatial=dict(cell_size=50.0, max_neighbors=64),
            physics=dict(max_collision_pairs=4),
            logic=dict(collision_events=True),
        ))
        eng.register_entity_class(_Pair, 8)
        eng.init()
        for k in range(8):
            eng.spawn("_Pair", x=100.0 + k, y=100.0)  # 8 coincident-ish statics
        eng.step(1)
        m = eng.stats()
        # 28 true pairs, table caps at 4
        assert m["collision_pair_count"] == 4
        assert m["collision_pairs_dropped"] > 0


class TestFastSpawn:
    def test_fast_spawn_bit_identical(self):
        """make_balls_engine(fast_spawn=True) consumes the same RNG stream in
        the same order and lands the same world as n spawn() calls."""
        import numpy as np

        from multithreadedgameengine_tpu.models.balls import make_balls_engine

        a = make_balls_engine(n_balls=300, seed=777, fast_spawn=False)
        b = make_balls_engine(n_balls=300, seed=777, fast_spawn=True)
        a._flush_pending()
        b._flush_pending()
        for x, y in zip(
            jax.tree_util.tree_leaves(a.world), jax.tree_util.tree_leaves(b.world)
        ):
            assert np.array_equal(np.asarray(x), np.asarray(y))
        a.step(3)
        b.step(3)
        assert np.array_equal(
            np.asarray(a.world.transform.x), np.asarray(b.world.transform.x)
        )
        # host RNG cursors agree too: later spawns stay in lockstep
        assert a.rng() == b.rng()


class TestHookAwareEventLog:
    def test_stay_only_hooks_fire_with_logged_coords(self):
        """A scene registering only on_collision_stay: the chunk program
        logs zero-width Enter/Exit tables (hook-aware logging) and the stay
        hooks still fire with per-frame participant coordinates."""
        from multithreadedgameengine_tpu import Engine, make_config
        from multithreadedgameengine_tpu.behavior import EntityClass
        from multithreadedgameengine_tpu.components import Collider, RigidBody

        fired = []

        class Blob(EntityClass):
            components = [RigidBody, Collider]
            uses_neighbors = False

            @classmethod
            def setup(cls, ctx):
                return {"collider.radius": 10.0, "collider.visual_range": 50.0}

            on_collision_stay = staticmethod(
                lambda ctx, me, other: fired.append(
                    (me, other, float(ctx.x[other]), float(ctx.y[other]))
                )
            )

        eng = Engine(make_config(
            world_width=500.0, world_height=500.0, seed=3,
            spatial=dict(cell_size=25.0, max_neighbors=16, cell_capacity=8),
            physics=dict(max_collision_pairs=64, gravity=(0.0, 0.0)),
            logic=dict(collision_events=True, event_chunk=4),
        ))
        eng.register_entity_class(Blob, 8)
        eng.init()
        for k in range(4):
            eng.spawn("Blob", x=100.0 + k * 12.0, y=100.0)
        eng.step(8)
        eng.sync()
        assert fired
        for me, other, x, y in fired:
            assert np.isfinite(x) and np.isfinite(y)
            assert 0.0 <= x <= 500.0 and 0.0 <= y <= 500.0
