"""Halo step mixed-scene features (VERDICT r2 next #3): collision events,
device-side emit, particle physics and shadow sprites under the shard_map
spatial-domain step, verified against the single-device fused step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multithreadedgameengine_tpu import Engine, EntityClass, make_config
from multithreadedgameengine_tpu.components import (
    Collider, LightEmitter, RigidBody, ShadowCaster, SpriteRenderer,
)
from multithreadedgameengine_tpu.parallel import make_halo_step, make_mesh

D = 8


class _Bumper(EntityClass):
    """Hooked mover: drifts right so Enter/Stay/Exit transitions happen."""

    components = [RigidBody, Collider, SpriteRenderer]
    uses_neighbors = False

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 12.0, "collider.visual_range": 80.0,
                "rigid_body.max_vel": 50.0}

    @staticmethod
    def on_collision_stay(ctx, me, other):
        pass


class _Drifter(EntityClass):
    """Unhooked mover sharing the world with _Bumper."""

    components = [RigidBody, Collider, SpriteRenderer]
    uses_neighbors = False

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 12.0, "collider.visual_range": 80.0,
                "rigid_body.max_vel": 50.0}


class _Sparker(EntityClass):
    components = [RigidBody, Collider, SpriteRenderer]
    uses_neighbors = False
    emit_cap = 2

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 5.0, "collider.visual_range": 40.0}

    @staticmethod
    def tick(ctx):
        return {"emit": {
            "count": jnp.int32(2),
            "vx": jnp.asarray([1.0, -1.0]),
            "vy": -2.0, "z": -1.0, "lifespan": 4000.0,
            "tint": jnp.uint32(0x00FF00),
        }}


class _Caster(EntityClass):
    components = [RigidBody, Collider, SpriteRenderer, ShadowCaster]
    uses_neighbors = False

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 8.0, "collider.visual_range": 40.0,
                "rigid_body.static": True,
                "shadow.shadow_radius": 9.0, "shadow.height": 30.0}


class _Lamp(EntityClass):
    components = [RigidBody, Collider, SpriteRenderer, LightEmitter]
    uses_neighbors = False

    @classmethod
    def setup(cls, ctx):
        # visual range 190 keeps the spatial halo width at 2 cells — the
        # 1600-unit world split over 8 slabs has only 2 grid rows per slab
        return {"collider.radius": 4.0, "collider.visual_range": 190.0,
                "rigid_body.static": True,
                "light.light_intensity": 500.0,
                "light.light_color": 0xFFEECC, "light.height": 50.0}


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
    return jax.device_get(world), metrics


def _event_rows(w):
    out = {}
    for kind in ("enter", "stay", "exit"):
        n = int(np.asarray(getattr(w, f"event_{kind}_count")))
        out[kind] = np.asarray(getattr(w, f"event_{kind}"))[:n].tolist()
    return out


class TestHaloEvents:
    def _engine(self):
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=11,
            spatial=dict(cell_size=100.0, max_neighbors=32, cell_capacity=16),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.0),
                         collision_response_strength=0.2),
            logic=dict(collision_events=True),
        ))
        eng.register_entity_class(_Bumper, 31)
        eng.register_entity_class(_Drifter, 32)
        eng.init()
        rng = np.random.default_rng(5)
        for k in range(31):
            eng.spawn("_Bumper", x=float(rng.uniform(50, 1950)),
                      y=float(rng.uniform(50, 1550)),
                      vx=float(rng.uniform(-4, 4)), vy=float(rng.uniform(-4, 4)))
        for k in range(32):
            eng.spawn("_Drifter", x=float(rng.uniform(50, 1950)),
                      y=float(rng.uniform(50, 1550)),
                      vx=float(rng.uniform(-4, 4)), vy=float(rng.uniform(-4, 4)))
        eng._flush_pending()
        return eng

    def test_event_tables_match_single_device(self):
        """Enter/Stay/Exit tables after every step must equal the single-
        device step's (the diff sorts by (a, b), so equality is exact)."""
        eng1 = self._engine()
        eng2 = self._engine()
        mesh = make_mesh(D, axis_name="slab")
        step, place = make_halo_step(eng2, mesh)
        world = place(eng2.world)
        ins = eng2.input.snapshot()
        saw_events = False
        for k in range(12):
            eng1.step(1)
            eng1.sync()
            world, metrics = step(world, ins)
            w1 = eng1.snapshot()
            w2 = jax.device_get(world)
            assert int(np.asarray(w1.collision_pair_count)) == int(
                np.asarray(w2.collision_pair_count)
            ), f"pair count diverged at step {k}"
            e1, e2 = _event_rows(w1), _event_rows(w2)
            assert e1 == e2, f"event tables diverged at step {k}"
            saw_events = saw_events or any(e1.values())
            np.testing.assert_array_equal(
                np.asarray(w1.transform.x), np.asarray(w2.transform.x)
            )
        assert saw_events  # the scene must actually produce events


class TestHaloEmit:
    def _engine(self, n=63):
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=3,
            spatial=dict(cell_size=100.0, max_neighbors=16, cell_capacity=16),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.0)),
            particle=dict(max_particles=256, max_emit_per_step=64),
        ))
        eng.register_entity_class(_Sparker, n)
        eng.init()
        rng = np.random.default_rng(9)
        eng.spawn_batch(
            "_Sparker", 20,
            x=rng.uniform(50, 1950, 20).astype(np.float32),
            y=rng.uniform(50, 1550, 20).astype(np.float32),
        )
        eng._flush_pending()
        return eng

    def test_emitted_pool_bit_exact(self):
        """Device-emit order under the halo step reproduces the single-
        device pool exactly (gid-sorted merge == class/row/slot order)."""
        s1 = _run_single(self._engine(), 4)
        s2, metrics = _run_halo(self._engine(), 4)
        p1, p2 = s1.particles, s2.particles
        for f in ("active", "x", "y", "z", "vx", "vy", "vz", "tint",
                  "lifespan", "current_life"):
            np.testing.assert_array_equal(
                np.asarray(getattr(p1, f)), np.asarray(getattr(p2, f)), err_msg=f
            )
        assert np.asarray(p1.active).sum() > 0
        assert int(metrics["active_particles"]) == int(np.asarray(p2.active).sum())

    def test_emit_budget_truncation_matches(self):
        eng1 = self._engine()
        eng2 = self._engine()
        # shrink the budget so the 40 requests/frame overflow identically
        for e in (eng1, eng2):
            import dataclasses
            e.config = dataclasses.replace(
                e.config,
                particle=dataclasses.replace(e.config.particle, max_emit_per_step=7),
            )
        s1 = _run_single(eng1, 2)
        s2, _ = _run_halo(eng2, 2)
        np.testing.assert_array_equal(
            np.asarray(s1.particles.active), np.asarray(s2.particles.active)
        )
        np.testing.assert_array_equal(
            np.asarray(s1.particles.x), np.asarray(s2.particles.x)
        )


class TestHaloShadows:
    def _engine(self):
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=21,
            canvas_width=2000, canvas_height=1600,
            spatial=dict(cell_size=100.0, max_neighbors=32, cell_capacity=16),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.0)),
            lighting=dict(enabled=True, shadows_enabled=True,
                          max_shadow_casting_lights=4, max_shadows_per_light=6),
        ))
        eng.register_entity_class(_Caster, 59)
        eng.register_entity_class(_Lamp, 4)
        eng.init()
        rng = np.random.default_rng(17)
        # static scene: frame-start == post-move state, so the halo's
        # documented one-frame staleness cannot differ from single-chip
        for k in range(59):
            eng.spawn("_Caster", x=float(rng.uniform(800, 1200)),
                      y=float(rng.uniform(600, 1000)))
        for k in range(4):
            eng.spawn("_Lamp", x=900.0 + 100.0 * k, y=700.0 + 50.0 * k)
        eng._flush_pending()
        eng.input.set_camera(1000.0, 800.0, 1.0)
        return eng

    def test_static_scene_shadows_bit_exact(self):
        s1 = _run_single(self._engine(), 3)
        s2, _ = _run_halo(self._engine(), 3)
        a1 = np.asarray(s1.shadow_sprites.active)
        a2 = np.asarray(s2.shadow_sprites.active)
        np.testing.assert_array_equal(a1, a2)
        assert a1.sum() > 0  # the scene must actually cast shadows
        for f in ("x", "y", "rotation", "scale_x", "scale_y", "alpha", "radius"):
            v1 = np.asarray(getattr(s1.shadow_sprites, f))[a1]
            v2 = np.asarray(getattr(s2.shadow_sprites, f))[a2]
            np.testing.assert_array_equal(v1, v2, err_msg=f)


class TestHaloMixedScene:
    def test_predators_style_scene_runs_sharded(self):
        """Events + shadows + particles + emit in ONE halo step (the
        BASELINE config-5 feature set), bit-exact entity trajectories."""
        def build():
            eng = Engine(make_config(
                world_width=2000.0, world_height=1600.0, seed=33,
                canvas_width=2000, canvas_height=1600,
                spatial=dict(cell_size=100.0, max_neighbors=32, cell_capacity=16),
                physics=dict(sub_step_count=1, gravity=(0.0, 0.0),
                             collision_response_strength=0.2),
                logic=dict(collision_events=True),
                particle=dict(max_particles=128, max_emit_per_step=32),
                lighting=dict(enabled=True, shadows_enabled=True,
                              max_shadow_casting_lights=2,
                              max_shadows_per_light=4),
            ))
            eng.register_entity_class(_Bumper, 29)
            eng.register_entity_class(_Sparker, 16)
            eng.register_entity_class(_Caster, 16)
            eng.register_entity_class(_Lamp, 2)
            eng.init()
            rng = np.random.default_rng(41)
            for k in range(29):
                eng.spawn("_Bumper", x=float(rng.uniform(850, 1150)),
                          y=float(rng.uniform(650, 950)),
                          vx=float(rng.uniform(-3, 3)),
                          vy=float(rng.uniform(-3, 3)))
            for k in range(8):
                eng.spawn("_Sparker", x=float(rng.uniform(850, 1150)),
                          y=float(rng.uniform(650, 950)))
            for k in range(12):
                eng.spawn("_Caster", x=float(rng.uniform(900, 1100)),
                          y=float(rng.uniform(700, 900)))
            for k in range(2):
                eng.spawn("_Lamp", x=950.0 + 100.0 * k, y=800.0)
            eng._flush_pending()
            eng.input.set_camera(1000.0, 800.0, 1.0)
            return eng

        s1 = _run_single(build(), 6)
        s2, metrics = _run_halo(build(), 6)
        np.testing.assert_array_equal(
            np.asarray(s1.transform.x), np.asarray(s2.transform.x)
        )
        np.testing.assert_array_equal(
            np.asarray(s1.transform.y), np.asarray(s2.transform.y)
        )
        e1, e2 = _event_rows(s1), _event_rows(s2)
        assert e1 == e2
        np.testing.assert_array_equal(
            np.asarray(s1.particles.active), np.asarray(s2.particles.active)
        )
        assert int(metrics["route_overflow_logic"]) == 0


class _Stamper(EntityClass):
    """Emits stay-on-the-floor droplets that land (and stamp) within a few
    frames: z starts just below the floor with downward pull."""

    components = [RigidBody, Collider, SpriteRenderer]
    uses_neighbors = False
    emit_cap = 2

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 5.0, "collider.visual_range": 40.0}

    @staticmethod
    def tick(ctx):
        return {"emit": {
            "count": jnp.int32(2),
            "vx": jnp.asarray([1.5, -1.5]),
            "vy": 1.0, "z": -2.0, "vz": 1.0, "gravity": 0.3,
            "lifespan": 8000.0, "scale": 0.3,
            "tint": jnp.uint32(0xAA2222),
            "texture_id": jnp.int32(1),  # 0 = reserved/missing (no stamp)
            "stay_on_the_floor": True,
        }}


class TestHaloDecals:
    def _engine(self):
        eng = Engine(make_config(
            world_width=1000.0, world_height=800.0, seed=21,
            spatial=dict(cell_size=50.0, max_neighbors=8),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.0)),
            particle=dict(
                max_particles=64, decals=True,
                decals_tile_size=200.0, decals_resolution=0.1,
            ),
        ))
        eng.register_entity_class(_Stamper, 63)
        eng.init()
        rng = np.random.default_rng(9)
        for _ in range(20):
            eng.spawn("_Stamper", x=float(rng.uniform(50, 950)),
                      y=float(rng.uniform(50, 750)))
        eng._flush_pending()
        return eng

    def test_decal_canvas_bit_exact(self):
        """Landing stay-on-the-floor particles stamp the tile canvas
        identically under the halo step (replicated pool → replicated
        stamps), and some stamping must actually have happened."""
        eng1, eng2 = self._engine(), self._engine()
        steps = 10
        w1 = _run_single(eng1, steps)
        w2, _m = _run_halo(eng2, steps)
        c1 = np.asarray(w1.decal_canvas)
        c2 = np.asarray(w2.decal_canvas)
        assert c1.any(), "scene must actually stamp decals"
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(
            np.asarray(w1.decal_dirty), np.asarray(w2.decal_dirty)
        )
        np.testing.assert_array_equal(
            np.asarray(w1.particles.active), np.asarray(w2.particles.active)
        )


class _Gatherer(EntityClass):
    """Tick reads an UNDECLARED neighbor field via ctx.gather — exercises
    the halo step's all_gather fallback (global-id indexing)."""

    components = [RigidBody, Collider, SpriteRenderer]
    uses_neighbors = True
    neighbor_fields = ()  # nothing declared on purpose

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 6.0, "collider.visual_range": 90.0,
                "rigid_body.max_vel": 50.0}

    @staticmethod
    def tick(ctx):
        m = ctx.neighbor_mask
        # undeclared per-neighbor reads: radius (physics) + vx (rigid body)
        nr = ctx.gather("collider.radius")
        nvx = ctx.gather("rigid_body.vx")
        denom = jnp.maximum(jnp.sum(m, dtype=jnp.float32), 1.0)
        avg_r = jnp.sum(jnp.where(m, nr, 0.0)) / denom
        avg_vx = jnp.sum(jnp.where(m, nvx, 0.0)) / denom
        return {"rigid_body.vx": ctx.vx * 0.9 + avg_vx * 0.1 + avg_r * 0.01}


class TestHaloUndeclaredGather:
    def _engine(self):
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=31,
            spatial=dict(cell_size=100.0, max_neighbors=16, cell_capacity=16),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.0)),
        ))
        eng.register_entity_class(_Gatherer, 63)
        eng.init()
        rng = np.random.default_rng(13)
        for _ in range(48):
            eng.spawn("_Gatherer", x=float(rng.uniform(50, 1950)),
                      y=float(rng.uniform(50, 1550)),
                      vx=float(rng.uniform(-4, 4)),
                      vy=float(rng.uniform(-4, 4)))
        eng._flush_pending()
        return eng

    def test_gathered_tick_bit_exact(self):
        eng1, eng2 = self._engine(), self._engine()
        w1 = _run_single(eng1, 8)
        w2, _m = _run_halo(eng2, 8)
        np.testing.assert_array_equal(
            np.asarray(w1.rigid_body.vx), np.asarray(w2.rigid_body.vx)
        )
        np.testing.assert_array_equal(
            np.asarray(w1.transform.x), np.asarray(w2.transform.x)
        )


class TestHaloChunkedStep:
    """chunk_steps=K runs K frames per dispatch under lax.scan with a
    per-frame input timeline — the multi-chip FramePlan analog."""

    def _engine(self):
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=41,
            spatial=dict(cell_size=100.0, max_neighbors=16, cell_capacity=16),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.1)),
        ))
        eng.register_entity_class(_Drifter, 63)
        eng.init()
        rng = np.random.default_rng(17)
        for _ in range(40):
            eng.spawn("_Drifter", x=float(rng.uniform(50, 1950)),
                      y=float(rng.uniform(50, 1550)),
                      vx=float(rng.uniform(-4, 4)), vy=float(rng.uniform(-4, 4)))
        eng._flush_pending()
        return eng

    def test_chunked_matches_per_step_with_input_timeline(self):
        K = 3
        mesh = make_mesh(D, axis_name="slab")

        # per-frame inputs: the mouse sweeps across the world
        def snap_at(eng, k):
            eng.input.set_mouse(200.0 + 400.0 * k, 300.0 + 100.0 * k)
            eng.input.mouse_button(0, True)
            return eng.input.snapshot()

        eng1 = self._engine()
        step1, place1 = make_halo_step(eng1, mesh)
        w1 = place1(eng1.world)
        snaps = []
        for k in range(K):
            s = snap_at(eng1, k)
            snaps.append(s)
            w1, m1 = step1(w1, s)
        w1 = jax.device_get(w1)

        eng2 = self._engine()
        step2, place2 = make_halo_step(eng2, mesh, chunk_steps=K)
        w2 = place2(eng2.world)
        timeline = jax.tree.map(lambda *xs: jnp.stack(xs), *snaps)
        w2, m2 = step2(w2, timeline)
        w2 = jax.device_get(w2)

        np.testing.assert_array_equal(
            np.asarray(w1.transform.x), np.asarray(w2.transform.x)
        )
        np.testing.assert_array_equal(
            np.asarray(w1.transform.y), np.asarray(w2.transform.y)
        )
        assert int(np.asarray(w2.step_count)) == K
        # metrics stacked [K]
        assert np.asarray(m2["active_count"]).shape == (K,)
        assert int(np.asarray(m2["active_count"])[-1]) == int(
            np.asarray(m1["active_count"])
        )

    def test_chunked_step_with_events(self):
        """Collision events (device diff + prev-table barrier swap) work
        inside the scanned chunk program, bit-exact vs per-step dispatch."""
        eng1, eng2 = (
            TestHaloEvents._engine(TestHaloEvents()),
            TestHaloEvents._engine(TestHaloEvents()),
        )
        mesh = make_mesh(D, axis_name="slab")
        K = 6
        s1, p1 = make_halo_step(eng1, mesh)
        w1 = p1(eng1.world)
        ins = eng1.input.snapshot()
        for _ in range(K):
            w1, _m1 = s1(w1, ins)
        w1 = jax.device_get(w1)
        s2, p2 = make_halo_step(eng2, mesh, chunk_steps=K)
        w2 = p2(eng2.world)
        tl = jax.tree.map(lambda x: jnp.stack([x] * K), eng2.input.snapshot())
        w2, _m2 = s2(w2, tl)
        w2 = jax.device_get(w2)
        np.testing.assert_array_equal(
            np.asarray(w1.transform.x), np.asarray(w2.transform.x)
        )
        assert _event_rows(w1) == _event_rows(w2)
