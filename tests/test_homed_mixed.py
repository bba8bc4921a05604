"""Homed step v2 mixed-scene features (VERDICT r4 next #2): collision
events, shadow sprites, decal stamping and device emit under the POSITION-
HOMED movers-only step, verified bit-exact against the single-device fused
step. This is what gives BASELINE config 5 (1M mixed scene sharded) a path
that is both movers-only-routed and feature-complete — in the reference all
features ride the global SABs so they shard for free
(gameEngine.js:534-777); here each pass runs per-chunk on gid-sorted rows.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multithreadedgameengine_tpu import Engine, make_config
from multithreadedgameengine_tpu.parallel import make_homed_step, make_mesh

from test_halo_mixed import (  # shared scene classes (same semantics)
    _Bumper,
    _Caster,
    _Lamp,
    _Sparker,
    _Stamper,
)

D = 8


def _run_single(eng, steps):
    for _ in range(steps):
        eng.step(1)
    eng.sync()
    return eng.snapshot()


def _run_homed(eng, steps, headroom=8.0, adjacent_frac=1.0):
    mesh = make_mesh(D, axis_name="slab")
    step, place, unplace, _ctl = make_homed_step(
        eng, mesh, headroom=headroom, adjacent_frac=adjacent_frac)
    world, gid = place(eng.world)
    ins = eng.input.snapshot()
    metrics = None
    for _ in range(steps):
        world, gid, metrics = step(world, gid, ins)
    jax.device_get(world.step_count)
    return unplace(world, gid), metrics


def _event_rows(w):
    out = {}
    for kind in ("enter", "stay", "exit"):
        n = int(np.asarray(getattr(w, f"event_{kind}_count")))
        out[kind] = np.asarray(getattr(w, f"event_{kind}"))[:n].tolist()
    return out


class TestHomedEvents:
    def _engine(self):
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=11,
            spatial=dict(cell_size=100.0, max_neighbors=32, cell_capacity=16),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.0),
                         collision_response_strength=0.2),
            logic=dict(collision_events=True),
        ))
        eng.register_entity_class(_Bumper, 31)
        eng.init()
        rng = np.random.default_rng(5)
        for k in range(31):
            eng.spawn("_Bumper", x=float(rng.uniform(50, 1950)),
                      y=float(rng.uniform(50, 1550)),
                      vx=float(rng.uniform(-4, 4)), vy=float(rng.uniform(-4, 4)))
        eng._flush_pending()
        return eng

    def test_event_tables_match_single_device(self):
        """Enter/Stay/Exit tables after EVERY step equal the single-device
        step's (diff_pairs sorts by (a, b); per-chunk recording merges by
        device rank, so the diffed tables must still agree exactly)."""
        eng1 = self._engine()
        eng2 = self._engine()
        mesh = make_mesh(D, axis_name="slab")
        step, place, unplace, _ctl = make_homed_step(eng2, mesh)
        world, gid = place(eng2.world)
        ins = eng2.input.snapshot()
        saw_events = False
        for k in range(12):
            eng1.step(1)
            eng1.sync()
            world, gid, metrics = step(world, gid, ins)
            w1 = eng1.snapshot()
            w2 = unplace(world, gid)
            assert int(np.asarray(w1.collision_pair_count)) == int(
                np.asarray(w2.collision_pair_count)
            ), f"pair count diverged at step {k}"
            e1, e2 = _event_rows(w1), _event_rows(w2)
            assert e1 == e2, f"event tables diverged at step {k}"
            saw_events = saw_events or any(e1.values())
            np.testing.assert_array_equal(
                np.asarray(w1.transform.x), np.asarray(w2.transform.x)
            )
        assert saw_events
        assert int(metrics["home_violators"]) == 0


class TestHomedShadows:
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
        s2, _ = _run_homed(self._engine(), 3)
        a1 = np.asarray(s1.shadow_sprites.active)
        a2 = np.asarray(s2.shadow_sprites.active)
        np.testing.assert_array_equal(a1, a2)
        assert a1.sum() > 0
        for f in ("x", "y", "rotation", "scale_x", "scale_y", "alpha", "radius"):
            v1 = np.asarray(getattr(s1.shadow_sprites, f))[a1]
            v2 = np.asarray(getattr(s2.shadow_sprites, f))[a2]
            np.testing.assert_array_equal(v1, v2, err_msg=f)


class TestHomedDecals:
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
        w1 = _run_single(self._engine(), 10)
        w2, _m = _run_homed(self._engine(), 10)
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


class TestHomedMixedScene:
    def _build(self):
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

    def test_predators_style_scene_runs_homed(self):
        """Events + shadows + particles + emit in ONE homed step (the
        BASELINE config-5 feature set), bit-exact entity trajectories and
        event tables, movers-only routing."""
        s1 = _run_single(self._build(), 6)
        s2, metrics = _run_homed(self._build(), 6)
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
        np.testing.assert_array_equal(
            np.asarray(s1.particles.x), np.asarray(s2.particles.x)
        )
        assert int(metrics["home_violators"]) == 0
        assert int(metrics["route_overflow_solver"]) == 0

    def test_mixed_scene_pallas_solver(self):
        """The same mixed scene with the Pallas pair kernel driving phase B
        — the combination VERDICT r4 called out as impossible in v1 (the 1M
        winner solver + movers-only routing + full features)."""
        import dataclasses

        eng = self._build()
        eng.config = dataclasses.replace(
            eng.config,
            physics=dataclasses.replace(
                eng.config.physics, solver="pallas", solver_predicated="on",
            ),
        )
        s2, metrics = _run_homed(eng, 6)
        assert np.isfinite(np.asarray(s2.transform.x)).all()
        assert int(metrics["active_count"]) > 0
        e2 = _event_rows(s2)
        assert any(e2.values())  # events still flow with the Pallas solver
