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
    step, place, unplace, _ctl = make_homed_step(
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
        step, place, unplace, _ctl = make_homed_step(eng, mesh, headroom=8.0)
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
        step, place, unplace, _ctl = make_homed_step(
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
        step, place, unplace, _ctl = make_homed_step(eng, mesh, headroom=1.6)
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


class TestLiveControlPlane:
    """Round 5 (VERDICT r4 next #7): host spawn/despawn DURING a homed run
    inserts into / clears from the owning band's chunk — no re-placement.
    Reference anchor: spawn as a live control-plane fan-out,
    gameEngine.js:1651-1670."""

    def _engine(self, n_total=384, n_spawned=255):
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=7,
            spatial=dict(cell_size=100.0, max_neighbors=64, cell_capacity=32),
            physics=dict(sub_step_count=2, gravity=(0.0, 0.0)),
        ))
        eng.register_entity_class(Boid, n_total - 1)
        eng.init()
        rng = np.random.default_rng(3)
        eng.spawn_batch(
            "Boid", n_spawned,
            x=rng.uniform(50, 1950, n_spawned).astype(np.float32),
            y=rng.uniform(50, 1550, n_spawned).astype(np.float32),
            vx=rng.uniform(-3, 3, n_spawned).astype(np.float32),
            vy=rng.uniform(-3, 3, n_spawned).astype(np.float32),
        )
        eng._flush_pending()
        return eng

    @staticmethod
    def _spawn_args(k=40):
        rng = np.random.default_rng(77)
        return dict(
            x=rng.uniform(100, 1900, k).astype(np.float32),
            y=rng.uniform(100, 1500, k).astype(np.float32),
            vx=rng.uniform(-2, 2, k).astype(np.float32),
            vy=rng.uniform(-2, 2, k).astype(np.float32),
        )

    def test_live_insert_bit_exact_vs_replacement(self):
        mesh = make_mesh(D, axis_name="slab")
        K = 40

        # --- live path: run 5, insert mid-run, run 5 more -------------
        eng1 = self._engine()
        step1, place1, unplace1, ctl1 = make_homed_step(eng1, mesh, headroom=8.0)
        w1, g1 = place1(eng1.world)
        ins = eng1.input.snapshot()
        for _ in range(5):
            w1, g1, _m = step1(w1, g1, ins)
        new1 = eng1.spawn_batch("Boid", K, **self._spawn_args(K))
        eng1._flush_pending()  # applies to the (stale) scratch world
        assert new1.size == K
        rows1 = ctl1.pack_rows(eng1.world, new1)
        w1, g1, denied = ctl1.insert(w1, g1, rows1, new1)
        assert int(jax.device_get(denied)) == 0
        for _ in range(5):
            w1, g1, m1 = step1(w1, g1, ins)
        s_live = unplace1(w1, g1)

        # --- reference path: unplace, apply the same spawns, RE-PLACE -
        eng2 = self._engine()
        step2, place2, unplace2, _c2 = make_homed_step(eng2, mesh, headroom=8.0)
        w2, g2 = place2(eng2.world)
        for _ in range(5):
            w2, g2, _m = step2(w2, g2, ins)
        eng2.world = unplace2(w2, g2)
        new2 = eng2.spawn_batch("Boid", K, **self._spawn_args(K))
        eng2._flush_pending()
        np.testing.assert_array_equal(new1, new2)  # same pool claims
        w2, g2 = place2(eng2.world)
        for _ in range(5):
            w2, g2, m2 = step2(w2, g2, ins)
        s_rep = unplace2(w2, g2)

        _assert_exact(s_live, s_rep)
        assert int(m1["active_count"]) == 255 + K + 1
        assert int(m1["active_count"]) == int(m2["active_count"])

    def test_live_remove_bit_exact_vs_replacement(self):
        from multithreadedgameengine_tpu.parallel.halo import (
            entity_leaf_specs, pack_world_rows, unpack_world_rows,
        )
        import jax.numpy as jnp

        mesh = make_mesh(D, axis_name="slab")

        eng1 = self._engine()
        # victims must be ACTIVE gids (the interleaved pool's claims are
        # not contiguous; unclaimed slots are parked rows whose removal
        # changes nothing)
        victims = np.sort(eng1.active_indices("Boid"))[:5].astype(np.int32)
        step1, place1, unplace1, ctl1 = make_homed_step(eng1, mesh, headroom=8.0)
        w1, g1 = place1(eng1.world)
        ins = eng1.input.snapshot()
        for _ in range(5):
            w1, g1, _m = step1(w1, g1, ins)
        w1, g1, removed = ctl1.remove(w1, g1, victims)
        assert int(jax.device_get(removed)) == victims.size
        for _ in range(5):
            w1, g1, m1 = step1(w1, g1, ins)
        s_live = unplace1(w1, g1)

        eng2 = self._engine()
        step2, place2, unplace2, _c2 = make_homed_step(eng2, mesh, headroom=8.0)
        w2, g2 = place2(eng2.world)
        for _ in range(5):
            w2, g2, _m = step2(w2, g2, ins)
        w_mid = unplace2(w2, g2)
        specs = entity_leaf_specs(w_mid)
        rows = np.array(jax.device_get(pack_world_rows(w_mid, specs)))
        rows[victims] = 0
        w_mid = unpack_world_rows(jnp.asarray(rows), w_mid, specs)
        w2, g2 = place2(w_mid)
        for _ in range(5):
            w2, g2, m2 = step2(w2, g2, ins)
        s_rep = unplace2(w2, g2)

        _assert_exact(s_live, s_rep)
        assert int(m1["active_count"]) == 256 - victims.size
        assert int(m1["active_count"]) == int(m2["active_count"])

    def test_insert_denied_when_band_chunk_full(self):
        """Capacity guard: spawning into a band whose chunk is full must
        DENY (count returned) and leave the placed population intact —
        never silently drop or overwrite rows."""
        mesh = make_mesh(D, axis_name="slab")
        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=7,
            spatial=dict(cell_size=100.0, max_neighbors=64, cell_capacity=32),
            physics=dict(sub_step_count=2, gravity=(0.0, 0.0)),
        ))
        eng.register_entity_class(Boid, 383)
        eng.init()
        rng = np.random.default_rng(3)
        # ALL actives in band 7 (y in [1400, 1600)); the 128 unclaimed pool
        # rows park on band 0
        eng.spawn_batch(
            "Boid", 255,
            x=rng.uniform(50, 1950, 255).astype(np.float32),
            y=rng.uniform(1410, 1590, 255).astype(np.float32),
        )
        eng._flush_pending()
        # headroom 5.5: n_cap = ceil(384/8*5.5) = 264 — band 7's 255
        # residents leave only 9 free slots
        step, place, unplace, ctl = make_homed_step(eng, mesh, headroom=5.5)
        w, g = place(eng.world)
        orig_active = np.sort(eng.active_indices("Boid"))
        K = 64
        new = eng.spawn_batch(
            "Boid", K,
            x=np.full(K, 1000.0, np.float32),
            y=np.full(K, 1550.0, np.float32),  # band 7, nearly full
        )
        eng._flush_pending()
        assert new.size == K
        rows = ctl.pack_rows(eng.world, new)
        w, g, denied = ctl.insert(w, g, rows, new)
        n_denied = int(jax.device_get(denied))
        assert n_denied > 0
        snap = unplace(w, g)
        active = np.asarray(snap.transform.active)
        # every original entity survived; exactly K - denied inserts landed
        assert active[orig_active].all()
        assert active.sum() == 256 + K - n_denied


class TestAdversarialMigration:
    """Round 5 (VERDICT r4 next #9): the quota/violator edge cases —
    pathological piles that cross one seam together, multi-frame denial
    with retry, and despawn-at-the-seam. The class of bug these hunt is
    real: cfdbe5f fixed denied-mover + admitted-arrival capacity counting
    silently deleting entities. Every test asserts 50-frame conservation
    (no entity lost or duplicated)."""

    def _wall_engine(self, n=255, vy=40.0):
        """Everyone starts in band 1 (y in [200, 400)) moving DOWN fast:
        the whole population crosses seams together, frame after frame."""
        from multithreadedgameengine_tpu import EntityClass
        from multithreadedgameengine_tpu.components import (
            Collider, RigidBody, SpriteRenderer,
        )

        class Faller(EntityClass):
            components = [RigidBody, Collider, SpriteRenderer]
            uses_neighbors = False

            @classmethod
            def setup(cls, ctx):
                return {"collider.radius": 3.0, "collider.visual_range": 20.0,
                        "rigid_body.max_vel": 100.0}

        eng = Engine(make_config(
            world_width=2000.0, world_height=1600.0, seed=5,
            spatial=dict(cell_size=100.0, max_neighbors=8, cell_capacity=32),
            physics=dict(sub_step_count=1, gravity=(0.0, 0.0)),
        ))
        eng.register_entity_class(Faller, n)
        eng.init()
        rng = np.random.default_rng(11)
        eng.spawn_batch(
            "Faller", n,
            x=rng.uniform(50, 1950, n).astype(np.float32),
            y=rng.uniform(210, 390, n).astype(np.float32),
            vy=np.full(n, vy, np.float32),
        )
        eng._flush_pending()
        return eng

    def test_mass_seam_crossing_under_tight_quota(self):
        """All 255 entities cross band seams together while the per-pair
        migration route cap is squeezed (mig_oversub=0.25): movers beyond
        the quota stay as violators and RETRY next frame; nobody is ever
        lost, and because this scene has no neighbor passes the violators
        degrade NOTHING — trajectories stay bit-exact throughout (the
        boundary-bounce keeps the population crossing forever, so a small
        violator count persists by design; what matters is conservation
        and exactness, not drain-to-zero)."""
        eng = self._wall_engine()
        mesh = make_mesh(D, axis_name="slab")
        step, place, unplace, _ctl = make_homed_step(
            eng, mesh, headroom=8.0, mig_oversub=0.25)
        world, gid = place(eng.world)
        ins = eng.input.snapshot()
        saw_quota_denial = False
        for k in range(60):
            world, gid, m = step(world, gid, ins)
            assert int(jax.device_get(m["active_count"])) == 256, f"step {k}"
            if int(jax.device_get(m["home_violators"])) > 0:
                saw_quota_denial = True
        assert saw_quota_denial  # the quota genuinely bound
        snap = unplace(world, gid)
        assert int(np.asarray(snap.transform.active).sum()) == 256
        # multi-frame-denied violators whose position drifts beyond the
        # ADJACENT solver band degrade to boundary-only physics (the
        # documented route-overflow class — so no exactness claim here),
        # but state must stay finite and in-world, and no gid may ever be
        # lost or duplicated across the mesh
        y = np.asarray(snap.transform.y)[np.asarray(snap.transform.active)]
        assert np.isfinite(y).all() and (y >= 0).all() and (y <= 1600).all()
        g = np.asarray(jax.device_get(gid))
        occ = np.sort(g[g >= 0])
        assert np.unique(occ).size == occ.size == 256

    def test_despawn_at_the_seam(self):
        """Tick-despawn fires exactly at a band boundary (y > 800 = the
        3->4 seam): entities despawn the same frame they would migrate.
        Active counts track the single-device step exactly for 50 frames."""
        from multithreadedgameengine_tpu import EntityClass
        from multithreadedgameengine_tpu.components import (
            Collider, RigidBody, SpriteRenderer,
        )
        import jax.numpy as jnp

        class SeamDier(EntityClass):
            components = [RigidBody, Collider, SpriteRenderer]
            uses_neighbors = False

            @classmethod
            def setup(cls, ctx):
                return {"collider.radius": 3.0, "collider.visual_range": 20.0,
                        "rigid_body.max_vel": 100.0}

            @staticmethod
            def tick(ctx):
                return {"despawn": ctx.y > 800.0}

        def build():
            eng = Engine(make_config(
                world_width=2000.0, world_height=1600.0, seed=5,
                spatial=dict(cell_size=100.0, max_neighbors=8,
                             cell_capacity=32),
                physics=dict(sub_step_count=1, gravity=(0.0, 0.1)),
            ))
            eng.register_entity_class(SeamDier, 255)
            eng.init()
            rng = np.random.default_rng(13)
            eng.spawn_batch(
                "SeamDier", 255,
                x=rng.uniform(50, 1950, 255).astype(np.float32),
                y=rng.uniform(600, 795, 255).astype(np.float32),
                vy=rng.uniform(1.0, 8.0, 255).astype(np.float32),
            )
            eng._flush_pending()
            return eng

        eng1 = build()
        eng2 = build()
        mesh = make_mesh(D, axis_name="slab")
        step, place, unplace, _ctl = make_homed_step(eng2, mesh, headroom=8.0)
        world, gid = place(eng2.world)
        ins = eng2.input.snapshot()
        for k in range(50):
            eng1.step(1)
            eng1.sync()
            world, gid, m = step(world, gid, ins)
            a1 = int(np.asarray(eng1.snapshot().transform.active).sum())
            a2 = int(jax.device_get(m["active_count"]))
            assert a1 == a2, f"active diverged at step {k}: {a1} vs {a2}"
        s1 = eng1.snapshot()
        s2 = unplace(world, gid)
        _assert_exact(s1, s2)
        assert int(np.asarray(s1.transform.active).sum()) < 255  # some died

    def test_full_chunk_denial_across_consecutive_frames(self):
        """A permanently-full destination (tight headroom, hard pile into
        the bottom band) denies movers for MANY consecutive frames; each
        retries every frame, none is lost, and denial is visible in
        home_violators the whole time."""
        eng = make_balls_engine(
            n_balls=255, spawn=True, seed=13,
            world_width=1600.0, world_height=1000.0,
            spatial=dict(cell_size=50.0, max_neighbors=32),
            physics=dict(
                sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
                boundary_elasticity=0.0, collision_response_strength=0.8,
                gravity=(0.0, 4.0),  # slam everyone into the floor band
            ),
        )
        eng._flush_pending()
        mesh = make_mesh(D, axis_name="slab")
        # headroom 1.6: fits the uniform initial placement (largest band
        # holds 50 of n_cap=52) but the gravity-4 pile saturates the floor
        # chunks within a few frames
        step, place, unplace, _ctl = make_homed_step(eng, mesh, headroom=1.6)
        world, gid = place(eng.world)
        ins = eng.input.snapshot()
        consecutive = 0
        max_consecutive = 0
        for k in range(50):
            world, gid, m = step(world, gid, ins)
            assert int(jax.device_get(m["active_count"])) == 256, f"step {k}"
            if int(jax.device_get(m["home_violators"])) > 0:
                consecutive += 1
                max_consecutive = max(max_consecutive, consecutive)
            else:
                consecutive = 0
        # the pile must have saturated the floor chunks for several frames
        # in a row (otherwise this test exercises nothing)
        assert max_consecutive >= 3, max_consecutive
        snap = unplace(world, gid)
        assert int(np.asarray(snap.transform.active).sum()) == 256
        g = np.asarray(jax.device_get(gid))
        occ = np.sort(g[g >= 0])
        # no duplicated gid anywhere across the mesh
        assert np.unique(occ).size == occ.size == 256
