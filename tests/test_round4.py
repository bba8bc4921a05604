"""Round-4 regression tests: vectorized pool claims, checkpoint stamp
restore, and layout-resident positions (physics.position_residency)."""

import numpy as np
import pytest

from multithreadedgameengine_tpu.state import EntityPool


RES_PHYSICS = dict(
    sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
    boundary_elasticity=0.0, collision_response_strength=0.8,
    gravity=(0.0, 0.5), rebin_interval=3, solver="pallas",
    solver_predicated="on",
)


def _res_engine(residency: str, n=250, seed=11, **phys):
    from multithreadedgameengine_tpu.models.balls import make_balls_engine

    return make_balls_engine(
        n_balls=n, seed=seed,
        physics=dict(RES_PHYSICS, position_residency=residency, **phys),
    )


def _assert_worlds_equal(a, b, tag=""):
    sa, sb = a.snapshot(), b.snapshot()
    for path in (
        "transform.x", "transform.y", "transform.active",
        "rigid_body.px", "rigid_body.py", "rigid_body.vx", "rigid_body.vy",
        "rigid_body.collision_count",
    ):
        comp, f = path.split(".")
        va = np.asarray(getattr(getattr(sa, comp), f))
        vb = np.asarray(getattr(getattr(sb, comp), f))
        assert np.array_equal(va, vb), (tag, path)


class TestPositionResidency:
    """physics.position_residency keeps x/y/px/py layout-resident across
    frames (ops/physics_grid.resident_persistent_step). Every case asserts
    BIT-EXACT trajectories vs position_residency='off' — including px/py,
    which are synced back to entity order on demand."""

    def test_auto_enables_and_matches_off(self):
        a, b = _res_engine("auto"), _res_engine("off")
        a.step(1)
        assert a._residency_on and not b._residency_on
        a.step(9)
        b.step(10)
        _assert_worlds_equal(a, b, "plain")

    def test_mouse_forces_and_pinned_row(self):
        # the Ball tick's mouse repulsion evaluates in layout space; the
        # mouse's host-written position reaches its layout slot per frame
        a, b = _res_engine("on"), _res_engine("off")
        for e in (a, b):
            e.input.set_mouse(500.0, 300.0, present=True)
            e.input.mouse_button(0, True)
        a.step(4); b.step(4)
        for e in (a, b):
            e.input.set_mouse(900.0, 350.0, present=True)
        a.step(5); b.step(5)
        _assert_worlds_equal(a, b, "mouse")

    def test_host_mutation_syncs_and_rebuilds(self):
        a, b = _res_engine("on", 400, 5), _res_engine("off", 400, 5)
        a.step(5); b.step(5)
        for e in (a, b):
            act = e.active_indices("Ball")
            e.despawn_batch(act[10:40])
            e.spawn_batch(
                "Ball", 20,
                x=np.linspace(100, 3000, 20).astype(np.float32),
                y=np.full(20, 200, np.float32),
            )
        a.step(7); b.step(7)
        _assert_worlds_equal(a, b, "mutation")

    def test_frameplan_resident_parity(self):
        """Round 5: plan chunks trace the RESIDENT variant (op frames
        rebuild via the in-plan bin-cache invalidation; op-free frames ride
        the FAST layout branch) — whole-trajectory equality vs
        position_residency='off' through a churning plan."""
        a, b = _res_engine("on", 200, 9), _res_engine("off", 200, 9)
        a.step(3); b.step(3)
        for e, r in ((a, np.random.default_rng(42)), (b, np.random.default_rng(42))):
            plan = e.begin_plan()
            for _ in range(6):
                act = e.active_indices("Ball")
                plan.despawn_batch(r.choice(act, size=16, replace=False))
                plan.spawn_batch(
                    "Ball", 16,
                    x=r.uniform(100, 8000, 16).astype(np.float32),
                    y=r.uniform(100, 900, 16).astype(np.float32),
                )
                plan.next_frame()
            e.run_plan(plan, max_chunk=4)
        a.step(6); b.step(6)
        _assert_worlds_equal(a, b, "plan")

    def test_frameplan_resident_sparse_ops_parity(self):
        """Sparse plans (most frames op-free) are where resident plans pay
        off — those frames take the FAST branch. Equality vs 'off' must
        hold across the op/FAST interleaving, including the frames right
        after each invalidation."""
        a, b = _res_engine("on", 200, 9), _res_engine("off", 200, 9)
        a.step(3); b.step(3)
        for e, r in ((a, np.random.default_rng(4)), (b, np.random.default_rng(4))):
            plan = e.begin_plan()
            for f in range(12):
                if f in (0, 5):  # two op frames, ten FAST-eligible frames
                    act = e.active_indices("Ball")
                    plan.despawn_batch(r.choice(act, size=8, replace=False))
                    plan.spawn_batch(
                        "Ball", 8,
                        x=r.uniform(100, 8000, 8).astype(np.float32),
                        y=r.uniform(100, 900, 8).astype(np.float32),
                    )
                plan.next_frame()
            e.run_plan(plan, max_chunk=6)
        a.step(6); b.step(6)
        _assert_worlds_equal(a, b, "sparse plan")

    def test_checkpoint_roundtrip(self, tmp_path):
        from multithreadedgameengine_tpu.checkpoint import (
            load_checkpoint, save_checkpoint,
        )

        a = _res_engine("on", 220, 3)
        a.step(7)
        p = str(tmp_path / "res.npz")
        save_checkpoint(a, p)
        ref = _res_engine("on", 220, 3)
        ref.step(7)
        a.step(10)
        load_checkpoint(a, p)
        a.step(10)
        ref.step(10)
        _assert_worlds_equal(a, ref, "checkpoint")

    def test_unsafe_tick_disables_auto_and_rejects_on(self):
        from multithreadedgameengine_tpu import (
            Collider, Engine, EntityClass, RigidBody, make_config,
        )

        class NeighborTick(EntityClass):
            components = [RigidBody, Collider]
            uses_neighbors = True

            @classmethod
            def setup(cls, ctx):
                # real collider radius so the grid solver (and therefore
                # the residency gate) engages
                return {"collider.radius": 5.0}

            @staticmethod
            def tick(ctx):
                return {"rigid_body.ax": ctx.neighbor_count * 0.0}

        def build(residency):
            eng = Engine(make_config(
                world_width=400.0, world_height=300.0,
                physics=dict(
                    solver="pallas", rebin_interval=2,
                    position_residency=residency,
                ),
            ))
            eng.register_entity_class(NeighborTick, 4)
            eng.init()
            eng.spawn("NeighborTick", x=100.0, y=100.0)
            eng.step(1)
            return eng

        eng = build("auto")
        assert not eng._residency_on  # fell back silently
        with pytest.raises(ValueError, match="not layout-safe"):
            build("on")


class TestClaimMany:
    def test_matches_sequential_claims(self):
        a = EntityPool(100, 40)
        b = EntityPool(100, 40)
        seq = [b.claim() for _ in range(17)]
        vec = a.claim_many(17)
        assert vec.tolist() == seq
        assert a.active_count == b.active_count == 17
        assert a.free_count == b.free_count

    def test_matches_after_interleaved_release(self):
        a = EntityPool(0, 32)
        b = EntityPool(0, 32)
        for p in (a, b):
            first = p.claim_many(10) if p is a else [p.claim() for _ in range(10)]
            p.release_many(list(first[2:5]))
        seq = [b.claim() for _ in range(8)]
        vec = a.claim_many(8)
        assert vec.tolist() == seq

    def test_exhaustion_truncates(self):
        p = EntityPool(0, 5)
        got = p.claim_many(9)
        assert got.size == 5
        assert p.claim_many(3).size == 0
        assert p.free_count == 0
        # released indices come back in LIFO caller order
        p.release_many([got[4], got[1]])
        assert p.claim_many(2).tolist() == [int(got[1]), int(got[4])]

    def test_mask_consistency(self):
        p = EntityPool(7, 20)
        got = p.claim_many(6)
        for i in got:
            assert not p.is_free(int(i))
        assert np.array_equal(np.sort(p.active_indices()), np.sort(got))


class TestDeviceScreenEvents:
    """onScreen Enter/Exit diffed on device (round 4): prev_onscreen is a
    world leaf, transitions compact into one packed table, and chunked
    stepping / FramePlans carry per-frame copies through the event log —
    parity with per-frame stepping (the old host-diff semantics)."""

    def _build(self, events, event_chunk=1):
        from multithreadedgameengine_tpu import (
            Collider, Engine, EntityClass, RigidBody, SpriteRenderer,
            make_config,
        )

        class Drifter(EntityClass):
            components = [RigidBody, Collider, SpriteRenderer]
            uses_neighbors = False
            on_screen_enter = staticmethod(
                lambda i: events.append(("enter", int(i)))
            )
            on_screen_exit = staticmethod(
                lambda i: events.append(("exit", int(i)))
            )

            @classmethod
            def setup(cls, ctx):
                return {"collider.radius": 5.0, "rigid_body.max_vel": 500.0}

        eng = Engine(make_config(
            canvas_width=400, canvas_height=300,
            world_width=4000.0, world_height=600.0,
            logic=dict(screen_events=True, event_chunk=event_chunk),
            physics=dict(gravity=(0.0, 0.0), max_collision_pairs=1),
        ))
        eng.register_entity_class(Drifter, 6)
        eng.init()
        eng.input.camera_x = 200.0
        eng.input.camera_y = 150.0
        # two entities drifting right: one starts on screen and exits, one
        # starts off screen and enters
        eng.spawn("Drifter", x=100.0, y=150.0, vx=40.0)
        eng.spawn("Drifter", x=-600.0, y=150.0, vx=40.0)
        return eng

    def _run(self, chunk, frames=24):
        events = []
        eng = self._build(events, event_chunk=chunk)
        if chunk > 1:
            eng.step(frames)
        else:
            for _ in range(frames):
                eng.step(1)
        eng.sync()
        return events

    def test_chunked_matches_per_frame(self):
        per_frame = self._run(1)
        chunked = self._run(8)
        assert per_frame  # enter + exit both observed
        assert any(k == "enter" for k, _ in per_frame)
        assert any(k == "exit" for k, _ in per_frame)
        assert chunked == per_frame

    def test_plan_matches_per_frame(self):
        events = []
        eng = self._build(events, event_chunk=4)
        plan = eng.begin_plan()
        for _ in range(24):
            plan.next_frame()
        eng.run_plan(plan, max_chunk=8)
        eng.sync()
        assert events == self._run(1)


class TestEngineAssetPreload:
    """Engine.load_assets — the preloadAssets flow (gameEngine.js:805-889):
    real PNG files + TexturePacker JSON from disk → big atlas + registry
    through one call."""

    def test_png_files_from_disk_roundtrip(self, tmp_path):
        from multithreadedgameengine_tpu.models.predators import (
            make_predators_engine,
        )
        from multithreadedgameengine_tpu.render.headless import encode_png
        from multithreadedgameengine_tpu.render.procgen import (
            make_character_sheet, make_demo_textures,
        )
        import json

        # write REAL PNG + JSON files to disk (LPC-style layout, procgen art)
        sheet_img, sheet_meta = make_character_sheet(seed=7)
        png = tmp_path / "civil1.png"
        png.write_bytes(encode_png(sheet_img))
        meta_p = tmp_path / "civil1.json"
        meta_p.write_text(json.dumps(sheet_meta))
        tex = make_demo_textures()["bunny"]
        tex_p = tmp_path / "bunny.png"
        tex_p.write_bytes(encode_png(tex))

        eng = make_predators_engine(n_prey=8, n_predators=1, n_lights=1)
        atlas = eng.load_assets(
            images={"bunny": str(tex_p)},
            sheets={"civil1": (str(png), str(meta_p))},
        )
        assert eng.atlas is atlas
        # every sheet frame landed in the atlas, pixels intact
        name0 = next(iter(sheet_meta["frames"]))
        f = sheet_meta["frames"][name0]["frame"]
        src = sheet_img[f["y"]:f["y"]+f["h"], f["x"]:f["x"]+f["w"]]
        np.testing.assert_array_equal(
            atlas.frame_image(f"civil1/{name0}"), src
        )
        np.testing.assert_array_equal(atlas.frame_image("bunny"), tex)
        assert "_lightGradient" in atlas.frames  # built-in injected
        # registry ids line up (sheet pre-registered by the scene: idempotent)
        assert eng.sprites.sheet_id("civil1") >= 1
        assert eng.sprites.texture_id("bunny") >= 1
        # the scene still steps with the loaded assets
        eng.step(2)
        assert int(eng.metrics["active_count"]) > 0

    def test_constructor_images_arg(self, tmp_path):
        from multithreadedgameengine_tpu import Engine, make_config
        from multithreadedgameengine_tpu.render.headless import encode_png

        img = np.zeros((8, 8, 4), np.uint8)
        img[..., 0] = 200
        img[..., 3] = 255
        p = tmp_path / "dot.png"
        p.write_bytes(encode_png(img))
        eng = Engine(make_config(world_width=100.0, world_height=100.0),
                     images={"dot": str(p)})
        assert eng.atlas is not None
        np.testing.assert_array_equal(eng.atlas.frame_image("dot"), img)
        assert eng.sprites.texture_id("dot") >= 1


class TestHeadlessSpritesAndGlow:
    """render/headless.py draws real atlas sprites + additive light glows
    (VERDICT r3 missing #2): engine.screenshot() can now verify what the
    browser client shows."""

    def _scene(self):
        from multithreadedgameengine_tpu import (
            Collider, Engine, EntityClass, LightEmitter, RigidBody,
            SpriteRenderer, make_config,
        )

        class Sprite(EntityClass):
            components = [RigidBody, Collider, SpriteRenderer]
            uses_neighbors = False

        class Lamp(EntityClass):
            components = [LightEmitter, SpriteRenderer]
            uses_neighbors = False

            @classmethod
            def setup(cls, ctx):
                return {
                    "light.light_color": 0x00FF00,
                    "light.light_intensity": 2500.0,
                }

        eng = Engine(make_config(
            canvas_width=200, canvas_height=160,
            world_width=200.0, world_height=160.0,
            lighting=dict(enabled=True, lighting_ambient=1.0),
        ))
        eng.register_entity_class(Sprite, 2)
        eng.register_entity_class(Lamp, 1)
        eng.init()
        eng.input.camera_x = 0.0
        eng.input.camera_y = 0.0
        return eng, Sprite, Lamp

    def test_atlas_sprite_blit_and_fallback(self):
        from multithreadedgameengine_tpu.render.headless import render_frame

        eng, *_ = self._scene()
        # a solid 10x10 blue texture; static textures ride the anim lane
        tex = np.zeros((10, 10, 4), np.uint8)
        tex[..., 2] = 255
        tex[..., 3] = 255
        eng.load_assets(images={"blue": tex})
        tid = eng.sprites.texture_id("blue")
        eng.spawn(
            "Sprite", x=50.0, y=50.0,
            **{"sprite.animation_state": float(tid),
               "sprite.anchor_x": 0.5, "sprite.anchor_y": 0.5,
               "sprite.tint": 0xFFFFFF},
        )
        eng.step(1)
        img = render_frame(eng)
        # blue square centered at (50, 50): blue dominant, red/green ~0
        patch = img[47:53, 47:53].astype(int)
        assert patch[..., 2].mean() > 150
        assert patch[..., 0].mean() < 60

    def test_sprite_scale_rotation_tint(self):
        from multithreadedgameengine_tpu.render.headless import render_frame

        eng, *_ = self._scene()
        tex = np.zeros((4, 16, 4), np.uint8)  # wide white bar
        tex[..., :3] = 255
        tex[..., 3] = 255
        eng.load_assets(images={"bar": tex})
        tid = eng.sprites.texture_id("bar")
        eng.spawn(
            "Sprite", x=100.0, y=80.0, rotation=float(np.pi / 2),
            **{"sprite.animation_state": float(tid),
               "sprite.anchor_x": 0.5, "sprite.anchor_y": 0.5,
               "sprite.scale_x": 2.0, "sprite.scale_y": 2.0,
               "sprite.tint": 0xFF0000},
        )
        eng.step(1)
        img = render_frame(eng).astype(int)
        # rotated 90°: the 32px-long bar now spans VERTICALLY, tinted red
        assert img[80 + 12, 100, 0] > 150  # far along the vertical axis
        assert img[80 + 12, 100, 2] < 60   # tint killed blue
        assert img[80, 100 + 12, 0] < 60   # horizontal stays background

    def test_glow_layer_additive(self):
        from multithreadedgameengine_tpu.render.headless import render_frame

        eng, _s, _l = self._scene()
        base = render_frame(eng).astype(int)
        eng.spawn("Lamp", x=100.0, y=80.0)
        eng.step(1)
        lit = render_frame(eng).astype(int)
        # green glow brightens the light's neighborhood vs the empty scene
        assert lit[80, 100, 1] > base[80, 100, 1] + 20
        # far corner unaffected by the glow splat (radius = sqrt(2500) = 50)
        assert abs(int(lit[5, 5, 1]) - int(base[5, 5, 1])) < 25


def test_zoom_at_keeps_cursor_world_point_fixed():
    """Wheel zoom-to-cursor (gameEngine.js:1426-1450): the world point under
    the given screen coordinate is invariant across zoom_at calls."""
    from multithreadedgameengine_tpu.inputs import InputController

    inp = InputController()
    inp.set_camera(x=120.0, y=40.0, zoom=0.5)
    sx, sy = 300.0, 200.0
    wx0 = inp.camera_x + sx / inp.camera_zoom
    wy0 = inp.camera_y + sy / inp.camera_zoom
    for f in (1.1, 1.1, 0.9, 2.0):
        inp.zoom_at(sx, sy, f)
        assert inp.camera_x + sx / inp.camera_zoom == pytest.approx(wx0)
        assert inp.camera_y + sy / inp.camera_zoom == pytest.approx(wy0)
    assert inp.camera_zoom == pytest.approx(0.5 * 1.1 * 1.1 * 0.9 * 2.0)


class TestEventOverlap:
    """logic.event_overlap double-buffers the event log: hooks fire while
    the NEXT chunk executes — every event still fires, in the same order,
    just up to one chunk later."""

    def _run(self, overlap, n=10, chunk=3):
        from multithreadedgameengine_tpu import (
            Collider, Engine, EntityClass, RigidBody, SpriteRenderer,
            make_config,
        )

        calls = []

        class Pair(EntityClass):
            components = [RigidBody, Collider, SpriteRenderer]
            uses_neighbors = False
            on_collision_enter = staticmethod(
                lambda ctx, me, other: calls.append(("enter", me, other))
            )
            on_collision_stay = staticmethod(
                lambda ctx, me, other: calls.append(("stay", me, other))
            )

            @classmethod
            def setup(cls, ctx):
                return {
                    "collider.radius": 10.0, "collider.visual_range": 60.0,
                    "rigid_body.static": True,
                }

        eng = Engine(make_config(
            world_width=500.0, world_height=500.0,
            spatial=dict(cell_size=50.0, max_neighbors=8),
            logic=dict(collision_events=True, event_chunk=chunk,
                       event_overlap=overlap),
        ))
        eng.register_entity_class(Pair, 2)
        eng.init()
        eng.spawn("Pair", x=100.0, y=100.0)
        eng.spawn("Pair", x=110.0, y=100.0)
        eng.step(n)
        eng.sync()
        return calls

    def test_same_events_same_order(self):
        base = self._run(False)
        over = self._run(True)
        assert base  # enters + stays observed
        assert over == base


def test_spawn_auto_reconciles_device_despawns():
    """VERDICT r3 weak #8: a tick returning {'despawn': True} frees slots the
    host pool can't see; spawn()/spawn_batch() now reconcile automatically on
    apparent exhaustion instead of returning None."""
    import jax.numpy as jnp

    from multithreadedgameengine_tpu import (
        Collider, Engine, EntityClass, RigidBody, make_config,
    )

    class Ephemeral(EntityClass):
        components = [RigidBody, Collider]
        uses_neighbors = False

        @classmethod
        def setup(cls, ctx):
            return {"collider.radius": 3.0}

        @staticmethod
        def tick(ctx):
            return {"despawn": ctx.x > 50.0}  # despawns immediately

    eng = Engine(make_config(world_width=400.0, world_height=300.0))
    eng.register_entity_class(Ephemeral, 4)
    eng.init()
    for _ in range(4):
        assert eng.spawn("Ephemeral", x=100.0, y=50.0) is not None
    eng.step(2)  # all four despawn device-side
    # host pool still thinks the slots are claimed — the retry reconciles
    assert eng.spawn("Ephemeral", x=100.0, y=60.0) is not None
    eng.step(2)
    got = eng.spawn_batch("Ephemeral", 3, x=100.0, y=70.0)
    assert got.size == 3


class TestBandedBoundary:
    """Round-4 banded boundary (physics.boundary_band): the position clamp
    folds into the pair kernel and px/py bounce writes shrink to the
    layout's world-border bands. Must stay BIT-EXACT vs the full-layout
    boundary ('off') and vs position_residency='off' whenever the max_vel
    drift bound holds."""

    W, H = 30_000.0, 6_000.0  # wide: cols_pad >= 512 so the band engages

    def _eng(self, residency, band="auto", seed=21, elasticity=0.8, w=None):
        from multithreadedgameengine_tpu.models.balls import make_balls_engine

        eng = make_balls_engine(
            n_balls=300, seed=seed, world_width=w or self.W,
            world_height=self.H,
            physics=dict(
                RES_PHYSICS, position_residency=residency,
                boundary_band=band, boundary_elasticity=elasticity,
            ),
        )
        return eng

    @staticmethod
    def _border_movers(W, H):
        # fast outward movers at every border + an interior control group
        import numpy as np

        xs = np.array(
            [50.0] * 10 + [W - 50.0] * 10
            + list(np.linspace(2000, W - 2000, 20)), np.float32,
        )
        ys = np.array(
            list(np.linspace(500, H - 500, 20))
            + [60.0] * 10 + [H - 60.0] * 10, np.float32,
        )
        vxs = np.array([-60.0] * 10 + [60.0] * 10 + [0.0] * 20, np.float32)
        vys = np.array([0.0] * 20 + [-60.0] * 10 + [60.0] * 10, np.float32)
        return xs, ys, vxs, vys

    def test_banded_matches_full_and_nonresident(self):
        import numpy as np

        engines = {
            "banded": self._eng("on", band="auto"),
            "full": self._eng("on", band="off"),
            "off": self._eng("off", band="off"),
        }
        xs, ys, vxs, vys = self._border_movers(self.W, self.H)
        for eng in engines.values():
            eng.despawn_batch(eng.active_indices("Ball"))
            eng.spawn_batch("Ball", 40, x=xs, y=ys, vx=vxs, vy=vys)
            eng.step(6)
        m = engines["banded"].metrics
        assert int(np.asarray(m["boundary_band_drift"])) == 0
        _assert_worlds_equal(engines["banded"], engines["full"], "band-vs-full")
        _assert_worlds_equal(engines["banded"], engines["off"], "band-vs-off")
        # the border movers actually bounced (px reflected about the clamp)
        s = engines["banded"].snapshot()
        x = np.asarray(s.transform.x)
        r = np.asarray(s.collider.radius)
        a = np.asarray(s.transform.active)
        assert (x[a] >= r[a] - 1e-4).all()
        assert (x[a] <= self.W - r[a] + 1e-4).all()

    def test_banded_large_lane_pad(self):
        """Regression (advisor r4, HIGH): at geometries where the column
        pad cp-(C+2) is large — here W=28700 gives C=383 solver cols, so
        cp=512 and a 127-lane pad — the right px-bounce band must span
        THROUGH the pad down to lane C-band_cells. The old 1+band_cells
        sizing put the whole right band inside the pad (start lane 384 >
        rightmost occupied lane 383): right-border entities got the
        in-kernel position clamp but never the velocity reflection, and
        boundary_band_drift could not see it."""
        import numpy as np

        W = 28_700.0
        engines = {
            "banded": self._eng("on", band="auto", w=W),
            "full": self._eng("on", band="off", w=W),
            "off": self._eng("off", band="off", w=W),
        }
        eng = engines["banded"]
        cfg, geom, _ = eng._solver_plan(eng._resolve_spatial())
        from multithreadedgameengine_tpu.ops.physics_grid import (
            _band_spec, _resident_dims,
        )

        C, cp, rows_buf = (
            geom.cols, _resident_dims(geom)[3], _resident_dims(geom)[6]
        )
        assert C == 383 and cp == 512, (C, cp)  # the pathological pad
        band, band_cells = _band_spec(cfg, geom, rows_buf, 100.0, True)
        assert band is not None  # banding must still engage here
        # the right band's slice start must reach the occupied lanes
        assert cp - band[3] <= C - band_cells, (band, band_cells)

        xs, ys, vxs, vys = self._border_movers(W, self.H)
        for e in engines.values():
            e.despawn_batch(e.active_indices("Ball"))
            e.spawn_batch("Ball", 40, x=xs, y=ys, vx=vxs, vy=vys)
            e.step(6)
        assert int(np.asarray(engines["banded"].metrics["boundary_band_drift"])) == 0
        _assert_worlds_equal(engines["banded"], engines["full"], "pad-band-vs-full")
        _assert_worlds_equal(engines["banded"], engines["off"], "pad-band-vs-off")

    def test_max_vel_raise_rederives_band(self):
        eng = self._eng("on", band="auto")
        eng.step(2)
        assert eng._band_vel_bound == 100.0
        act = eng.active_indices("Ball")
        # host write above the bound must invalidate the built step so the
        # band re-derives from the new max_vel
        eng.despawn_batch(act[:1])
        idx = eng.spawn_batch("Ball", 1, x=200.0, y=200.0,
                              **{"rigid_body.max_vel": 400.0})
        assert idx.size == 1
        assert eng._max_vel_seen == 400.0
        assert eng._step_fn is None  # rebuild scheduled
        eng.step(3)
        assert eng._band_vel_bound == 400.0


def test_batch_exhaustion_retry_excludes_inflight_claims():
    """Regression (round 4): spawn_batch's exhaustion-retry reconciles pools
    while the just-claimed slots are NOT yet active on device (their column
    writes apply after claiming) — reconcile_pools must exclude those
    in-flight claims or it releases them back and the retry hands out
    duplicates. Also: the retry must still reclaim GENUINE device-side
    despawns."""
    import numpy as np

    from multithreadedgameengine_tpu import (
        Collider, Engine, EntityClass, RigidBody, make_config,
    )

    class Fleeting(EntityClass):
        components = [RigidBody, Collider]
        uses_neighbors = False

        @classmethod
        def setup(cls, ctx):
            return {"collider.radius": 3.0}

        @staticmethod
        def tick(ctx):
            return {"despawn": ctx.x > 50.0}

    eng = Engine(make_config(world_width=400.0, world_height=300.0))
    eng.register_entity_class(Fleeting, 6)
    eng.init()
    # 1) pure exhaustion: nothing despawned device-side, so over-asking must
    #    TRUNCATE (never duplicate in-flight claims)
    got = eng.spawn_batch("Fleeting", 9, x=10.0, y=10.0)
    assert got.size == 6
    assert np.unique(got).size == 6
    assert eng.get_pool_stats("Fleeting")["available"] == 0
    # 2) two entities despawn device-side; a 5-ask reclaims exactly those two
    eng.despawn_batch(got[:4])
    eng.spawn_batch("Fleeting", 4, x=100.0, y=20.0)  # x>50: ticks despawn
    eng.step(2)
    got2 = eng.spawn_batch("Fleeting", 5, x=10.0, y=30.0)
    assert got2.size == 4  # the 4 device-despawned slots, nothing else
    assert np.unique(got2).size == 4


def test_residency_heterogeneous_max_vel_survives_plan_rebins():
    """Round-4 review: the non-resident plan path rebins flat/grad/meta but
    must ALSO refresh the solver_maxv layout, or later resident FAST frames
    clamp velocities through stale slots. Heterogeneous max_vel + plan
    churn + residency must stay bit-exact vs residency='off'."""
    a, b = _res_engine("on", 300, 21), _res_engine("off", 300, 21)
    rngs = (np.random.default_rng(4), np.random.default_rng(4))
    for e, r in zip((a, b), rngs):
        # per-entity max_vel spread (2..40) — the stale-layout canary
        act = e.active_indices("Ball")
        e.despawn_batch(act)
        e.spawn_batch(
            "Ball", 300,
            x=r.uniform(100, 8000, 300).astype(np.float32),
            y=r.uniform(100, 900, 300).astype(np.float32),
            **{"rigid_body.max_vel": r.uniform(2, 40, 300).astype(np.float32)},
        )
    a.step(4); b.step(4)
    for e, r in zip((a, b), rngs):
        plan = e.begin_plan()
        for _ in range(5):  # plan chunks run the NON-resident variant
            plan.next_frame()
        e.run_plan(plan, max_chunk=5)
    a.step(6); b.step(6)
    _assert_worlds_equal(a, b, "hetero-maxv")


class TestLazyReadbackChunk:
    """Lazy-readback chunks (Engine._build_step n_steps + ops/physics_grid.
    resident_lazy_frame/resident_sync_entity): mid-chunk FAST frames skip
    the entity-order readback; rebin frames and the chunk's last frame sync
    first. Chunked stepping must stay BIT-EXACT vs per-frame stepping (the
    eager readback every frame) and vs residency='off'."""

    def test_chunk_matches_per_frame_and_off(self):
        a = _res_engine("on", 300, 7)
        b = _res_engine("on", 300, 7)
        c = _res_engine("off", 300, 7)
        for e in (a, b, c):
            e.input.set_mouse(500.0, 300.0, present=True)
        a.step(12)                       # one chunk: lazy frames inside
        for _ in range(12):
            b.step(1)                    # eager full frame every time
        c.step(12)
        assert a._residency_on and b._residency_on
        _assert_worlds_equal(a, b, "chunk-vs-frame")
        _assert_worlds_equal(a, c, "chunk-vs-off")

    def test_chunk_with_overflow_rows(self):
        # pin solver capacity low and pile entities into few cells so some
        # rows live OUTSIDE the layout: lazy frames must evolve them in
        # entity order (tick forces + verlet + boundary fallback) exactly
        # as the eager path does
        import numpy as np

        def build(res):
            e = _res_engine(res, 200, 13, solver_capacity=8)
            r = np.random.default_rng(3)
            e.despawn_batch(e.active_indices("Ball"))
            e.spawn_batch(
                "Ball", 200,
                x=r.uniform(400.0, 460.0, 200).astype(np.float32),
                y=r.uniform(200.0, 260.0, 200).astype(np.float32),
            )
            return e

        a, b, c = build("on"), build("on"), build("off")
        a.step(9)
        for _ in range(9):
            b.step(1)
        c.step(9)
        assert a.metrics["solver_overflow"] > 0  # the case actually fires
        _assert_worlds_equal(a, b, "overflow-chunk-vs-frame")
        _assert_worlds_equal(a, c, "overflow-chunk-vs-off")

    def test_mutation_between_chunks(self):
        # host mutation invalidates the bin cache → the next chunk's first
        # frame must treat ENTITY order as authoritative (no sync-over)
        a, b = _res_engine("on", 400, 5), _res_engine("off", 400, 5)
        a.step(6); b.step(6)
        for e in (a, b):
            act = e.active_indices("Ball")
            e.despawn_batch(act[5:25])
            e.spawn_batch(
                "Ball", 30,
                x=np.linspace(150, 2500, 30).astype(np.float32),
                y=np.full(30, 150, np.float32),
            )
        a.step(11); b.step(11)
        _assert_worlds_equal(a, b, "mutate-then-chunk")
