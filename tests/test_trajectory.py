"""Full-pipeline golden trajectory: the COMPLETE engine step (input → spatial
→ tick → Verlet physics) vs a sequential numpy simulation of the reference's
loop on the balls demo (the BASELINE.json north star: "trajectories matching
the reference balls demo within float tolerance").

The numpy side replays the reference's per-frame order with the sequential
semantics SURVEY.md §7.1 assigns to the port: neighbor lists from frame-start
positions, ball tick (ball.js:114-132), Verlet move + substepped constraints
(physics_worker.js), Gauss–Seidel pair order — so the comparison covers the
whole engine, not just the physics op. Exactness holds while contacts are
isolated; tolerance bands cover multi-contact frames."""

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu.models.balls import make_balls_engine

from golden_ref import GoldenState, brute_neighbors, golden_step


def reference_loop(eng, steps, mouse=None):
    """Numpy replay of the full balls loop from the engine's post-spawn
    state."""
    snap = eng.snapshot()
    n = snap.transform.x.shape[0]
    s = GoldenState.of(
        n,
        x=np.asarray(snap.transform.x, np.float64),
        y=np.asarray(snap.transform.y, np.float64),
        px=np.asarray(snap.rigid_body.px, np.float64),
        py=np.asarray(snap.rigid_body.py, np.float64),
        vx=np.asarray(snap.rigid_body.vx, np.float64),
        vy=np.asarray(snap.rigid_body.vy, np.float64),
        radius=np.asarray(snap.collider.radius, np.float64),
        max_vel=np.asarray(snap.rigid_body.max_vel, np.float64),
        active=np.asarray(snap.transform.active),
        rb_active=np.asarray(snap.rigid_body.active),
        collider_active=np.asarray(snap.collider.active),
        is_trigger=np.asarray(snap.collider.is_trigger),
    )
    vr = np.asarray(snap.collider.visual_range, np.float64)
    cfg = eng.config
    for _ in range(steps):
        # logic phase: ball tick (ball.js:114-132) — mouse repulsion
        if mouse is not None and mouse.get("down"):
            for i in range(1, n):
                if not s.active[i]:
                    continue
                dx = s.x[i] - mouse["x"]
                dy = s.y[i] - mouse["y"]
                if dx * dx + dy * dy <= 20000.0:
                    s.ax[i] = dx * 0.2
                    s.ay[i] = dy * 0.2
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


def sparse_engine(n=24, seed=17):
    """Sparse scene: few contacts → near-exact trajectories."""
    eng = make_balls_engine(
        n_balls=n, spawn=False, seed=seed,
        world_width=4000.0, world_height=2500.0,
        spatial=dict(cell_size=50.0, max_neighbors=32, cell_capacity=32),
    )
    for _ in range(n):
        eng.spawn("Ball", x=200 + eng.rng() * 3600.0, y=200 + eng.rng() * 1200.0)
    return eng


class TestFullLoopTrajectory:
    def test_matches_reference_loop_sparse(self):
        eng = sparse_engine()
        ref = reference_loop(eng, steps=20)
        eng.step(20)
        got = eng.snapshot()
        np.testing.assert_allclose(
            np.asarray(got.transform.x)[1:], ref.x[1:], atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(got.transform.y)[1:], ref.y[1:], atol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(got.rigid_body.vy)[1:], ref.vy[1:], atol=5e-2
        )

    def test_matches_with_mouse_interaction(self):
        eng = sparse_engine(seed=23)
        # pick a ball, park the mouse near it, hold the button
        snap = eng.snapshot()
        # flush spawns first so positions exist
        eng.step(0)
        eng._flush_pending()
        snap = eng.snapshot()
        bx = float(snap.transform.x[3])
        by = float(snap.transform.y[3])
        eng.input.set_mouse(bx + 50.0, by)
        eng.input.mouse_button(0, True)
        ref = reference_loop(eng, steps=12, mouse={"x": bx + 50.0, "y": by, "down": True})
        eng.step(12)
        got = eng.snapshot()
        np.testing.assert_allclose(
            np.asarray(got.transform.x)[1:], ref.x[1:], atol=0.1
        )
        # the targeted ball was repelled away from the cursor (moved -x)
        assert ref.x[3] < bx + 1e-6
        assert float(got.transform.x[3]) < bx + 1e-6

    def test_dense_scene_tolerance_band(self):
        """Settling pile: Jacobi vs GS within coarse bands over 30 frames."""
        eng = make_balls_engine(
            n_balls=40, spawn=False, seed=5,
            world_width=1500.0, world_height=900.0,
            spatial=dict(cell_size=50.0, max_neighbors=64, cell_capacity=32),
        )
        for k in range(40):
            eng.spawn("Ball", x=400.0 + (k % 8) * 55.0, y=300.0 + (k // 8) * 55.0)
        ref = reference_loop(eng, steps=30)
        eng.step(30)
        got = eng.snapshot()
        gx = np.asarray(got.transform.x)[1:41]
        gy = np.asarray(got.transform.y)[1:41]
        assert abs(gx.mean() - ref.x[1:41].mean()) < 5.0
        assert abs(gy.mean() - ref.y[1:41].mean()) < 5.0
        assert abs(gy.std() - ref.y[1:41].std()) < 10.0
