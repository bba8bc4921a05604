"""Grid-resident constraint solver vs the neighbor-list solver: identical
pair sets ⇒ same displacements and collision counts (up to float summation
order). Random mixed scenes with statics, triggers, and varied radii."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multithreadedgameengine_tpu import make_config
from multithreadedgameengine_tpu.ops.physics import physics_step
from multithreadedgameengine_tpu.ops.physics_grid import (
    grid_constraints,
    solver_geometry,
)
from multithreadedgameengine_tpu.ops.spatial import neighbor_lists_bruteforce

from golden_ref import GoldenState
from test_physics import world_from_golden


def make_cfg(solver, **phys):
    d = dict(gravity=(0.0, 0.4), sub_step_count=3, boundary_elasticity=0.5,
             collision_response_strength=0.7, verlet_damping=0.99,
             solver=solver)
    d.update(phys)
    return make_config(
        world_width=600.0, world_height=400.0,
        spatial=dict(max_neighbors=64, method="bruteforce"),
        physics=d,
    )


def random_scene(seed, n=60, with_static=True, with_trigger=True):
    rng = np.random.default_rng(seed)
    s = GoldenState.of(
        n,
        x=rng.uniform(20, 580, n),
        y=rng.uniform(20, 380, n),
        radius=rng.uniform(4.0, 12.0, n),
        max_vel=np.full(n, 30.0),
    )
    s.px[:] = s.x - rng.uniform(-2, 2, n)
    s.py[:] = s.y - rng.uniform(-2, 2, n)
    if with_static:
        s.static[rng.random(n) < 0.15] = True
    if with_trigger:
        s.is_trigger[rng.random(n) < 0.1] = True
    s.active[rng.random(n) < 0.05] = False
    return s


def step_both(s, steps=5):
    cfg_n = make_cfg("neighbors")
    cfg_g = make_cfg("grid")
    geom = solver_geometry(cfg_g, float(np.max(s.radius)))

    wn = world_from_golden(s, cfg_n)
    wg = world_from_golden(s, cfg_g)

    @jax.jit
    def step_n(w):
        t, c = w.transform, w.collider
        nbr = neighbor_lists_bruteforce(t.x, t.y, t.active, c.visual_range, cfg_n)
        w = physics_step(w, nbr, cfg_n, 1.0)
        return w.replace(step_count=w.step_count + 1)

    @jax.jit
    def step_g(w):
        w = physics_step(w, None, cfg_g, 1.0, solver_geom=geom)
        return w.replace(step_count=w.step_count + 1)

    for _ in range(steps):
        wn = step_n(wn)
        wg = step_g(wg)
    return jax.device_get(wn), jax.device_get(wg)


class TestSolverEquivalence:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_trajectories_match(self, seed):
        s = random_scene(seed)
        wn, wg = step_both(s, steps=5)
        np.testing.assert_allclose(wn.transform.x, wg.transform.x, atol=2e-3)
        np.testing.assert_allclose(wn.transform.y, wg.transform.y, atol=2e-3)
        np.testing.assert_allclose(wn.rigid_body.px, wg.rigid_body.px, atol=2e-3)

    def test_collision_counts_match(self):
        s = random_scene(7, n=40)
        wn, wg = step_both(s, steps=1)
        np.testing.assert_array_equal(
            wn.rigid_body.collision_count, wg.rigid_body.collision_count
        )

    def test_dense_pile_matches(self):
        """Moderately overlapping pile — many simultaneous contacts. (A
        violently exploding pile is not a fair oracle: the neighbor baseline
        with visual_range=1000 has a complete candidate set, while both the
        grid solver and the real reference bound candidates at bin time —
        within-frame travel beyond the slack diverges chaotically.)"""
        rng = np.random.default_rng(3)
        n = 50
        gx, gy = np.meshgrid(np.arange(10), np.arange(5))
        s = GoldenState.of(
            n,
            x=260.0 + gx.ravel() * 16.0 + rng.uniform(-1, 1, n),
            y=160.0 + gy.ravel() * 16.0 + rng.uniform(-1, 1, n),
            radius=np.full(n, 10.0),  # spacing 16 < 2r: ~4px initial overlap
            max_vel=np.full(n, 30.0),
        )
        s.px[:] = s.x
        s.py[:] = s.y
        wn, wg = step_both(s, steps=3)
        np.testing.assert_allclose(wn.transform.x, wg.transform.x, atol=1e-2)
        np.testing.assert_allclose(wn.transform.y, wg.transform.y, atol=1e-2)

    def test_statics_unmoved_and_push_full(self):
        s = GoldenState.of(
            2,
            x=[300.0, 308.0], y=[200.0, 200.0],
            radius=[6.0, 6.0], static=[True, False],
        )
        s.px[:] = s.x
        s.py[:] = s.y
        wn, wg = step_both(s, steps=1)
        assert wg.transform.x[0] == 300.0
        np.testing.assert_allclose(wn.transform.x, wg.transform.x, atol=1e-5)

    def test_capacity_overflow_fallback(self):
        """More entities in one solver cell than capacity: overflow entities
        keep boundary constraints and are reported, never corrupted."""
        n = 80
        rng = np.random.default_rng(11)
        # all entities stacked in a tiny region => one solver cell overflows
        s = GoldenState.of(
            n,
            x=rng.uniform(300, 304, n),
            y=rng.uniform(200, 204, n),
            radius=np.full(n, 3.0),
            max_vel=np.full(n, 30.0),
        )
        s.px[:] = s.x
        s.py[:] = s.y
        cfg = make_cfg("grid")
        geom = solver_geometry(cfg, 3.0)
        w = world_from_golden(s, cfg)
        w2, n_binned, overflow = jax.jit(
            lambda w: grid_constraints(w, cfg, geom)
        )(w)
        assert int(n_binned) + int(overflow) == n
        assert int(overflow) > 0  # the scenario does overflow
        assert np.isfinite(np.asarray(w2.transform.x)).all()
