"""Pallas pair-pass kernel: interpret-mode equivalence against the XLA grid
solver (bit-exact — same math, same order), across scene shapes. The TPU
compile/run path was validated on hardware (1M entities: 455 → 339 ms for
the 2-substep constraint pass vs the XLA formulation)."""

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu.ops.physics_grid import (
    grid_constraints,
    solver_geometry,
)

from golden_ref import GoldenState
from test_physics import world_from_golden
from test_physics_grid import make_cfg, random_scene


def run_both(s, steps=1, symmetric=False):
    # symmetric=False pins the two-sided kernel whose accumulation order is
    # bit-exact with the XLA grid solver; the Newton-reciprocal kernel
    # (solver_symmetric=True, the production default) is covered by
    # TestSymmetricKernel at allclose + exact-count strength.
    geom = solver_geometry(make_cfg("grid"), float(np.max(s.radius)))
    # solver_predicated="on": test worlds are narrow (cols_pad 128), where
    # the auto gate would silently fall back to the two-sided kernel — pin
    # the predicated kernel on so it keeps coverage at test scale
    cp_ = make_cfg("pallas", solver_symmetric=symmetric,
                   solver_predicated="on")
    wx = world_from_golden(s, make_cfg("grid"))
    wp = world_from_golden(s, cp_)
    fx = jax.jit(lambda w: grid_constraints(w, make_cfg("grid"), geom)[0])
    fp = jax.jit(lambda w: grid_constraints(w, cp_, geom)[0])
    for _ in range(steps):
        wx = fx(wx)
        wp = fp(wp)
    return jax.device_get(wx), jax.device_get(wp)


class TestPallasPairPass:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_xla_solver(self, seed):
        wx, wp = run_both(random_scene(seed, n=70), steps=2)
        np.testing.assert_array_equal(wx.transform.x, wp.transform.x)
        np.testing.assert_array_equal(wx.transform.y, wp.transform.y)
        np.testing.assert_array_equal(
            wx.rigid_body.collision_count, wp.rigid_body.collision_count
        )

    def test_statics_triggers_and_world_edges(self):
        s = GoldenState.of(
            6,
            x=[8.0, 20.0, 592.0, 300.0, 308.0, 300.0],
            y=[8.0, 8.0, 392.0, 200.0, 200.0, 208.0],
            radius=[6.0, 6.0, 6.0, 6.0, 6.0, 6.0],
            static=[False, True, False, False, False, False],
            is_trigger=[False, False, False, False, True, False],
        )
        s.px[:] = s.x
        s.py[:] = s.y
        wx, wp = run_both(s)
        np.testing.assert_array_equal(wx.transform.x, wp.transform.x)
        np.testing.assert_array_equal(
            wx.rigid_body.collision_count, wp.rigid_body.collision_count
        )

    @pytest.mark.parametrize("seed", [1, 4])
    def test_zero_elasticity_px_carry(self, seed):
        """boundary_elasticity == 0 takes the px/py-scatter-free resident
        path (NaN 'last clamped value' carries) — must stay bit-exact with
        the XLA grid solver including entities that hit the world edges."""
        s = random_scene(seed, n=70)
        # park several entities hard against / beyond the world edges so the
        # boundary clamp fires across substeps
        s.x[:6] = [2.0, 598.0, 300.0, 1.0, 599.0, 300.0]
        s.y[:6] = [200.0, 200.0, 2.0, 398.0, 1.0, 399.0]
        s.px[:6] = s.x[:6] - 3.0  # inbound velocity
        s.py[:6] = s.y[:6] - 2.0
        geom = solver_geometry(
            make_cfg("grid", boundary_elasticity=0.0), float(np.max(s.radius))
        )
        cg = make_cfg("grid", boundary_elasticity=0.0)
        cp_ = make_cfg("pallas", boundary_elasticity=0.0,
                       solver_symmetric=False)
        wx = world_from_golden(s, cg)
        wp = world_from_golden(s, cp_)
        fx = jax.jit(lambda w: grid_constraints(w, cg, geom)[0])
        fp = jax.jit(lambda w: grid_constraints(w, cp_, geom)[0])
        for _ in range(3):
            wx = fx(wx)
            wp = fp(wp)
        wx, wp = jax.device_get(wx), jax.device_get(wp)
        np.testing.assert_array_equal(wx.transform.x, wp.transform.x)
        np.testing.assert_array_equal(wx.transform.y, wp.transform.y)
        np.testing.assert_array_equal(wx.rigid_body.px, wp.rigid_body.px)
        np.testing.assert_array_equal(wx.rigid_body.py, wp.rigid_body.py)


class TestSymmetricKernel:
    """The Newton-reciprocal kernel (solver_symmetric=True, the production
    default): each pair is resolved once from its forward offset and both
    sides accumulated. Per-pair forces are bit-identical to the two-sided
    enumeration — only each slot's fp ADDITION order differs — so positions
    agree to float rounding while int32 contact counts are exact."""

    @pytest.mark.parametrize("seed", [0, 3, 7])
    def test_matches_twosided_allclose_counts_exact(self, seed):
        wx, wp = run_both(random_scene(seed, n=90), steps=2, symmetric=True)
        np.testing.assert_allclose(
            wx.transform.x, wp.transform.x, rtol=0, atol=1e-3
        )
        np.testing.assert_allclose(
            wx.transform.y, wp.transform.y, rtol=0, atol=1e-3
        )
        np.testing.assert_array_equal(
            wx.rigid_body.collision_count, wp.rigid_body.collision_count
        )

    def test_tile_boundary_pairs(self):
        """A pair straddling a kernel row-tile boundary exercises the spill
        row (j side lands one row below the tile). Both entities must move
        apart and both must count the contact."""
        from multithreadedgameengine_tpu import make_config
        from multithreadedgameengine_tpu.ops.physics_grid import (
            grid_constraints_resident,
            resident_tile_rows,
        )

        cfgp = make_config(
            world_width=600.0, world_height=3000.0,
            spatial=dict(max_neighbors=64, method="bruteforce"),
            physics=dict(
                gravity=(0.0, 0.0), sub_step_count=1, solver="pallas",
                boundary_elasticity=0.5, collision_response_strength=0.7,
                solver_predicated="on",
            ),
        )
        geom = solver_geometry(cfgp, 12.0)
        cell = geom.cell_size
        cp_pad = -(-(geom.cols + 2) // 128) * 128
        tr = resident_tile_rows(geom.capacity, cp_pad)
        assert geom.rows > tr, "world must span >1 row tile"
        yb = cell * tr  # world y of the first tile boundary
        # two overlapping entities in the cells just above/below the boundary
        s = GoldenState.of(
            2,
            x=[300.0, 300.0],
            y=[yb - 4.0, yb + 4.0],
            radius=[9.0, 9.0],
        )
        s.px[:] = s.x
        s.py[:] = s.y
        w = world_from_golden(s, cfgp)
        w2, _, _ = jax.jit(
            lambda w: grid_constraints_resident(w, cfgp, geom)
        )(w)
        w2 = jax.device_get(w2)
        y = w2.transform.y[:2]
        cnt = w2.rigid_body.collision_count[:2]
        assert cnt[0] == 1 and cnt[1] == 1
        assert y[0] < yb - 4.0 and y[1] > yb + 4.0  # pushed apart
        np.testing.assert_allclose(
            (yb - 4.0) - y[0], y[1] - (yb + 4.0), atol=1e-4
        )  # symmetric push (equal shares)

    @pytest.mark.parametrize("seed", [2, 5])
    def test_multi_tile_dense_scene(self, seed):
        """Dense multi-tile world: many pairs straddle row-tile boundaries,
        so the spill-row overlap-add carries real contributions. Counts must
        stay exact vs the two-sided kernel; positions to float rounding."""
        from multithreadedgameengine_tpu import make_config
        from multithreadedgameengine_tpu.ops.physics_grid import (
            grid_constraints,
            resident_tile_rows,
        )

        def cfg_of(solver, symmetric=True):
            return make_config(
                world_width=400.0, world_height=4000.0,
                spatial=dict(max_neighbors=64, method="bruteforce"),
                physics=dict(
                    gravity=(0.0, 0.4), sub_step_count=2,
                    boundary_elasticity=0.5,
                    collision_response_strength=0.7,
                    solver=solver, solver_symmetric=symmetric,
                    solver_predicated="on",
                ),
            )

        rng = np.random.default_rng(seed)
        n = 400
        s = GoldenState.of(
            n,
            x=rng.uniform(20, 380, n),
            y=rng.uniform(20, 3980, n),
            radius=rng.uniform(6.0, 14.0, n),
            max_vel=np.full(n, 30.0),
        )
        s.px[:] = s.x - rng.uniform(-2, 2, n)
        s.py[:] = s.y - rng.uniform(-2, 2, n)
        geom = solver_geometry(cfg_of("grid"), float(np.max(s.radius)))
        cp_pad = -(-(geom.cols + 2) // 128) * 128
        assert geom.rows > resident_tile_rows(geom.capacity, cp_pad), (
            "scene must span multiple row tiles"
        )
        cs = cfg_of("pallas", True)
        c2 = cfg_of("pallas", False)
        ws = world_from_golden(s, cs)
        w2 = world_from_golden(s, c2)
        fs = jax.jit(lambda w: grid_constraints(w, cs, geom)[0])
        f2 = jax.jit(lambda w: grid_constraints(w, c2, geom)[0])
        for _ in range(2):
            ws = fs(ws)
            w2 = f2(w2)
        ws, w2 = jax.device_get(ws), jax.device_get(w2)
        np.testing.assert_array_equal(
            ws.rigid_body.collision_count, w2.rigid_body.collision_count
        )
        np.testing.assert_allclose(ws.transform.x, w2.transform.x, atol=1e-3)
        np.testing.assert_allclose(ws.transform.y, w2.transform.y, atol=1e-3)
        assert ws.rigid_body.collision_count.sum() > 40  # genuinely dense
