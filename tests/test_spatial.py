"""Spatial kernel tests: hash-grid vs brute-force oracle (SURVEY.md §4:
"kernel unit tests (grid binning vs brute-force O(N²) reference)")."""

import jax
import jax.numpy as jnp
import numpy as np

from multithreadedgameengine_tpu import make_config
from multithreadedgameengine_tpu.ops.spatial import (
    neighbor_lists_bruteforce,
    neighbor_lists_grid,
)


def cfg_for(world=(1000.0, 800.0), cell=50.0, k=64, cap=64, radius=2):
    return make_config(
        world_width=world[0], world_height=world[1],
        spatial=dict(cell_size=cell, max_neighbors=k, cell_capacity=cap,
                     max_cell_radius=radius),
    )


def neighbor_sets(ids, counts):
    out = []
    for row, c in zip(np.asarray(ids), np.asarray(counts)):
        live = [int(j) for j in row if j >= 0]
        assert len(live) == int(c)
        out.append(frozenset(live))
    return out


def neighbor_order(ids_row):
    return [int(j) for j in np.asarray(ids_row) if j >= 0]


class TestGridVsBruteforce:
    def test_random_points_same_sets(self):
        rng = np.random.default_rng(7)
        n = 300
        cfg = cfg_for(radius=2)
        x = jnp.asarray(rng.uniform(0, 1000, n), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 800, n), jnp.float32)
        active = jnp.ones((n,), bool)
        vr = jnp.full((n,), 90.0, jnp.float32)  # within 2-cell scan radius
        g = neighbor_lists_grid(x, y, active, vr, cfg)
        b = neighbor_lists_bruteforce(x, y, active, vr, cfg)
        assert neighbor_sets(g.ids, g.count) == neighbor_sets(b.ids, b.count)
        np.testing.assert_array_equal(np.asarray(g.count), np.asarray(b.count))

    def test_distances_are_squared_and_correct(self):
        cfg = cfg_for()
        x = jnp.asarray([100.0, 130.0, 500.0])
        y = jnp.asarray([100.0, 140.0, 500.0])
        active = jnp.ones((3,), bool)
        vr = jnp.full((3,), 60.0)
        g = neighbor_lists_grid(x, y, active, vr, cfg)
        assert int(g.count[0]) == 1 and neighbor_order(g.ids[0]) == [1]
        live_d2 = float(np.asarray(g.d2[0])[np.asarray(g.ids[0]) >= 0][0])
        assert abs(live_d2 - (30.0**2 + 40.0**2)) < 1e-3

    def test_per_entity_visual_range(self):
        """Asymmetric ranges: i sees j but not vice versa
        (spatial_worker.js:207-211 per-entity visualRange)."""
        cfg = cfg_for()
        x = jnp.asarray([100.0, 160.0])
        y = jnp.asarray([100.0, 100.0])
        active = jnp.ones((2,), bool)
        vr = jnp.asarray([100.0, 30.0])
        g = neighbor_lists_grid(x, y, active, vr, cfg)
        assert int(g.count[0]) == 1 and neighbor_order(g.ids[0]) == [1]
        assert int(g.count[1]) == 0

    def test_inactive_and_nan_excluded(self):
        cfg = cfg_for()
        x = jnp.asarray([100.0, 110.0, float("nan"), 120.0])
        y = jnp.asarray([100.0, 100.0, 100.0, 100.0])
        active = jnp.asarray([True, False, True, True])
        vr = jnp.full((4,), 80.0)
        g = neighbor_lists_grid(x, y, active, vr, cfg)
        sets = neighbor_sets(g.ids, g.count)
        assert sets[0] == {3}  # inactive 1 and NaN 2 excluded
        assert sets[2] == frozenset()
        assert int(g.n_binned) == 2  # only the two active+finite entities

    def test_max_neighbors_cap(self):
        cfg = cfg_for(k=4)
        n = 20
        x = jnp.full((n,), 500.0) + jnp.arange(n, dtype=jnp.float32) * 0.5
        y = jnp.full((n,), 400.0)
        active = jnp.ones((n,), bool)
        vr = jnp.full((n,), 50.0)
        g = neighbor_lists_grid(x, y, active, vr, cfg)
        assert np.all(np.asarray(g.count) == 4)

    def test_outside_world_positions_clamped_to_border_cells(self):
        """rebuildGrid clamps cell coords (spatial_worker.js:157-161), so
        out-of-bounds entities are still found as neighbors."""
        cfg = cfg_for()
        x = jnp.asarray([-30.0, 5.0])
        y = jnp.asarray([100.0, 100.0])
        active = jnp.ones((2,), bool)
        vr = jnp.full((2,), 60.0)
        g = neighbor_lists_grid(x, y, active, vr, cfg)
        assert int(g.count[0]) == 1 and int(g.count[1]) == 1

    def test_cell_capacity_overflow_reported(self):
        cfg = cfg_for(cap=4)
        n = 10  # all in one cell
        x = jnp.full((n,), 25.0)
        y = jnp.full((n,), 25.0) + jnp.arange(n, dtype=jnp.float32) * 0.1
        active = jnp.ones((n,), bool)
        vr = jnp.full((n,), 50.0)
        g = neighbor_lists_grid(x, y, active, vr, cfg)
        assert int(g.n_binned) == 4  # 6 dropped, visible in diagnostics

    def test_candidate_order_is_scan_order(self):
        """Within-list ordering follows the reference's row-major cell scan
        with ascending entity index within a cell (spatial_worker.js:234-271)."""
        cfg = cfg_for(cell=50.0, k=8, radius=1)
        # entity 0 at cell (2,2); neighbors placed in cells scanned in order:
        # (1,1) then (1,2) then (2,1) then (2,2)
        x = jnp.asarray([125.0, 80.0, 120.0, 80.0, 130.0])
        y = jnp.asarray([125.0, 80.0, 80.0, 120.0, 130.0])
        active = jnp.ones((5,), bool)
        vr = jnp.full((5,), 70.0)
        g = neighbor_lists_grid(x, y, active, vr, cfg)
        assert neighbor_order(g.ids[0]) == [1, 2, 3, 4]


class TestPerClassAssemblyParity:
    def test_by_class_matches_global_lists(self):
        """neighbor_lists_by_class (per-class scan radii) returns the SAME
        ids/d2/count rows as the global-radius grid search for every class —
        acceptance, scan order and max_neighbors truncation are identical
        (spatial_worker.js:207-271 sizes cellRadius per entity; the global
        table just over-scans). Off by default (measured slower on v5e, see
        SpatialConfig.per_class_assembly) so this parity test is the
        coverage for the opt-in path."""
        from multithreadedgameengine_tpu.ops.spatial import (
            neighbor_lists_by_class,
        )

        cfg = cfg_for(cell=50.0, k=16, cap=16, radius=3)
        rng = np.random.default_rng(11)
        n_a, n_b = 96, 8  # class A: small range; class B: big range
        n = n_a + n_b
        x = jnp.asarray(rng.uniform(0, 1000, n).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 800, n).astype(np.float32))
        active = jnp.asarray(rng.random(n) > 0.1)
        vr = jnp.concatenate([
            jnp.full((n_a,), 60.0), jnp.full((n_b,), 140.0)
        ])
        extra = (jnp.asarray(rng.uniform(-5, 5, n).astype(np.float32)),)

        g = neighbor_lists_grid(x, y, active, vr, cfg, extra_fields=extra)
        ranges = (("A", 0, n_a, 2), ("B", n_a, n_b, 3))
        by_cls, n_binned = neighbor_lists_by_class(
            x, y, active, vr, cfg, extra, ranges
        )
        assert int(n_binned) == int(g.n_binned)
        for name, start, count, _r in ranges:
            nb = by_cls[name]
            sl = slice(start, start + count)
            # same per-row neighbor sets in the same scan order (the class
            # table's candidate axis is narrower; compare id sequences)
            for i in range(count):
                k_g = int(g.count[sl][i])
                k_c = int(nb.count[i])
                assert k_c == k_g
                ids_g = [int(v) for v in np.asarray(g.ids[sl][i][:k_g])]
                ids_c = [int(v) for v in np.asarray(nb.ids[i][:k_c])]
                assert ids_c == ids_g
            d2g = np.asarray(g.d2[sl])
            d2c = np.asarray(nb.d2)
            cnt = np.asarray(g.count[sl])
            for i in range(count):
                assert (d2c[i][: cnt[i]] == d2g[i][: cnt[i]]).all()
