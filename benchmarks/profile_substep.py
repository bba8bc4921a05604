"""Drill into the resident solver's substep loop at 1M: boundary-only,
full substep (boundary + pair + restitch + count), and the solver's
unexplained residual vs its parts. In-program K-repetition like
profile_1m_inloop.py.

Usage: python benchmarks/profile_substep.py [n_balls] [K]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

# repo-root bootstrap: these harnesses run as scripts (and as rung
# subprocesses) where sys.path[0] is benchmarks/, not the repo root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import json
import sys
import time

import jax
import jax.numpy as jnp


def timed_loop(make_body, init, K: int, reps: int = 3):
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, K, make_body, c))
    out = fn(init)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(init)
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
        best = min(best, time.time() - t0)
    return best / K


def main() -> None:
    n_balls = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from multithreadedgameengine_tpu.models.balls import make_balls_engine
    from multithreadedgameengine_tpu.ops.physics_grid import (
        _boundary, resident_tile_rows,
    )
    from multithreadedgameengine_tpu.ops.spatial import bin_entities
    from multithreadedgameengine_tpu.ops.pallas_kernels import (
        HALO, pair_pass_resident,
    )

    scale = (n_balls / 10_000) ** 0.5
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
    )
    eng.step(3, block=True)
    eng.step(30, block=True)
    cfg, geom, _ = eng._solver_plan(eng._resolve_spatial())
    world = eng.world
    t, rb, c = world.transform, world.rigid_body, world.collider
    ph = cfg.physics

    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp

    valid = t.active & jnp.isfinite(t.x) & jnp.isfinite(t.y)
    bins = jax.jit(
        lambda x, y: bin_entities(x, y, valid, geom, build_table=False)
    )(t.x, t.y)
    in_grid = valid & (bins.rank < cap)
    rank_safe = jnp.where(in_grid, bins.rank, 0)
    flat0 = (rank_safe * rows_buf + (HALO + bins.row)) * cp + (1 + bins.col)
    flat0 = jnp.where(in_grid, flat0, total)

    def mk(vals, dtype=jnp.float32):
        return (
            jnp.zeros((total,), dtype)
            .at[flat0]
            .set(vals.astype(dtype), mode="drop", unique_indices=True)
            .reshape(cap, rows_buf, cp)
        )

    gx0, gy0 = mk(t.x), mk(t.y)
    grad0 = mk(c.radius)
    flags = (
        c.active.astype(jnp.int32)
        | (c.is_trigger.astype(jnp.int32) << 1)
        | (rb.static.astype(jnp.int32) << 2)
        | ((t.active & rb.active & ~rb.static).astype(jnp.int32) << 3)
    )
    meta0 = mk(jnp.arange(t.x.shape[0], dtype=jnp.int32) | (flags << 24), jnp.int32)
    g_moving = ((meta0 >> 24) & 8) != 0
    strength = float(ph.collision_response_strength)
    results = {}

    # boundary-only (the elasticity==0 clamp path, both axes)
    gpx0 = jnp.full((cap, rows_buf, cp), jnp.nan, jnp.float32)

    def bd_body(_i, carry):
        gx, gy, gpx, gpy = carry
        cx = jnp.clip(gx, grad0, cfg.world_width - grad0)
        gpx = jnp.where(g_moving & (cx != gx), cx, gpx)
        gx = jnp.where(g_moving, cx, gx)
        cy = jnp.clip(gy, grad0, cfg.world_height - grad0)
        gpy = jnp.where(g_moving & (cy != gy), cy, gpy)
        gy = jnp.where(g_moving, cy, gy)
        return gx, gy, gpx, gpy

    results["boundary_x1"] = timed_loop(bd_body, (gx0, gy0, gpx0, gpx0), K)

    # full substep: boundary + pair kernel + restitch + count accumulate
    pad = ((0, 0), (HALO, HALO), (0, 0))

    def sub_body(i, carry):
        gx, gy, gpx, gpy, cnt = carry
        cx = jnp.clip(gx, grad0, cfg.world_width - grad0)
        gpx = jnp.where(g_moving & (cx != gx), cx, gpx)
        gx = jnp.where(g_moving, cx, gx)
        cy = jnp.clip(gy, grad0, cfg.world_height - grad0)
        gpy = jnp.where(g_moving & (cy != gy), cy, gpy)
        gy = jnp.where(g_moving, cy, gy)
        nx, ny, c_ = pair_pass_resident(
            gx, gy, grad0, meta0, i.astype(jnp.uint32), strength, tile_rows=tr
        )
        return (
            jnp.concatenate([gx[:, :HALO], nx, gx[:, HALO + n_tiles * tr:]], axis=1),
            jnp.concatenate([gy[:, :HALO], ny, gy[:, HALO + n_tiles * tr:]], axis=1),
            gpx, gpy,
            cnt + jnp.pad(c_, pad),
        )

    results["substep_full_x1"] = timed_loop(
        sub_body, (gx0, gy0, gpx0, gpx0, meta0 * 0), K
    )

    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
