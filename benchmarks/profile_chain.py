"""Chained in-loop probes to find the resident solver's residual cost at 1M:
A = bin+scatter, B = A + 2 substeps, C = full grid_constraints_resident,
all with the same (x, y) carry so the deltas isolate each stage.

Usage: python benchmarks/profile_chain.py [n_balls] [K]
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
        grid_constraints_resident, resident_tile_rows,
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
    strength = float(ph.collision_response_strength)
    results = {}

    flags_src = (
        c.active.astype(jnp.int32)
        | (c.is_trigger.astype(jnp.int32) << 1)
        | (rb.static.astype(jnp.int32) << 2)
        | ((t.active & rb.active & ~rb.static).astype(jnp.int32) << 3)
    )
    meta_src = jnp.arange(t.x.shape[0], dtype=jnp.int32) | (flags_src << 24)

    def build(x, y):
        valid = t.active & jnp.isfinite(x) & jnp.isfinite(y)
        bins = bin_entities(x, y, valid, geom, build_table=False)
        in_grid = valid & (bins.rank < cap)
        rank_safe = jnp.where(in_grid, bins.rank, 0)
        flat = (rank_safe * rows_buf + (HALO + bins.row)) * cp + (1 + bins.col)
        flat = jnp.where(in_grid, flat, total)

        def scat(vals, dtype=jnp.float32):
            return (
                jnp.zeros((total,), dtype)
                .at[flat]
                .set(vals.astype(dtype), mode="drop", unique_indices=True)
                .reshape(cap, rows_buf, cp)
            )

        return scat(x), scat(y), scat(c.radius), scat(meta_src, jnp.int32), flat, in_grid

    # A: bin + 4 scatters
    def a_body(_i, carry):
        x, y = carry
        gx, gy, grad, meta, _f, _g = build(x, y)
        return x + gx[0, 0, :1] * 0, y + gy[0, 0, :1] * 0

    results["A_bin_scatter"] = timed_loop(a_body, (t.x, t.y), K)

    # B: A + 2 full substeps (boundary + pair + restitch + count)
    pad = ((0, 0), (HALO, HALO), (0, 0))

    def b_body(i, carry):
        x, y = carry
        gx, gy, grad, meta, _f, _g = build(x, y)
        g_moving = ((meta >> 24) & 8) != 0
        gpx = jnp.full((cap, rows_buf, cp), jnp.nan, jnp.float32)
        gpy = gpx
        cnt = meta * 0

        def sub(k, sc):
            gx, gy, gpx, gpy, cnt = sc
            cx = jnp.clip(gx, grad, cfg.world_width - grad)
            gpx = jnp.where(g_moving & (cx != gx), cx, gpx)
            gx = jnp.where(g_moving, cx, gx)
            cy = jnp.clip(gy, grad, cfg.world_height - grad)
            gpy = jnp.where(g_moving & (cy != gy), cy, gpy)
            gy = jnp.where(g_moving, cy, gy)
            nx, ny, c_ = pair_pass_resident(
                gx, gy, grad, meta, k.astype(jnp.uint32), strength,
                tile_rows=tr,
            )
            return (
                jnp.concatenate([gx[:, :HALO], nx, gx[:, HALO + n_tiles * tr:]], axis=1),
                jnp.concatenate([gy[:, :HALO], ny, gy[:, HALO + n_tiles * tr:]], axis=1),
                gpx, gpy, cnt + jnp.pad(c_, pad),
            )

        gx, gy, gpx, gpy, cnt = jax.lax.fori_loop(
            0, ph.sub_step_count, sub, (gx, gy, gpx, gpy, cnt)
        )
        return x + gx[0, 0, :1] * 0, y + gy[0, 0, :1] * 0

    results["B_plus_substeps"] = timed_loop(b_body, (t.x, t.y), K)

    # C: the real full solver with an (x, y)-only carry
    def c_body(_i, carry):
        x, y = carry
        w = world.replace(transform=world.transform.replace(x=x, y=y))
        w2, _b, _o = grid_constraints_resident(w, cfg, geom)
        return w2.transform.x, w2.transform.y

    results["C_full_solver"] = timed_loop(c_body, (t.x, t.y), K)

    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
