"""Readback variants at 1M, IN CONTEXT (round 4): probe_ablate.py showed the
entity-order readback — jnp.stack 5 layout channels into [total, 5] then one
1M-row gather — costs ~8.9 ms/frame in context (the interleave transpose is
loop-hoisted to near-zero in isolated probes). Compare against planar
per-channel gathers (no interleave) inside the same fast-path frame.

Usage: python benchmarks/probe_readback.py [n_balls] [K]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import json
import sys
import time

import jax
import jax.numpy as jnp


def timed_loop(body, init, K: int, reps: int = 3):
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, K, body, c))
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
    return round(best / K * 1000, 3)


def main() -> None:
    n_balls = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from multithreadedgameengine_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from multithreadedgameengine_tpu.models.balls import make_balls_engine
    from multithreadedgameengine_tpu.ops.physics import (
        update_derived, verlet_move,
    )
    from multithreadedgameengine_tpu.ops.physics_grid import (
        _resident_substeps, resident_tile_rows,
    )
    from multithreadedgameengine_tpu.ops.pallas_kernels import HALO

    scale = (n_balls / 10_000) ** 0.5
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
        physics=dict(
            sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
            boundary_elasticity=0.0, collision_response_strength=0.8,
            gravity=(0.0, 0.5), solver_capacity=12, rebin_interval=1000,
        ),
    )
    eng.step(5, block=True)

    cfg, geom, _f = eng._solver_plan(eng._resolve_spatial())
    world = eng.world
    ph = cfg.physics
    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp

    def fast_step(w, readback: str):
        te, rbe = w.transform, w.rigid_body
        w_e = verlet_move(w, cfg, dt_ratio=1.0)
        te, rbe = w_e.transform, w_e.rigid_body
        flat, in_grid = w.solver_flat, w.solver_in_grid
        grad, meta, maxv = w.solver_grad, w.solver_meta, w.solver_maxv
        gx, gy = w.solver_x, w.solver_y
        gpx, gpy = w.solver_px, w.solver_py
        mv = ((meta >> 24) & 8) != 0
        damping = jnp.float32(ph.verlet_damping)
        grav_x, grav_y = ph.gravity
        dx = (gx - gpx) * damping + grav_x
        dy = (gy - gpy) * damping + grav_y
        ms = jnp.where(maxv > 0, maxv, 100.0)
        dx = jnp.clip(dx, -ms, ms)
        dy = jnp.clip(dy, -ms, ms)
        gx1 = jnp.where(mv, gx + dx, gx)
        gy1 = jnp.where(mv, gy + dy, gy)
        gpx1 = jnp.where(mv, gx, gpx)
        gpy1 = jnp.where(mv, gy, gpy)
        salt = w.step_count.astype(jnp.uint32)
        gx2, gy2, gpx2, gpy2, g_count = _resident_substeps(
            gx1, gy1, gpx1, gpy1, grad, meta, mv, cfg, tr, n_tiles,
            salt, True, False, carry_px=True, band=None,
        )
        idx = jnp.where(in_grid, flat, 0)
        if readback == "stacked":
            out_flat = jnp.stack(
                [gx2, gy2, gpx2, gpy2, g_count.astype(jnp.float32)], axis=-1
            ).reshape(total, 5)
            rows = out_flat[idx]
            vals = [rows[:, k] for k in range(5)]
        elif readback == "planar":
            vals = [
                a.reshape(total)[idx]
                for a in (gx2, gy2, gpx2, gpy2, g_count.astype(jnp.float32))
            ]
        elif readback == "planar_xy":
            # x/y/count only: px/py reconstructed (px = pre-move x for all
            # non-clamped movers; clamped are border-band only — candidate
            # round-5 design, timing-only here)
            vals3 = [
                a.reshape(total)[idx]
                for a in (gx2, gy2, g_count.astype(jnp.float32))
            ]
            vals = [vals3[0], vals3[1], w.transform.x, w.transform.y, vals3[2]]
        new_x = jnp.where(in_grid, vals[0], te.x)
        new_y = jnp.where(in_grid, vals[1], te.y)
        new_px = jnp.where(in_grid, vals[2], rbe.px)
        new_py = jnp.where(in_grid, vals[3], rbe.py)
        new_cnt = jnp.where(in_grid, vals[4].astype(jnp.int32), 0)
        w2 = w_e.replace(
            transform=te.replace(x=new_x, y=new_y),
            rigid_body=rbe.replace(px=new_px, py=new_py,
                                   collision_count=new_cnt),
            solver_x=gx2, solver_y=gy2, solver_px=gpx2, solver_py=gpy2,
            step_count=w.step_count + 1,
        )
        return update_derived(w2, cfg)

    results = {}
    for mode in ("stacked", "planar", "planar_xy"):
        body = lambda _i, w, m=mode: fast_step(w, m)
        results[mode] = timed_loop(body, world, K)
        print(f"{mode}: {results[mode]} ms", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
