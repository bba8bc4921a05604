"""IN-CONTEXT ablation of the residency FAST path at 1M (round 4): a local
copy of resident_persistent_step's FAST branch (no rebuild cond) with pieces
removable by flag, timed as K-iteration fori loops. Isolated phase probes
overstate costs XLA fuses away in context (the banding lesson:
probe_fast_parts measured the boundary at 2x1.6 ms, removing it from the
real step saved ~0.3) — deltas from THIS probe are the honest budget.

Usage: python benchmarks/probe_ablate.py [n_balls] [K]
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

    from multithreadedgameengine_tpu.behavior import (
        eval_layout_forces, probe_layout_safe,
    )
    from multithreadedgameengine_tpu.models.balls import make_balls_engine
    from multithreadedgameengine_tpu.ops.physics import (
        update_derived, verlet_move,
    )
    from multithreadedgameengine_tpu.ops.physics_grid import (
        _resident_substeps, resident_tile_rows,
    )
    from multithreadedgameengine_tpu.ops.pallas_kernels import HALO

    scale = (n_balls / 10_000) ** 0.5
    over = {}
    if n_balls >= 1_000_000:
        over["physics"] = dict(
            sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
            boundary_elasticity=0.0, collision_response_strength=0.8,
            gravity=(0.0, 0.5), solver_capacity=12, rebin_interval=1000,
        )
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
        **over,
    )
    eng.step(5, block=True)

    cfg, geom, _forced = eng._solver_plan(eng._resolve_spatial())
    world = eng.world
    inputs = eng.input.snapshot()
    ph = cfg.physics
    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp
    force_specs = tuple(
        (reg.cls.tick, reg.start_index, reg.count)
        for reg in eng.classes.values()
        if reg.count > 0 and getattr(reg.cls, "tick", None) is not None
        and probe_layout_safe(reg.cls, cfg)
    )

    from multithreadedgameengine_tpu.ops.physics_grid import _band_spec

    band = _band_spec(cfg, geom, rows_buf, 100.0, True)[0]

    def fast_step(w, *, do_we=True, do_forces=True, substeps=2,
                  do_readback=True, do_derived=True, do_band=True):
        """Local copy of the FAST branch (layout fresh, bins unexpired)."""
        te, rbe = w.transform, w.rigid_body
        if do_we:
            w_e = verlet_move(w, cfg, dt_ratio=1.0)
            te, rbe = w_e.transform, w_e.rigid_body
        else:
            w_e = w
        flat, in_grid = w.solver_flat, w.solver_in_grid
        grad, meta, maxv = w.solver_grad, w.solver_meta, w.solver_maxv
        gx, gy = w.solver_x, w.solver_y
        gpx, gpy = w.solver_px, w.solver_py

        gid0 = meta & 0xFFFFFF
        if do_forces:
            gax, gay = eval_layout_forces(
                force_specs, gx, gy, gid0, inputs, cfg
            )
        else:
            gax = gay = jnp.zeros_like(gx)
        mv = ((meta >> 24) & 8) != 0
        damping = jnp.float32(ph.verlet_damping)
        grav_x, grav_y = ph.gravity
        dx = (gx - gpx) * damping + grav_x + gax
        dy = (gy - gpy) * damping + grav_y + gay
        ms = jnp.where(maxv > 0, maxv, 100.0)
        dx = jnp.clip(dx, -ms, ms)
        dy = jnp.clip(dy, -ms, ms)
        gx1 = jnp.where(mv, gx + dx, gx)
        gy1 = jnp.where(mv, gy + dy, gy)
        gpx1 = jnp.where(mv, gx, gpx)
        gpy1 = jnp.where(mv, gy, gpy)

        import dataclasses

        g_moving = mv
        salt = w.step_count.astype(jnp.uint32)
        cfg_ss = dataclasses.replace(
            cfg, physics=dataclasses.replace(
                cfg.physics, sub_step_count=substeps
            )
        )
        gx2, gy2, gpx2, gpy2, g_count = _resident_substeps(
            gx1, gy1, gpx1, gpy1, grad, meta, g_moving, cfg_ss, tr, n_tiles,
            salt, True, False, carry_px=True,
            band=band if do_band else None,
        )

        if do_readback:
            out_flat = jnp.stack(
                [gx2, gy2, gpx2, gpy2, g_count.astype(jnp.float32)], axis=-1
            ).reshape(total, 5)
            rows = out_flat[jnp.where(in_grid, flat, 0)]
            new_x = jnp.where(in_grid, rows[:, 0], te.x)
            new_y = jnp.where(in_grid, rows[:, 1], te.y)
            new_px = jnp.where(in_grid, rows[:, 2], rbe.px)
            new_py = jnp.where(in_grid, rows[:, 3], rbe.py)
            new_cnt = jnp.where(in_grid, rows[:, 4].astype(jnp.int32), 0)
        else:
            new_x, new_y = te.x + gx2[0, HALO, 0], te.y
            new_px, new_py, new_cnt = rbe.px, rbe.py, rbe.collision_count

        w2 = w_e.replace(
            transform=te.replace(x=new_x, y=new_y),
            rigid_body=rbe.replace(
                px=new_px, py=new_py, collision_count=new_cnt,
            ),
            solver_x=gx2, solver_y=gy2, solver_px=gpx2, solver_py=gpy2,
            step_count=w.step_count + 1,
        )
        if do_derived:
            w2 = update_derived(w2, cfg)
        return w2

    results = {}
    variants = [
        ("full", {}),
        ("no_band(full_boundary)", {"do_band": False}),
        ("substeps1", {"substeps": 2 - 1}),
        ("no_forces", {"do_forces": False}),
        ("no_we", {"do_we": False}),
        ("no_readback", {"do_readback": False}),
        ("no_derived", {"do_derived": False}),
    ]
    for name, kw in variants:
        body = lambda _i, w, kw=kw: fast_step(w, **kw)
        results[name] = timed_loop(body, world, K)
        print(f"{name}: {results[name]} ms", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
