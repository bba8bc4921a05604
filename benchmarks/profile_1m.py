"""Phase-level profile of the 1M-balls step on the real TPU.

Times each stage of the fused step as its own jitted program so the 1M
optimization work (VERDICT r1 next #2) targets the real hot terms instead of
guesses. Each phase warms once (axon deploy cost) then takes best-of-reps.

Usage: python benchmarks/profile_1m.py [n_balls]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def _sync(out):
    # tiny device_get as the barrier — block_until_ready lies under axon, and
    # device_get of a full leaf would pull MBs through the tunnel
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, *args, reps: int = 5, warm: int = 2):
    out = None
    for _ in range(warm):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    n_balls = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from multithreadedgameengine_tpu.models.balls import make_balls_engine
    from multithreadedgameengine_tpu.ops.physics import (
        update_derived,
        verlet_move,
    )
    from multithreadedgameengine_tpu.ops.physics_grid import (
        grid_constraints,
        pack_solver_rows,
        run_solver_substeps,
        scatter_solver_grid,
    )
    from multithreadedgameengine_tpu.ops.spatial import bin_entities

    scale = (n_balls / 10_000) ** 0.5
    t0 = time.time()
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
    )
    print(f"engine built in {time.time()-t0:.1f}s", flush=True)
    cfg = eng.config
    # settle so the profile sees the piled steady state, not the airborne one
    eng.step(3, block=True)
    t0 = time.time()
    eng.step(60)
    eng.sync()
    print(f"settle: {(time.time()-t0)/60*1000:.1f} ms/step", flush=True)

    cfg, geom, _ = eng._solver_plan(eng._resolve_spatial())
    print(f"solver geom: {geom}, solver={cfg.physics.solver}", flush=True)
    world = eng.world

    results = {}

    # full fused step
    full_fn = jax.jit(lambda w, i: eng._one_step_raw(w, i)[0])
    inputs = eng.input.snapshot()
    best, _ = timed(full_fn, world, inputs)
    results["full_step"] = best

    # phase: verlet integrate
    mv = jax.jit(lambda w: verlet_move(w, cfg, cfg.dt_ratio))
    best, world_m = timed(mv, world)
    results["verlet_move"] = best

    # phase: binning (rank/row/col only, as the grid solver uses it)
    t = world_m.transform
    valid = t.active & jnp.isfinite(t.x) & jnp.isfinite(t.y)
    bin_fn = jax.jit(
        lambda x, y, v: bin_entities(x, y, v, geom, build_table=False)
    )
    best, bins = timed(bin_fn, t.x, t.y, valid)
    results["bin_entities"] = best

    # phase: pack + scatter into grid layout
    R, C, cap = geom.rows, geom.cols, geom.capacity
    flat_cells = (R + 2) * (C + 2) * cap

    def pack_scatter(w, b):
        packed = pack_solver_rows(w)
        flat_idx = ((b.row + 1) * (C + 2) + (b.col + 1)) * cap + b.rank
        in_grid = valid & (b.rank < cap)
        flat_idx = jnp.where(in_grid, flat_idx, flat_cells)
        return scatter_solver_grid(packed, flat_idx, R, C, cap), flat_idx

    ps = jax.jit(pack_scatter)
    best, (grid, flat_idx) = timed(ps, world_m, bins)
    results["pack_scatter"] = best

    # phase: substep loop (2 substeps; pallas or xla per config)
    sub = jax.jit(
        lambda g, s: run_solver_substeps(g, geom, cfg, s)
    )
    best, _ = timed(sub, grid, world_m.step_count.astype(jnp.uint32))
    results[f"substeps_x{cfg.physics.sub_step_count}_{cfg.physics.solver}"] = best

    # phase: whole grid_constraints (scatter + substeps + gather-back)
    gc = jax.jit(lambda w: grid_constraints(w, cfg, geom)[0])
    best, _ = timed(gc, world_m)
    results["grid_constraints_total"] = best

    # phase: derived speed/angle
    ud = jax.jit(lambda w: update_derived(w, cfg))
    best, _ = timed(ud, world_m)
    results["update_derived"] = best

    occ = jax.device_get(jnp.sum(grid[..., 6] >= 0))
    print(json.dumps({
        "n": n_balls,
        "grid_slots": int((R + 2) * (C + 2) * cap),
        "occupied": int(occ),
        **{k: round(v * 1000, 2) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
