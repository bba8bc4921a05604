"""Phase-level profile of the 1M-balls step on the real TPU.

Times each stage of the fused step as its own jitted program so the 1M
optimization work (VERDICT r1 next #2) targets the real hot terms instead of
guesses. Each phase warms once (axon deploy cost) then takes best-of-reps.

Usage: python benchmarks/profile_1m.py [n_balls]
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
    from multithreadedgameengine_tpu.ops.physics_grid import grid_constraints
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

    # phase: per-field scatters into the resident slot-major layout
    from multithreadedgameengine_tpu.ops.pallas_kernels import (
        HALO,
        pair_pass_resident,
    )
    from multithreadedgameengine_tpu.ops.physics_grid import (
        resident_tile_rows,
    )

    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp

    def scatter_fields(w, b):
        t, rb, c = w.transform, w.rigid_body, w.collider
        in_grid = valid & (b.rank < cap)
        rank_safe = jnp.where(in_grid, b.rank, 0)
        flat = (rank_safe * rows_buf + (HALO + b.row)) * cp + (1 + b.col)
        flat = jnp.where(in_grid, flat, total)

        def scat(vals, dtype=jnp.float32):
            return (
                jnp.zeros((total,), dtype)
                .at[flat]
                .set(vals.astype(dtype), mode="drop", unique_indices=True)
                .reshape(cap, rows_buf, cp)
            )

        nn = t.x.shape[0]
        flags = (
            c.active.astype(jnp.int32)
            | (c.is_trigger.astype(jnp.int32) << 1)
            | (rb.static.astype(jnp.int32) << 2)
            | ((t.active & rb.active & ~rb.static).astype(jnp.int32) << 3)
        )
        meta = scat(jnp.arange(nn, dtype=jnp.int32) | (flags << 24), jnp.int32)
        return (
            scat(t.x), scat(t.y), scat(rb.px), scat(rb.py),
            scat(c.radius), meta,
        )

    sf = jax.jit(scatter_fields)
    best, (gx, gy, gpx, gpy, grad, meta) = timed(sf, world_m, bins)
    results["scatter_6fields"] = best

    # phase: ONE resident pair pass (kernel only, no layout shuffles)
    pp = jax.jit(lambda x, y, r, m, s: pair_pass_resident(
        x, y, r, m, s, float(cfg.physics.collision_response_strength),
        tile_rows=tr,
    ))
    best, _ = timed(pp, gx, gy, grad, meta, world_m.step_count.astype(jnp.uint32))
    results["pair_pass_resident_x1"] = best

    # phase: whole grid_constraints (scatter + substeps + gather-back)
    gc = jax.jit(lambda w: grid_constraints(w, cfg, geom)[0])
    best, _ = timed(gc, world_m)
    results["grid_constraints_total"] = best

    # phase: derived speed/angle
    ud = jax.jit(lambda w: update_derived(w, cfg))
    best, _ = timed(ud, world_m)
    results["update_derived"] = best

    # --- the step phases OUTSIDE physics (the full_step-minus-parts gap) ---
    from multithreadedgameengine_tpu.behavior import run_logic_phase
    from multithreadedgameengine_tpu.engine import apply_inputs
    from multithreadedgameengine_tpu.ops.culling import update_entity_visibility
    from multithreadedgameengine_tpu.ops.spatial import (
        NeighborLists, NeighborPayload,
    )
    from multithreadedgameengine_tpu.render.extract import advance_animation

    type_ranges = tuple(
        (reg.cls, reg.start_index, reg.count)
        for reg in eng.classes.values() if reg.count > 0
    )
    fc = eng._frame_counts()
    nn = world.transform.x.shape[0]
    empty_nbr = NeighborLists(
        ids=jnp.full((nn, 1), -1, jnp.int32),
        d2=jnp.zeros((nn, 1), jnp.float32),
        count=jnp.zeros((nn,), jnp.int32),
        n_binned=jnp.int32(-1),
        payload=NeighborPayload(data=jnp.zeros((nn, 1, 0), jnp.float32)),
    )

    lg = jax.jit(lambda w, i: run_logic_phase(
        w, empty_nbr, i, cfg, type_ranges, {}
    )[0])
    best, _ = timed(lg, world_m, inputs)
    results["logic_phase"] = best

    aa = jax.jit(lambda w: advance_animation(w, fc, cfg.dt_ratio))
    best, _ = timed(aa, world_m)
    results["advance_animation"] = best

    uv = jax.jit(lambda w, i: update_entity_visibility(w, cfg, i))
    best, _ = timed(uv, world_m, inputs)
    results["update_entity_visibility"] = best

    wi = jax.jit(lambda w, i: apply_inputs(w, i))
    best, _ = timed(wi, world_m, inputs)
    results["write_inputs"] = best

    occ = jax.device_get(jnp.sum(meta != 0))
    print(json.dumps({
        "n": n_balls,
        "grid_slots": int(total),
        "occupied": int(occ),
        **{k: round(v * 1000, 2) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
