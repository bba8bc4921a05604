"""Phase profile of the 1M-balls step with IN-PROGRAM repetition: each phase
runs K times inside one jitted fori_loop (data-dependent carry so XLA cannot
elide iterations), so the ~30 ms axon dispatch RTT divides by K instead of
polluting every sample. Complements profile_1m.py (per-call timings).

Usage: python benchmarks/profile_1m_inloop.py [n_balls] [K]
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
    """Time jit(fori_loop(0, K, body, init)); returns best seconds/iter."""
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
    from multithreadedgameengine_tpu.ops.physics import (
        update_derived, verlet_move,
    )
    from multithreadedgameengine_tpu.ops.physics_grid import (
        grid_constraints_resident, resident_tile_rows,
    )
    from multithreadedgameengine_tpu.ops.spatial import bin_entities
    from multithreadedgameengine_tpu.ops.pallas_kernels import (
        HALO, pair_pass_resident,
    )
    from multithreadedgameengine_tpu.ops.culling import update_entity_visibility
    from multithreadedgameengine_tpu.render.extract import advance_animation

    scale = (n_balls / 10_000) ** 0.5
    over = {}
    if n_balls >= 1_000_000:
        # ladder's exact 1M knobs (run_ladder.rung_balls)
        over["physics"] = dict(
            sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
            boundary_elasticity=0.0, collision_response_strength=0.8,
            gravity=(0.0, 0.5), solver_capacity=12, rebin_interval=2,
        )
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
        **over,
    )
    cfg = eng.config
    eng.step(3, block=True)
    t0 = time.time()
    eng.step(60)
    eng.sync()
    settle = (time.time() - t0) / 60
    print(f"settle: {settle*1000:.1f} ms/step", flush=True)

    cfg, geom, _ = eng._solver_plan(eng._resolve_spatial())
    world = eng.world
    t = world.transform
    results = {"full_step_amortized": settle}

    # occupancy of the SETTLED pile: how full do solver cells actually get?
    # (capacity sizes the kernel's i-plane count and the layout's slot count;
    # an over-provisioned cap is pure pair-pass waste)
    @jax.jit
    def occupancy(x, y):
        valid = t.active & jnp.isfinite(x) & jnp.isfinite(y)
        inv = 1.0 / geom.cell_size
        col = jnp.clip((x * inv).astype(jnp.int32), 0, geom.cols - 1)
        row = jnp.clip((y * inv).astype(jnp.int32), 0, geom.rows - 1)
        cid = jnp.where(valid, row * geom.cols + col, geom.num_cells)
        counts = jnp.zeros((geom.num_cells + 1,), jnp.int32).at[cid].add(1)
        counts = counts[:-1]
        hist = jnp.zeros((65,), jnp.int32).at[jnp.clip(counts, 0, 64)].add(1)
        over = {
            f"dropped_at_cap{c}": jnp.sum(jnp.maximum(counts - c, 0))
            for c in (8, 12, 16, 24, 32)
        }
        return counts.max(), hist, over

    cmax, hist, over = jax.device_get(occupancy(t.x, t.y))
    nz = {int(i): int(v) for i, v in enumerate(hist) if v}
    print(json.dumps({
        "max_cell_occupancy": int(cmax), "cap": geom.capacity,
        "cell_histogram": nz,
        **{k: int(v) for k, v in over.items()},
    }), flush=True)

    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp

    # phase: binning (carry: x — adds a dependency each iter)
    valid = t.active & jnp.isfinite(t.x) & jnp.isfinite(t.y)

    def bin_body(_i, x):
        b = bin_entities(x, t.y, valid, geom, build_table=False)
        return x + (b.rank == -1)  # never true: keeps the dep, adds ~0

    results["bin_entities"] = timed_loop(bin_body, t.x, K)

    # phase: the 4 per-field scatters (resident layout build)
    bins = jax.jit(
        lambda x, y: bin_entities(x, y, valid, geom, build_table=False)
    )(t.x, t.y)
    in_grid = valid & (bins.rank < cap)
    rank_safe = jnp.where(in_grid, bins.rank, 0)
    flat0 = (rank_safe * rows_buf + (HALO + bins.row)) * cp + (1 + bins.col)
    flat0 = jnp.where(in_grid, flat0, total)

    def scat_body(_i, carry):
        x, acc = carry

        def scat(vals, dtype=jnp.float32):
            return (
                jnp.zeros((total,), dtype)
                .at[flat0]
                .set(vals.astype(dtype), mode="drop", unique_indices=True)
            )

        gx = scat(x)
        gy = scat(t.y)
        grad = scat(world.collider.radius)
        meta = scat(jnp.arange(x.shape[0], dtype=jnp.int32), jnp.int32)
        return x, acc + gx[0] + gy[0] + grad[0] + meta[0].astype(jnp.float32)

    results["scatter_4fields"] = timed_loop(
        scat_body, (t.x, jnp.float32(0)), K
    )

    # phase: ONE pair pass (resident layout carry)
    def mk(vals, dtype=jnp.float32):
        return (
            jnp.zeros((total,), dtype)
            .at[flat0]
            .set(vals.astype(dtype), mode="drop", unique_indices=True)
            .reshape(cap, rows_buf, cp)
        )

    gx0, gy0 = mk(t.x), mk(t.y)
    grad0 = mk(world.collider.radius)
    rb = world.rigid_body
    flags = (
        world.collider.active.astype(jnp.int32)
        | (world.collider.is_trigger.astype(jnp.int32) << 1)
        | (rb.static.astype(jnp.int32) << 2)
        | ((t.active & rb.active & ~rb.static).astype(jnp.int32) << 3)
    )
    meta0 = mk(jnp.arange(t.x.shape[0], dtype=jnp.int32) | (flags << 24), jnp.int32)
    strength = float(cfg.physics.collision_response_strength)

    def pair_body(i, carry):
        gx, gy = carry
        nx, ny, _c = pair_pass_resident(
            gx, gy, grad0, meta0, i.astype(jnp.uint32), strength, tile_rows=tr
        )
        return (
            jnp.concatenate([gx[:, :HALO], nx, gx[:, HALO + n_tiles * tr:]], axis=1),
            jnp.concatenate([gy[:, :HALO], ny, gy[:, HALO + n_tiles * tr:]], axis=1),
        )

    results["pair_pass_x1"] = timed_loop(pair_body, (gx0, gy0), K)

    # phase: readback (stack + row gather)
    def read_body(_i, carry):
        gx, acc = carry
        out_flat = jnp.stack([gx, gy0, gx, gy0, gx], axis=-1).reshape(total, 5)
        rows = out_flat[jnp.where(in_grid, flat0, 0)]
        return gx, acc + rows[:, 0]

    results["readback_stack_gather"] = timed_loop(
        read_body, (gx0, jnp.zeros_like(t.x)), K
    )

    # phase: whole resident solver
    def solver_body(_i, w):
        w2, _b, _o = grid_constraints_resident(w, cfg, geom)
        return w2

    results["grid_constraints_resident"] = timed_loop(solver_body, world, K)

    # phase: verlet + derived + animation + visibility (the non-solver tail)
    fc = eng._frame_counts()
    inputs = eng.input.snapshot()

    def tail_body(_i, w):
        w = verlet_move(w, cfg, cfg.dt_ratio)
        w = update_derived(w, cfg)
        w = advance_animation(w, fc, cfg.dt_ratio)
        w = update_entity_visibility(w, cfg, inputs)
        return w

    results["verlet_derived_anim_vis"] = timed_loop(tail_body, world, K)

    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
