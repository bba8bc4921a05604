"""Second-stage decomposition of the resident solver's 1M-entity frame.

profile_solver_parts.py showed: substeps cost 26.7 (first) / 12.6 (second)
ms, and the no-substep skeleton costs 38.8 ms where bin+scatter+readback
measure only 26.5 in isolation. This harness isolates, in-context:

 - skeleton minus binning (precomputed flat slots)  -> binning-in-context
 - substep loop with the pair kernel REPLACED by identity -> boundary+stitch
 - substep loop with boundary REMOVED (pair kernel only)  -> kernel+stitch

Usage: python benchmarks/profile_solver_parts2.py [n_balls] [K]
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
    from multithreadedgameengine_tpu.ops.pallas_kernels import (
        HALO, pair_pass_resident,
    )
    from multithreadedgameengine_tpu.ops.physics import _boundary
    from multithreadedgameengine_tpu.ops.physics_grid import (
        resident_tile_rows,
    )
    from multithreadedgameengine_tpu.ops.spatial import bin_entities

    scale = (n_balls / 10_000) ** 0.5
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
    )
    eng.step(3, block=True)
    eng.step(60)
    eng.sync()
    cfg, geom, _ = eng._solver_plan(eng._resolve_spatial())
    ph = cfg.physics
    world = eng.world
    t, rb, c = world.transform, world.rigid_body, world.collider
    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp
    results = {
        "layout_slots_M": round(total / 1e6, 1),
        "rows_buf": rows_buf, "cols_pad": cp, "cap": cap, "tile_rows": tr,
    }

    valid = t.active & jnp.isfinite(t.x) & jnp.isfinite(t.y)
    bins = jax.jit(
        lambda x, y: bin_entities(x, y, valid, geom, build_table=False)
    )(t.x, t.y)
    in_grid = valid & (bins.rank < cap)
    rank_safe = jnp.where(in_grid, bins.rank, 0)
    flat0 = (rank_safe * rows_buf + (HALO + bins.row)) * cp + (1 + bins.col)
    flat0 = jnp.where(in_grid, flat0, total)

    def scat(vals, dtype=jnp.float32):
        return (
            jnp.zeros((total,), dtype)
            .at[flat0]
            .set(vals.astype(dtype), mode="drop", unique_indices=True)
            .reshape(cap, rows_buf, cp)
        )

    # skeleton WITHOUT binning: scatters + readback over precomputed slots
    def skel_body(_i, carry):
        x, acc = carry
        gx = scat(x)
        gy = scat(t.y)
        grad = scat(c.radius)
        meta = scat(jnp.arange(x.shape[0], dtype=jnp.int32), jnp.int32)
        out_flat = jnp.stack(
            [gx, gy, gx, gy, meta.astype(jnp.float32)], axis=-1
        ).reshape(total, 5)
        rows = out_flat[jnp.where(in_grid, flat0, 0)]
        return x, acc + rows[:, 0]

    results["skeleton_no_bin"] = timed_loop(
        skel_body, (t.x, jnp.zeros_like(t.x)), K
    )

    # prebuilt layout for the substep probes
    gx0, gy0, grad0 = scat(t.x), scat(t.y), scat(c.radius)
    flags = (
        c.active.astype(jnp.int32)
        | (c.is_trigger.astype(jnp.int32) << 1)
        | (rb.static.astype(jnp.int32) << 2)
        | ((t.active & rb.active & ~rb.static).astype(jnp.int32) << 3)
    )
    meta0 = scat(
        jnp.arange(t.x.shape[0], dtype=jnp.int32) | (flags << 24), jnp.int32
    )
    g_moving = ((meta0 >> 24) & 8) != 0
    strength = float(ph.collision_response_strength)

    def boundary_phase(gx, gy, gpx, gpy):
        cx = jnp.clip(gx, grad0, cfg.world_width - grad0)
        gpx = jnp.where(g_moving & (cx != gx), cx, gpx)
        gx = jnp.where(g_moving, cx, gx)
        cy = jnp.clip(gy, grad0, cfg.world_height - grad0)
        gpy = jnp.where(g_moving & (cy != gy), cy, gpy)
        gy = jnp.where(g_moving, cy, gy)
        return gx, gy, gpx, gpy

    def make_substep(with_boundary: bool, with_kernel: bool):
        def substep(k, carry):
            gx, gy, gpx, gpy, cnt = carry
            if with_boundary:
                gx, gy, gpx, gpy = boundary_phase(gx, gy, gpx, gpy)
            if with_kernel:
                nx, ny, c_ = pair_pass_resident(
                    gx, gy, grad0, meta0,
                    jnp.uint32(0) + k.astype(jnp.uint32)
                    if hasattr(k, "astype") else jnp.uint32(k),
                    strength, tile_rows=tr,
                )
                pad = ((0, 0), (HALO, HALO), (0, 0))
                gx = jnp.concatenate(
                    [gx[:, :HALO], nx, gx[:, HALO + n_tiles * tr:]], axis=1)
                gy = jnp.concatenate(
                    [gy[:, :HALO], ny, gy[:, HALO + n_tiles * tr:]], axis=1)
                cnt = cnt + jnp.pad(c_, pad)
            else:
                gx = gx + 1e-7
                gy = gy + 1e-7
            return (gx, gy, gpx, gpy, cnt)

        return substep

    for name, (wb, wk, substeps) in {
        "boundary_only_x2": (True, False, 2),
        "kernel_only_x1": (False, True, 1),
        "kernel_only_x2": (False, True, 2),
        "full_substeps_x1": (True, True, 1),
        "full_substeps_x2": (True, True, 2),
    }.items():
        sub = make_substep(wb, wk)

        def body(i, carry, sub=sub, substeps=substeps):
            gx, gy, gpx, gpy, cnt = carry
            for k in range(substeps):
                gx, gy, gpx, gpy, cnt = sub(
                    i * substeps + k, (gx, gy, gpx, gpy, cnt))
            return (gx, gy, gpx, gpy, cnt)

        init = (
            gx0, gy0,
            jnp.full((cap, rows_buf, cp), jnp.nan, jnp.float32),
            jnp.full((cap, rows_buf, cp), jnp.nan, jnp.float32),
            meta0 * 0,
        )
        results[name] = timed_loop(body, init, K)

    print(json.dumps({
        k: (round(v * 1000, 2) if isinstance(v, float) else v)
        for k, v in results.items()
    }), flush=True)


if __name__ == "__main__":
    main()
