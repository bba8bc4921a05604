"""Per-tile occupancy of the settled 1M-balls solver layout — the data that
sizes the pair kernel's predication granularity.

The resident kernel (ops/pallas_kernels.py) skips an (offset, j) trip only if
the j-plane is empty across the WHOLE tile (tile_rows grid rows x all lane
columns). This probe settles the benchmark scene, then reports, per tile:
 - fraction of tiles with any entity (any_self skip rate),
 - per-(tile, j) occupancy: how many j planes a tile actually processes,
 - the same at finer column granularities (128/256/512-lane sub-tiles) —
   the projected work if the kernel predicated at that width instead.

Usage: python benchmarks/probe_tile_occupancy.py [n_balls] [settle_steps]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import json
import sys

import numpy as np


def main() -> None:
    n_balls = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    settle = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from multithreadedgameengine_tpu.models.balls import make_balls_engine
    from multithreadedgameengine_tpu.ops.pallas_kernels import HALO
    from multithreadedgameengine_tpu.ops.physics_grid import (
        resident_tile_rows,
    )

    scale = (n_balls / 10_000) ** 0.5
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
        # ladder's exact 1M knobs (run_ladder.rung_balls)
        physics=dict(
            sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
            boundary_elasticity=0.0, collision_response_strength=0.8,
            gravity=(0.0, 0.5), solver_capacity=12, rebin_interval=2,
        ),
    )
    eng.step(settle, block=True)

    cfg, geom, _ = eng._solver_plan(eng._resolve_spatial())
    snap = eng.snapshot()
    x = np.asarray(snap.transform.x)
    y = np.asarray(snap.transform.y)
    act = np.asarray(snap.transform.active)
    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)

    ok = act & np.isfinite(x) & np.isfinite(y)
    inv = 1.0 / geom.cell_size
    col = np.clip((x[ok] * inv).astype(np.int64), 0, C - 1)
    row = np.clip((y[ok] * inv).astype(np.int64), 0, R - 1)
    cid = row * C + col
    counts = np.bincount(cid, minlength=R * C).reshape(R, C)

    out = {
        "n": int(ok.sum()), "rows": R, "cols": C, "cap": cap,
        "tr": tr, "n_tiles": n_tiles, "cols_pad": cp,
        "mean_occ_occupied_cells": round(
            float(counts[counts > 0].mean()), 2
        ) if (counts > 0).any() else 0.0,
        "occupied_cell_frac": round(float((counts > 0).mean()), 3),
    }

    # per-tile max occupancy at several column-granularities: a j-plane is
    # processed when ANY cell in the (tile rows x col window) has count > j,
    # so the work at granularity W is sum over windows of min(max_count, cap)
    pad_r = n_tiles * tr - R
    cpad = np.pad(counts, ((0, pad_r), (0, 0)))
    tiles = cpad.reshape(n_tiles, tr, C)
    for width in (C, 512, 256, 128):
        nw = -(-C // width)
        wpad = np.pad(tiles, ((0, 0), (0, 0), (0, nw * width - C)))
        wmax = wpad.reshape(n_tiles, tr, nw, width).max(axis=(1, 3))
        planes = np.minimum(wmax, cap)  # j planes processed per window
        key = "full" if width == C else str(width)
        out[f"jplanes_mean_w{key}"] = round(float(planes.mean()), 2)
        out[f"jplanes_total_w{key}"] = int(planes.sum())
        if width == C:
            out["tiles_empty_frac"] = round(float((wmax == 0).mean()), 3)
            hist = np.bincount(planes.ravel(), minlength=cap + 1)
            out["tile_jplane_hist"] = {
                int(i): int(v) for i, v in enumerate(hist) if v
            }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
