"""Decompose grid_constraints_resident's UNACCOUNTED time at 1M entities.

profile_1m_inloop.py accounts bin + scatters + K*pair + readback; the full
solver measures ~26 ms more (BENCH notes r03). Suspects: the in-loop boundary
phase (elementwise over the 43M-slot layout, 2.3% occupied), the fori_loop
carry, the count pad/add, and the gpx/gpy NaN carries. This harness times the
solver at sub_step_count 0/1/2 (slope = true per-substep cost, intercept =
fixed overhead) and a boundary-only loop, plus capacity variants (the
occupancy histogram shows cap 12 drops nothing at the settled state).

Usage: python benchmarks/profile_solver_parts.py [n_balls] [K]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import dataclasses
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
        grid_constraints_resident, solver_geometry,
    )

    scale = (n_balls / 10_000) ** 0.5
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
    )
    eng.step(3, block=True)
    eng.step(60)
    eng.sync()

    cfg, geom, _ = eng._solver_plan(eng._resolve_spatial())
    world = eng.world
    results = {"cap": geom.capacity}

    def solver_at(substeps: int, capacity: int | None = None):
        c = dataclasses.replace(
            cfg, physics=dataclasses.replace(cfg.physics, sub_step_count=substeps)
        )
        g = geom if capacity is None else dataclasses.replace(geom, capacity=capacity)

        def body(_i, w):
            w2, _b, _o = grid_constraints_resident(w, c, g)
            return w2

        return timed_loop(body, world, K)

    for s in (0, 1, 2):
        results[f"solver_substeps_{s}"] = solver_at(s)
    # capacity variants at the production substep count
    for cap in (12, 16):
        if cap != geom.capacity:
            results[f"solver_cap{cap}_substeps_2"] = solver_at(2, capacity=cap)

    # slope/intercept decomposition
    s0, s1, s2 = (results[f"solver_substeps_{k}"] for k in (0, 1, 2))
    results["per_substep_cost"] = s2 - s1
    results["fixed_overhead"] = s0
    results["loop_entry_cost"] = s1 - s0 - (s2 - s1)
    print(json.dumps({k: round(v * 1000, 2) if isinstance(v, float) else v
                      for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
