"""Decompose the residency FAST-branch frame at 1M (round 4): time each
phase of one_step_impl's residency path with IN-PROGRAM repetition (K-iter
fori_loop, data-dependent carry), so dispatch RTT divides by K. Complements
profile_1m_inloop.py (which measures the rebuild-side phases: binning,
scatters, pair pass, readback).

Usage: python benchmarks/probe_fast_parts.py [n_balls] [K]
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
        probe_layout_safe, run_logic_phase, eval_layout_forces,
    )
    from multithreadedgameengine_tpu.models.balls import make_balls_engine
    from multithreadedgameengine_tpu.ops.physics import update_derived
    from multithreadedgameengine_tpu.ops.physics_grid import (
        resident_persistent_step,
    )
    from multithreadedgameengine_tpu.ops.culling import update_entity_visibility
    from multithreadedgameengine_tpu.ops.spatial import (
        NeighborLists, NeighborPayload,
    )
    from multithreadedgameengine_tpu.render.extract import advance_animation

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
    t0 = time.time()
    eng.step(40)
    eng.sync()
    full = (time.time() - t0) / 40
    results = {"full_step": round(full * 1000, 3)}
    print(f"full step (interval 1000): {full*1000:.2f} ms", flush=True)

    cfg, geom, _forced = eng._solver_plan(eng._resolve_spatial())
    world = eng.world
    inputs = eng.input.snapshot()
    n = world.n_entities
    type_ranges = tuple(
        (reg.cls, reg.start_index, reg.count)
        for reg in eng.classes.values() if reg.count > 0
    )
    force_specs = tuple(
        (reg.cls.tick, reg.start_index, reg.count)
        for reg in eng.classes.values()
        if reg.count > 0 and getattr(reg.cls, "tick", None) is not None
        and probe_layout_safe(reg.cls, cfg)
    )
    dummy_nbr = NeighborLists(
        ids=jnp.full((n, 1), -1, jnp.int32),
        d2=jnp.zeros((n, 1), jnp.float32),
        count=jnp.zeros((n,), jnp.int32),
        n_binned=jnp.int32(-1),
        payload=NeighborPayload(data=jnp.zeros((n, 1, 0), jnp.float32)),
    )
    fc = eng._fc_np

    # phase: logic (entity-order masked ticks) + animation
    def logic_body(_i, w):
        w2, _em = run_logic_phase(w, dummy_nbr, inputs, cfg, type_ranges, {})
        return advance_animation(w2, fc, cfg.dt_ratio)

    results["logic_anim"] = timed_loop(logic_body, world, K)

    # phase: the resident physics step (FAST branch: keep pos_valid true by
    # advancing step_count exactly as the full step does)
    def phys_body(_i, w):
        w2, _nb, _ov, _bd = resident_persistent_step(
            w, cfg, geom, inputs, force_specs, cfg.dt_ratio, (0,),
            band_vel_bound=100.0,
        )
        w2 = update_derived(w2, cfg)
        return w2.replace(step_count=w2.step_count + 1)

    results["resident_step_derived"] = timed_loop(phys_body, world, K)

    # phase: visibility/cull tail + metrics sums
    def tail_body(_i, w):
        w2 = update_entity_visibility(w, cfg, inputs)
        m = (
            jnp.sum(w2.transform.active, dtype=jnp.int32)
            + jnp.sum(
                w2.transform.active & ~jnp.isfinite(w2.transform.x),
                dtype=jnp.int32,
            )
        )
        return w2.replace(step_count=w2.step_count + m * 0)

    results["cull_metrics"] = timed_loop(tail_body, world, K)

    # fast-branch internals: layout-space forces + Verlet (no pair pass)
    gx, gy = world.solver_x, world.solver_y
    gpx, gpy = world.solver_px, world.solver_py
    meta = world.solver_meta
    maxv = world.solver_maxv
    ph = cfg.physics

    def lv_body(_i, carry):
        gx, gy, gpx, gpy = carry
        gid0 = meta & 0xFFFFFF
        gax, gay = eval_layout_forces(force_specs, gx, gy, gid0, inputs, cfg)
        mv = ((meta >> 24) & 8) != 0
        damping = jnp.float32(ph.verlet_damping)
        gscale = jnp.float32(cfg.dt_ratio) ** 2
        dx = (gx - gpx) * damping + gscale * ph.gravity[0] + gax * cfg.dt_ratio
        dy = (gy - gpy) * damping + gscale * ph.gravity[1] + gay * cfg.dt_ratio
        ms = jnp.where(maxv > 0, maxv, 100.0)
        dx = jnp.clip(dx, -ms, ms)
        dy = jnp.clip(dy, -ms, ms)
        return (
            jnp.where(mv, gx + dx, gx), jnp.where(mv, gy + dy, gy),
            jnp.where(mv, gx, gpx), jnp.where(mv, gy, gpy),
        )

    results["layout_verlet_forces"] = timed_loop(lv_body, (gx, gy, gpx, gpy), K)

    # fast-branch internals: ONE boundary application (×2 per frame)
    from multithreadedgameengine_tpu.ops.physics_grid import _boundary

    grad = world.solver_grad
    g_moving = ((meta >> 24) & 8) != 0

    def bnd_body(_i, carry):
        gx, gy, gpx, gpy = carry
        gx, gpx = _boundary(gx, gpx, grad, cfg.world_width, g_moving,
                            ph.boundary_elasticity)
        gy, gpy = _boundary(gy, gpy, grad, cfg.world_height, g_moving,
                            ph.boundary_elasticity)
        return gx, gy, gpx, gpy

    results["boundary_x1"] = timed_loop(bnd_body, (gx, gy, gpx, gpy), K)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
