"""Phase-level profile of the predators-full step on the real TPU
(VERDICT r1 next #4: make predators beat 60 steps/s).

Times each stage of the fused step as its own jitted program. Phases overlap
in the fused step, so the sum is an upper bound; ratios locate hot spots.

Usage: python benchmarks/profile_predators.py [n_prey]
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


def timed(fn, *args, reps: int = 10, warm: int = 2):
    out = None
    for _ in range(warm):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
    return (time.time() - t0) / reps, out


def main() -> None:
    n_prey = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000
    from multithreadedgameengine_tpu.behavior import run_logic_phase
    from multithreadedgameengine_tpu.models.predators import (
        make_predators_engine,
    )
    from multithreadedgameengine_tpu.ops.culling import (
        update_entity_visibility,
        update_particle_visibility,
    )
    from multithreadedgameengine_tpu.ops.decals import (
        default_decal_textures,
        stamp_decals,
    )
    from multithreadedgameengine_tpu.ops.lighting import shadow_sprites
    from multithreadedgameengine_tpu.ops.particles import update_particles
    from multithreadedgameengine_tpu.ops.physics import physics_step
    from multithreadedgameengine_tpu.ops.spatial import neighbor_lists
    from multithreadedgameengine_tpu.render.extract import advance_animation
    from multithreadedgameengine_tpu.behavior import read_field

    t0 = time.time()
    eng = make_predators_engine(n_prey=n_prey)
    print(f"engine built in {time.time()-t0:.1f}s", flush=True)
    eng.step(5, block=True)
    eng.step(30)
    eng.sync()

    cfg = eng._resolve_spatial()
    cfg, geom, _forced = eng._solver_plan(cfg)
    payload_channels, extra_paths = eng._payload_plan(cfg)
    type_ranges = tuple(
        (r.cls, r.start_index, r.count)
        for r in eng.classes.values() if r.count > 0
    )
    world = eng.world
    inputs = eng.input.snapshot()
    frame_counts = eng._frame_counts()

    results = {}

    full_fn = jax.jit(lambda w, i: eng._one_step_raw(w, i)[0])
    best, _ = timed(full_fn, world, inputs)
    results["full_step"] = best

    nbr_fn = jax.jit(lambda w: neighbor_lists(
        w.transform.x, w.transform.y, w.transform.active,
        w.collider.visual_range, cfg,
        tuple(read_field(w, p) for p in extra_paths),
    ))
    best, nbr = timed(nbr_fn, world)
    results["neighbor_lists"] = best
    print(f"payload: S={nbr.ids.shape[1]} F={nbr.payload.data.shape[-1]}",
          flush=True)

    logic_fn = jax.jit(lambda w, nb: run_logic_phase(
        w, nb, inputs, cfg, type_ranges, payload_channels)[0])
    best, _ = timed(logic_fn, world, nbr)
    results["logic"] = best

    phys_fn = jax.jit(lambda w, nb: physics_step(
        w, nb, cfg, cfg.dt_ratio, solver_geom=geom))
    best, _ = timed(phys_fn, world, nbr)
    results["physics"] = best

    part_fn = jax.jit(lambda p: update_particles(p, cfg, cfg.dt_ratio, True))
    best, (pool, stamps, _n) = timed(part_fn, world.particles)
    results["particles"] = best

    textures = default_decal_textures(len(eng.sprites.textures))
    dec_fn = jax.jit(lambda c, d, s: stamp_decals(c, d, s, textures, cfg))
    best, _ = timed(dec_fn, world.decal_canvas, world.decal_dirty, stamps)
    results["decals"] = best

    shad_fn = jax.jit(lambda w, nb: shadow_sprites(w, nb, cfg))
    best, _ = timed(shad_fn, world, nbr)
    results["shadow_sprites"] = best

    cull_fn = jax.jit(lambda w: update_entity_visibility(
        update_particle_visibility(w, cfg, inputs), cfg, inputs))
    best, _ = timed(cull_fn, world)
    results["culling"] = best

    anim_fn = jax.jit(lambda w: advance_animation(w, frame_counts, cfg.dt_ratio))
    best, _ = timed(anim_fn, world)
    results["animation"] = best

    print(json.dumps({
        "n_prey": n_prey,
        "solver": cfg.physics.solver,
        **{k: round(v * 1000, 2) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
