"""Halo-step scaling evidence at 1M entities on the virtual CPU mesh
(VERDICT r2 next #3: back the v5e-8 projection with measurements).

This host exposes ONE physical core, so wall-clock over 1..8 virtual devices
measures nothing about parallel speedup — 8 virtual devices time-slice one
core. What a 1-core host CAN measure honestly:

 - **total-work overhead**: the halo-sharded program's wall time on D virtual
   devices vs the single-chip program at the same scale approximates
   (total work + routing/collectives) / (total work). On D real chips the
   expected speedup is ≈ D / (1 + overhead), modulo ICI latency that a
   virtual mesh cannot see.
 - **communication volume**: bytes entering collectives per device per step
   (all_to_all routing both ways for both phases, ppermute halo rows,
   psums), reported analytically from the built geometry. The all_to_all
   self-block (entities already on their home slab — the vast majority)
   never crosses ICI on hardware, so the cross-chip bound reported here is
   the boundary-traffic estimate, not the full buffer size.

Writes HALO_SCALING.json. Each mesh size runs in its own subprocess (the
virtual device count is process-global).

Usage: python benchmarks/halo_scaling.py [n_entities] [out.json]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

# repo-root bootstrap: these harnesses run as scripts (and as rung
# subprocesses) where sys.path[0] is benchmarks/, not the repo root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import json
import math
import subprocess
import sys
import time

DEFAULT_N = 1_000_000


def run_one(n: int, n_dev: int, scene: str = "balls",
            oversub: float = 4.0, mode: str = "halo") -> dict:
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from multithreadedgameengine_tpu.parallel import make_halo_step, make_mesh
    from multithreadedgameengine_tpu.parallel.halo import entity_leaf_specs

    n_total = (n // n_dev) * n_dev
    if scene == "predators":
        # BASELINE config 5's MIXED feature set sharded: flocking AI +
        # collision events + device emit + lighting/shadow sprites + decals
        # under the halo step (scaled-down entity count; same per-entity
        # work). Entity slots: mouse + prey + 24 predators + 7 lights.
        from multithreadedgameengine_tpu.models.predators import (
            make_predators_engine,
        )

        n_prey = n_total - 32
        scale = (n_total / 15_028) ** 0.5
        eng = make_predators_engine(
            n_prey=n_prey, n_predators=24, n_lights=7,
            world_width=7000.0 * scale, world_height=3500.0 * scale,
            logic=dict(collision_events=True),
        )
    elif scene == "boids":
        # flocking ticks + neighbor tables under the halo step: measures the
        # logic phase's ×(ticking classes) mask cost at scale (VERDICT r2
        # weak #5); mirrors the dryrun rung-1 construction
        from multithreadedgameengine_tpu import Engine, make_config
        from multithreadedgameengine_tpu.models.boids import Boid

        scale = (n_total / 102_400) ** 0.5
        eng = Engine(make_config(
            world_width=12_000.0 * scale, world_height=6_000.0 * scale,
            seed=123456,
            spatial=dict(cell_size=100.0, max_neighbors=48, cell_capacity=32),
            physics=dict(sub_step_count=1),
        ))
        eng.register_entity_class(Boid, n_total - 1)
        eng.init()
        rng = np.random.default_rng(123456)
        m = n_total - 1
        eng.spawn_batch(
            "Boid", m,
            x=rng.uniform(50, 12_000.0 * scale - 50, m).astype(np.float32),
            y=rng.uniform(50, 6_000.0 * scale - 50, m).astype(np.float32),
            vx=rng.uniform(-3, 3, m).astype(np.float32),
            vy=rng.uniform(-3, 3, m).astype(np.float32),
            call_on_spawned=False,
        )
    else:
        from multithreadedgameengine_tpu.models.balls import make_balls_engine

        scale = (n_total / 10_000) ** 0.5
        eng = make_balls_engine(
            n_balls=n_total - 1, seed=123456,
            world_width=9000.0 * scale, world_height=4000.0 * scale,
        )
    eng._flush_pending()

    steps = 2
    if n_dev == 1 and scene != "predators":
        # single-chip program at the same scale = the work-only baseline
        # (warm with the SAME chunk length: each distinct n compiles its own
        # chunk program)
        eng.step(steps, block=True)
        t0 = time.time()
        eng.step(steps)
        eng.sync()
        per = (time.time() - t0) / steps
        return {"n_devices": 1, "ms_per_step": round(per * 1000, 1)}
    if n_dev == 1:
        # predators: the engine's single-chip EVENTS path is structurally
        # different (host-chunked event log + hook dispatch vs the halo
        # step's in-program diff), so the work-only baseline is the SAME
        # halo program on a 1-device mesh — one slab, degenerate collectives
        from multithreadedgameengine_tpu.parallel import (
            make_halo_step, make_mesh,
        )

        mesh = make_mesh(1, axis_name="slab")
        step, place = make_halo_step(eng, mesh, oversub=oversub,
                                     check_vma=False)
        world = place(eng.world)
        ins = eng.input.snapshot()
        world, _m = step(world, ins)
        jax.device_get(world.step_count)
        t0 = time.time()
        for _ in range(steps):
            world, _m = step(world, ins)
        jax.device_get(world.step_count)
        per = (time.time() - t0) / steps
        return {
            "n_devices": 1, "ms_per_step": round(per * 1000, 1),
            "baseline": "halo_program_single_slab",
        }

    if mode == "homed":
        # POSITION-HOMED step (parallel/homed.py, round 4): per-frame
        # routing = boundary-crossing movers only; the defining comparison
        # vs the index-homed step's route-everyone all_to_alls
        from multithreadedgameengine_tpu.parallel import (
            make_homed_step, make_mesh,
        )

        mesh = make_mesh(n_dev, axis_name="slab")
        # headroom 1.25 / solver_oversub = scene oversub: phase A shapes
        # scale with the chunk capacity, so uniform scenes keep it tight
        # (NOTE on 1-core-mesh semantics: wall time here measures per-device
        # COMPUTE shapes, not interconnect — the homed step's defining win,
        # routing ~0.1% of rows instead of everyone, shows in
        # migrated_rows_per_step and the analytic comms volume)
        # adjacent_frac None = seam-geometry auto (round 5): solver bands
        # align to the spatial seams, so the adjacent-exchange block sizes
        # from cell_s/2 rounding residue + the scene's actual max_vel — no
        # hand-tuning per D (the r04 artifact needed 0.25→0.45 at D=8).
        # headroom 1.125: uniform-density load imbalance is ~1% (3σ at
        # 12.8k rows/slab); denied movers retry as violators, so tighter
        # headroom risks only transient degradation, never loss.
        step, place, _un, _ctl = make_homed_step(
            eng, mesh, headroom=1.125,
            check_vma=False,
        )
        world, gid = place(eng.world)
        ins = eng.input.snapshot()
        world, gid, metrics = step(world, gid, ins)  # warm (compile)
        jax.device_get(world.step_count)
        t0 = time.time()
        for _ in range(steps):
            world, gid, metrics = step(world, gid, ins)
        jax.device_get(world.step_count)
        per = (time.time() - t0) / steps
        return {
            "n_devices": n_dev, "mode": "homed",
            "ms_per_step": round(per * 1000, 1),
            "per_device_chunk_slots": int(
                world.transform.x.shape[0] // n_dev
            ),
            "migrated_rows_per_step": int(
                jax.device_get(metrics["migrated_rows"])
            ),
            "home_violators": int(jax.device_get(metrics["home_violators"])),
            "route_overflow_solver": int(
                jax.device_get(metrics["route_overflow_solver"])
            ),
        }

    # route-capacity oversubscription is a SCENE property: gravity piles
    # concentrate most entities in the bottom slabs (needs ~4x headroom);
    # uniform-density flocking needs only mild slack. Per-device routed work
    # is D*cap_route = min(oversub*n_loc, n_glob) rows, so an honest tight
    # oversub is what lets per-slab work actually shrink with D.
    # check_vma=False matches the real-TPU configuration (the Pallas solver
    # disables the checker there); the identity replication-mark collectives
    # it would insert are pure emulation overhead on the CPU mesh.
    # Replication correctness is pinned by tests/test_halo*.py.
    mesh = make_mesh(n_dev, axis_name="slab")
    step, place = make_halo_step(eng, mesh, oversub=oversub,
                                 check_vma=False)
    world = place(eng.world)
    ins = eng.input.snapshot()
    world, metrics = step(world, ins)  # warm (compile)
    jax.device_get(world.step_count)
    t0 = time.time()
    for _ in range(steps):
        world, metrics = step(world, ins)
    jax.device_get(world.step_count)
    per = (time.time() - t0) / steps

    # analytic comms volume per device per step (buffer-entry bound; the
    # SAME formula the step uses — imported, so it cannot drift)
    from multithreadedgameengine_tpu.parallel.halo import route_capacity

    n_loc = n_total // n_dev
    lanes = len(entity_leaf_specs(eng.world)) + 1  # +gid lane
    cap_route = route_capacity(n_loc, n_dev, oversub)
    a2a_bytes = 2 * 2 * n_dev * cap_route * max(lanes, 8) * 4  # A+B, out+back
    cfg = eng.config
    sp = cfg.spatial
    cols_g = cfg.grid_cols
    halo_rows_bytes = (
        2 * sp.max_cell_radius * cols_g * sp.cell_capacity * 4 * 4
    )  # spatial table halo rows, both directions, ~4 channels
    return {
        "n_devices": n_dev,
        "ms_per_step": round(per * 1000, 1),
        "route_overflow_logic": int(jax.device_get(metrics["route_overflow_logic"])),
        "per_device_shard": n_loc,
        "route_oversub": oversub,
        "routed_rows_per_dev": n_dev * cap_route,
        "comms_alltoall_buffer_mb_per_dev_step": round(a2a_bytes / 2**20, 1),
        "comms_halo_rows_mb_per_dev_step": round(halo_rows_bytes / 2**20, 2),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_N
    out_path = sys.argv[2] if len(sys.argv) > 2 else "HALO_SCALING.json"
    scene = "balls"
    if "--boids" in sys.argv:
        scene = "boids"
    elif "--predators" in sys.argv:
        scene = "predators"
    # default oversub: piles need ~4x (balls); uniform flocking ~1.5x;
    # predator-prey flee dynamics cluster harder than plain boids
    oversub = {"boids": 1.5, "predators": 2.5}.get(scene, 4.0)
    if "--oversub" in sys.argv:
        oversub = float(sys.argv[sys.argv.index("--oversub") + 1])
    mode = "homed" if "--homed" in sys.argv else "halo"
    if "--one" in sys.argv:
        n_dev = int(sys.argv[sys.argv.index("--one") + 1])
        print(
            "ONE_JSON " + json.dumps(run_one(n, n_dev, scene, oversub, mode)),
            flush=True,
        )
        return

    import os

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    results = []
    for n_dev in (1, 2, 4, 8):
        proc = subprocess.run(
            [sys.executable, "-u", __file__, str(n), out_path, "--one", str(n_dev)]
            + ([f"--{scene}"] if scene != "balls" else [])
            + (["--homed"] if mode == "homed" else [])
            + ["--oversub", str(oversub)],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("ONE_JSON ")),
            None,
        )
        if line is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            r = {"n_devices": n_dev, "error": " | ".join(tail)}
        else:
            r = json.loads(line[len("ONE_JSON "):])
        print(json.dumps(r), flush=True)
        results.append(r)

    base = next((r["ms_per_step"] for r in results
                 if r.get("n_devices") == 1 and "ms_per_step" in r), None)
    summary = {
        "n_entities": n, "scene": scene, "mode": mode, "host_cores": 1,
        "route_oversub": oversub, "rungs": results,
    }
    if base:
        for r in results:
            if "ms_per_step" in r and r["n_devices"] > 1:
                overhead = r["ms_per_step"] / base - 1.0
                r["total_work_overhead"] = round(overhead, 3)
                r["projected_speedup_on_real_chips"] = round(
                    r["n_devices"] / (1.0 + max(overhead, 0.0)), 2
                )
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
