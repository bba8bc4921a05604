"""The full benchmark ladder (BASELINE.md configs 1-5) as ONE committed JSON
artifact, so round-over-round perf is auditable (VERDICT r1 weak #8 / next #10).

Run on the TPU:  python benchmarks/run_ladder.py [out.json]
Writes one JSON object per rung to stdout AND the aggregate to the out file
(default BENCH_LADDER.json).

Rungs:
 1. balls 10k / 100k / 1M steps/s (config 1 + the prueba_ecs 1M scale)
 2. pool churn: balls 10k with 256 despawns + 256 spawns every frame
    (config 2 — the free-list steady state, gameObject.js:794-951)
 3. boids-only 15k flocking over the spatial hash (config 3)
 4. predators full 15k: AI + animation + 50k particles + decals + lighting +
    shadows + collision events (config 4, demos/predators/index.html:304-380)

Config 5 (1M multi-chip halo) is validated by dryrun_multichip on a virtual
mesh — only one physical chip is reachable here; its single-chip number is
rung 1's 1M entry.

Axon notes: every program's first execution costs minutes (deploy); each rung
warms itself. block=True paths end in a real device_get barrier
(block_until_ready lies under the tunnel).
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


def _timed_steps(eng, chunk: int, reps: int = 3) -> float:
    """Best-of-reps seconds per step over chunked stepping."""
    times = []
    for _ in range(reps):
        t0 = time.time()
        eng.step(chunk)
        eng.sync()
        times.append((time.time() - t0) / chunk)
    return min(times)


def rung_balls(n_balls: int, chunk: int = 20) -> dict:
    import numpy as np

    from multithreadedgameengine_tpu.models.balls import make_balls_engine

    scale = (n_balls / 10_000) ** 0.5
    over = {}
    # The scene-tuned solver knobs apply from 100k up (round 5): the r3
    # "rebin at 100k is a wash" finding predates position residency — with
    # residency the rebuild is the dominant 100k cost, and the r5 probe
    # matrix (PROBE_RESIDENCY_100000.json) reads 224.5 steps/s at
    # interval 8 + residency vs 126.5 at interval 1 (residency itself is a
    # wash at interval 1: 126.5 vs 128.4 off). Occupancy-derived
    # solver_capacity is density-scale-invariant (world scales with
    # sqrt(N)), so the 1M histogram argument holds at 100k too.
    if n_balls >= 100_000:
        # scene-tuned solver knobs, as the reference demos hand-tune cellSize/
        # maxNeighbors per scene (demos/balls/index.html:100-140):
        #  - solver_capacity 12: the measured settled-pile occupancy histogram
        #    tops out at 11 with ZERO drops at cap 12 (profile_1m_inloop.py,
        #    BENCH notes) — pair work and layout memory scale with capacity;
        #  - rebin_interval 2: amortizes the 1M binning sort over two frames
        #    with the reference's own one-frame-stale candidate semantics
        #    (physics_worker.js:379-383). Values are the demo's own physics
        #    section (balls_config) — section overrides replace wholesale.
        # rebin_interval 8 + position residency (round 4): positions live in
        # the solver layout across frames (PROBE_RESIDENCY.json: cached
        # frames 27.9 ms vs 39.9 without residency), so the only interval
        # cost is the rebuild (~20 ms: binning argsort + 7 field scatters)
        # amortized /8 ≈ 2.6 ms. Staleness: candidates for cell-crossers lag
        # up to 7 frames — at this scene's speeds (≲3 px/frame vs the 75 px
        # solver cell with 25% reach slack) within the same accepted-staleness
        # class as the reference's free-running spatial worker at load
        # (physics_worker.js:379-383).
        over["physics"] = dict(
            sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
            boundary_elasticity=0.0, collision_response_strength=0.8,
            gravity=(0.0, 0.5), solver_capacity=12, rebin_interval=8,
        )
    eng = make_balls_engine(
        n_balls=n_balls, seed=123456,
        world_width=9000.0 * scale, world_height=4000.0 * scale,
        **over,
    )
    t0 = time.time()
    eng.step(5, block=True)
    warm = time.time() - t0
    best = _timed_steps(eng, chunk)
    y = np.asarray(eng.snapshot().transform.y)[1:]
    assert np.isfinite(y).all()
    return {
        "metric": f"balls_{n_balls}_steps_per_sec",
        "value": round(1.0 / best, 2),
        "unit": "steps/s",
        "ms_per_step": round(best * 1000, 2),
        "warmup_s": round(warm, 1),
        "vs_baseline": round((1.0 / best) / 60.0, 3),
    }


def rung_churn(
    n_balls: int = 10_000, churn: int = 256, frames: int = 60,
    plan_chunk: int = 30,
) -> dict:
    import numpy as np

    from multithreadedgameengine_tpu.models.balls import make_balls_engine

    eng = make_balls_engine(n_balls=n_balls, seed=123456)
    eng.step(5, block=True)  # warm the single-frame program
    rng = np.random.default_rng(7)

    def run_frames(count: int) -> None:
        # the device-resident control plane (FramePlan): per-frame despawn/
        # spawn op tables + input snapshots applied IN-program, one device
        # dispatch per plan_chunk frames — the reference spawns at 60 FPS
        # inside its running loop (gameObject.js:840-951); the previous
        # host-per-frame path paid ~2 tunnel dispatches per frame
        plan = eng.begin_plan()
        for _ in range(count):
            active = eng.active_indices("Ball")
            plan.despawn_batch(
                rng.choice(active, size=min(churn, active.size), replace=False)
            )
            plan.spawn_batch(
                "Ball", churn,
                x=rng.uniform(100, 8900, churn).astype(np.float32),
                y=rng.uniform(100, 1000, churn).astype(np.float32),
            )
            plan.next_frame()
        eng.run_plan(plan, max_chunk=plan_chunk)

    # warm TWICE: under the axon tunnel a program's first execution pays the
    # deploy and its SECOND pays a further one-time multi-second cost;
    # steady state starts at the third execution
    run_frames(plan_chunk)
    run_frames(plan_chunk)
    eng.sync()
    # best-of-3 (see rung_predators note on axon dispatch jitter)
    per = float("inf")
    for _ in range(3):
        t0 = time.time()
        run_frames(frames)
        eng.sync()
        per = min(per, (time.time() - t0) / frames)
    stats = eng.get_pool_stats("Ball")
    assert stats["active"] == n_balls  # churn conserves population
    return {
        "metric": f"balls_{n_balls}_churn{churn}_steps_per_sec",
        "value": round(1.0 / per, 2),
        "unit": "steps/s",
        "ms_per_step": round(per * 1000, 2),
        "vs_baseline": round((1.0 / per) / 60.0, 3),
    }


def rung_boids(n_boids: int = 15_000, chunk: int = 20) -> dict:
    import numpy as np

    from multithreadedgameengine_tpu import Engine, make_config
    from multithreadedgameengine_tpu.models.boids import Boid

    eng = Engine(make_config(
        world_width=5000.0, world_height=2000.0, seed=123456,
        spatial=dict(cell_size=50.0, max_neighbors=400, cell_capacity=32),
        physics=dict(sub_step_count=1),
    ))
    eng.register_entity_class(Boid, n_boids)
    eng.init()
    rng = np.random.default_rng(123456)
    eng.spawn_batch(
        "Boid", n_boids,
        x=rng.uniform(50, 4950, n_boids).astype(np.float32),
        y=rng.uniform(50, 1950, n_boids).astype(np.float32),
        vx=rng.uniform(-3, 3, n_boids).astype(np.float32),
        vy=rng.uniform(-3, 3, n_boids).astype(np.float32),
        call_on_spawned=False,
    )
    eng.step(5, block=True)
    best = _timed_steps(eng, chunk)
    return {
        "metric": f"boids_{n_boids}_steps_per_sec",
        "value": round(1.0 / best, 2),
        "unit": "steps/s",
        "ms_per_step": round(best * 1000, 2),
        "vs_baseline": round((1.0 / best) / 60.0, 3),
    }


def rung_predators(
    n_prey: int = 15_000, frames: int = 60, events: bool = True,
    event_chunk: int = 60,
) -> dict:
    # event_chunk 60 (one host event-log pull per 60 frames, every frame's
    # Enter/Stay/Exit still dispatched): measured 62.1 steps/s vs 59.1 at
    # chunk 30 — the per-chunk pull+dispatch is ~0.8 ms amortized across
    # the chunk. The reference's callback latency analog is its logic
    # worker free-running behind physics (logic_worker.js:417-526).
    import numpy as np

    from multithreadedgameengine_tpu.models.predators import make_predators_engine

    over = (
        {"logic": dict(
            collision_events=True, event_chunk=event_chunk,
            # double-buffered log: hook dispatch + log pull overlap the
            # next chunk's device execution (logic.event_overlap docs)
            event_overlap=True,
        )}
        if events else {}
    )
    eng = make_predators_engine(n_prey=n_prey, **over)
    eng.step(5, block=True)
    # with events on, stepping runs through the device event LOG
    # (logic.event_chunk frames per host roundtrip, every frame's
    # Enter/Stay/Exit dispatched — blood bursts included)
    eng.step(event_chunk if events else 5)
    eng.sync()
    # SINGLE-SHOT continuous stream (round 4, replacing best-of-3): three
    # event chunks dispatched back to back with ONE barrier at the end —
    # the reference's own free-running loop shape, and the pattern
    # logic.event_overlap exists for (hook dispatch + log pulls hide
    # behind the next chunk's device execution). 180 timed frames also
    # amortize the axon dispatch jitter that forced best-of-3 in r3.
    t0 = time.time()
    for _ in range(3):
        eng.step(frames)
    eng.sync()
    per = (time.time() - t0) / (3 * frames)
    act = np.asarray(eng.snapshot().transform.active)
    return {
        "metric": f"predators_{n_prey}_{'events' if events else 'noevents'}_steps_per_sec",
        "value": round(1.0 / per, 2),
        "unit": "steps/s",
        "ms_per_step": round(per * 1000, 2),
        "active": int(act.sum()),
        "vs_baseline": round((1.0 / per) / 60.0, 3),
    }


def rung_mixed_ladder(frames: int = 30) -> dict:
    """Memory-bound-max MIXED rung (VERDICT r4 next #6 asks for "1M or
    memory-bound max"): try 1M first, fall back down the ladder on device
    OOM and record both the requested and the achieved scale. Each attempt
    runs in ITS OWN subprocess — a RESOURCE_EXHAUSTED can leave the axon
    runtime wedged for subsequent allocations in-process."""
    import subprocess

    for n in (1_000_000, 600_000, 300_000):
        proc = subprocess.run(
            [sys.executable, "-u", __file__, "--rung", f"mixed:{n}"],
            capture_output=True, text=True, timeout=4000,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines()
             if ln.startswith("RUNG_JSON ")), None,
        )
        if line is not None:
            r = json.loads(line[len("RUNG_JSON "):])
            r["requested_n"] = 1_000_000
            if n < 1_000_000:
                r["note"] = (
                    f"memory-bound max on one v5e chip: {n} of 1M requested "
                    "(per-entity neighbor/candidate planes exceed HBM at 1M "
                    "single-chip; the 1M operating point is the sharded "
                    "homed-mixed path, dryrun rung 1e)"
                )
            return r
        err = (proc.stderr or "") + (proc.stdout or "")
        oom = any(pat in err for pat in (
            "RESOURCE_EXHAUSTED", "exceed memory", "exceeds memory",
            "out of memory", "Out of memory",
        ))
        if not oom:
            tail = err.strip().splitlines()[-3:]
            return {"metric": f"mixed_{n}", "error": " | ".join(tail)}
    return {"metric": "mixed", "error": "OOM at every rung size"}


def rung_mixed(
    n_prey: int = 1_000_000, frames: int = 30, event_chunk: int = 30,
    cell_size: float = 160.0, cell_capacity: int = 64,
) -> dict:
    """1M-entity MIXED rung (VERDICT r4 next #6): AI ticks + animation +
    collision events + particles + decals + lighting + shadows — the
    predators operating point (demos/predators/index.html:304-380) scaled
    ~8.2x per axis at CONSTANT DENSITY so per-entity neighbor counts match
    the 15k demo. One deliberate knob change: max_neighbors 1500 -> 64.
    At 1M rows the demo's 1500-lane neighbor list alone is 12 GB (ids+d2);
    the truncation semantics stay the reference's scan-order first-K
    (spatial_worker.js), only the cap differs — at demo density the
    128-px-cell 3x3 scan holds ~25 entities/cell avg, so 64 lanes truncate
    rarely."""
    import numpy as np

    from multithreadedgameengine_tpu.models.predators import (
        make_predators_engine,
    )

    scale = (n_prey / 15_000) ** 0.5
    eng = make_predators_engine(
        n_prey=n_prey, n_predators=max(8, n_prey // 2000), n_lights=5,
        spawn=False,
        world_width=5000.0 * scale, world_height=2000.0 * scale,
        # per_class_assembly: each class's candidate scan sized by ITS OWN
        # max visual range — without it every row pays the predators'
        # radius-2 scan (25 cells) and the [N, S, F] candidate payload is
        # 2.8x larger; at this scale that is the difference between
        # fitting HBM and not
        spatial=dict(cell_size=cell_size, max_neighbors=64,
                     cell_capacity=cell_capacity, per_class_assembly=True),
        logic=dict(collision_events=True, event_chunk=event_chunk,
                   event_overlap=True),
        physics=dict(
            sub_step_count=1, gravity=(0.0, 0.0), verlet_damping=0.99,
            collision_response_strength=0.9, boundary_elasticity=0.0,
            max_collision_pairs=1 << 18,
        ),
    )
    cfg = eng.config
    rng = np.random.default_rng(123456)
    n_pred = max(8, n_prey // 2000)
    eng.spawn_batch(
        "Prey", n_prey,
        x=(rng.random(n_prey) * cfg.world_width).astype(np.float32),
        y=(rng.random(n_prey) * cfg.world_height).astype(np.float32),
        call_on_spawned=False,
    )
    eng.spawn_batch(
        "Predator", n_pred,
        x=(rng.random(n_pred) * cfg.world_width).astype(np.float32),
        y=(rng.random(n_pred) * cfg.world_height).astype(np.float32),
        call_on_spawned=False,
    )
    for _ in range(5):
        eng.spawn("TallLight", x=eng.rng() * cfg.world_width,
                  y=eng.rng() * cfg.world_height)
    eng._flush_pending()
    t0 = time.time()
    eng.step(5, block=True)
    warm = time.time() - t0
    eng.step(event_chunk)
    eng.sync()
    t0 = time.time()
    for _ in range(3):
        eng.step(frames)
    eng.sync()
    per = (time.time() - t0) / (3 * frames)
    act = np.asarray(eng.snapshot().transform.active)
    return {
        "metric": f"mixed_{n_prey}_steps_per_sec",
        "value": round(1.0 / per, 2),
        "unit": "steps/s",
        "ms_per_step": round(per * 1000, 2),
        "warmup_s": round(warm, 1),
        "active": int(act.sum()),
        "vs_baseline": round((1.0 / per) / 60.0, 3),
    }


RUNGS = {
    "balls_10000": (rung_balls, (10_000,), {}),
    "balls_100000": (rung_balls, (100_000,), {}),
    # chunk 60: the ~30 ms axon dispatch RTT amortizes to ~0.5 ms/step
    # (same compiled program — n is a dynamic fori_loop bound)
    "balls_1000000": (rung_balls, (1_000_000,), {"chunk": 60}),
    "churn": (rung_churn, (), {}),
    "boids_15000": (rung_boids, (), {}),
    "predators_events": (rung_predators, (), {"events": True}),
    "predators_noevents": (rung_predators, (), {"events": False}),
    "mixed_1m": (rung_mixed_ladder, (), {}),
}


def main() -> None:
    # each rung runs in its OWN subprocess: the axon TPU runtime accumulates
    # per-process executable state that has wedged later rungs after an
    # earlier engine's programs ran (INVALID_ARGUMENT on otherwise-healthy
    # programs); process isolation also contains any one rung's crash
    if len(sys.argv) > 1 and sys.argv[1] == "--rung":
        from multithreadedgameengine_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
        name = sys.argv[2]
        if name.startswith("mixed:"):  # one attempt of the mixed size ladder
            r = rung_mixed(n_prey=int(name.split(":")[1]))
            print("RUNG_JSON " + json.dumps(r), flush=True)
            return
        fn, args, kw = RUNGS[name]
        print("RUNG_JSON " + json.dumps(fn(*args, **kw)), flush=True)
        return

    import subprocess

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LADDER.json"
    results = []
    for name in RUNGS:
        try:
            proc = subprocess.run(
                [sys.executable, "-u", __file__, "--rung", name],
                capture_output=True, text=True, timeout=4500,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines()
                 if ln.startswith("RUNG_JSON ")),
                None,
            )
            if line is None:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
                r = {"metric": name, "error": " | ".join(tail)}
            else:
                r = json.loads(line[len("RUNG_JSON "):])
        except Exception as e:  # keep the ladder going
            r = {"metric": name, "error": str(e)}
        print(json.dumps(r), flush=True)
        results.append(r)

    import jax

    with open(out_path, "w") as f:
        json.dump(
            {"backend": jax.default_backend(), "rungs": results}, f, indent=1
        )
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
