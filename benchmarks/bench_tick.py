"""Tick-throughput microbenchmark — the analog of the reference's job-system
and SoA harnesses (tests/jobs.html: 1k-100k entities × work complexity;
tests/prueba_ecs.html: 1M-entity static-array tick).

Measures the logic phase alone (no physics/spatial) across entity counts and
a synthetic per-entity work knob. Run:
    python benchmarks/bench_tick.py [complexity]
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


def run(n: int, complexity: int) -> dict:
    import jax
    import jax.numpy as jnp

    from multithreadedgameengine_tpu import Collider, Engine, EntityClass, RigidBody, make_config

    class Worker(EntityClass):
        components = [RigidBody, Collider]
        uses_neighbors = False

        @classmethod
        def setup(cls, ctx):
            # a known radius lets the engine resolve the grid solver geometry
            # and skip neighbor-list building entirely (colliders stay
            # inactive — this harness measures the LOGIC phase)
            return {"collider.radius": 40.0}

        @staticmethod
        def tick(ctx):
            # synthetic work: `complexity` dependent transcendental ops
            # (the jobs.html "work complexity" slider)
            v = ctx.x * 0.001 + 1.0
            for _ in range(complexity):
                v = jnp.sin(v) * 1.1 + jnp.cos(v * 0.7)
            return {"rigid_body.ax": v * 1e-6, "rigid_body.ay": ctx.ay}

    eng = Engine(make_config(
        world_width=10_000.0, world_height=10_000.0, seed=1,
        physics=dict(max_collision_pairs=1),
    ))
    eng.register_entity_class(Worker, n)
    eng.init()
    # activate all slots without per-entity python spawns (bulk init path)
    import numpy as np

    eng._flush_pending()
    w = eng.world
    rng = np.random.default_rng(0)
    eng.world = w.replace(
        transform=w.transform.replace(
            active=jnp.ones((w.n_entities,), bool),
            x=jnp.asarray(rng.uniform(0, 10_000, w.n_entities), jnp.float32),
            y=jnp.asarray(rng.uniform(0, 10_000, w.n_entities), jnp.float32),
        ),
        rigid_body=w.rigid_body.replace(active=jnp.ones((w.n_entities,), bool)),
    )
    eng.step(3, block=True)
    t0 = time.time()
    eng.step(30, block=True)
    dt = (time.time() - t0) / 30
    return {
        "metric": f"tick_{n}_c{complexity}_steps_per_sec",
        "value": round(1.0 / dt, 1),
        "unit": "steps/s",
        "entities_per_sec": round(n / dt / 1e6, 2),
        "unit2": "M entity-ticks/s",
    }


def main() -> None:
    complexity = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for n in (1_000, 10_000, 100_000, 1_000_000):
        print(json.dumps(run(n, complexity)), flush=True)


if __name__ == "__main__":
    main()
