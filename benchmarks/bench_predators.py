"""Predators full-scene benchmark (BASELINE.md config 4): 15k prey + 8
predators + 5 lights + mouse, flocking/flee/hunt AI, LPC animation state
machine, 50k-particle pool with blood decals, lighting + shadow sprites —
the reference's heaviest demo (demos/predators/index.html:304-380).

Run: python benchmarks/bench_predators.py [n_prey]
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


def main() -> None:
    n_prey = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000

    import jax
    import numpy as np

    from multithreadedgameengine_tpu.models.predators import make_predators_engine

    t0 = time.time()
    eng = make_predators_engine(n_prey=n_prey)
    build = time.time() - t0

    t0 = time.time()
    eng.step(5, block=True)
    warm = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        eng.step(20, block=True)
        times.append((time.time() - t0) / 20)
    best = min(times)

    snap = eng.snapshot()
    act = np.asarray(snap.transform.active)
    assert np.isfinite(np.asarray(snap.transform.x)[act]).all()

    print(
        json.dumps(
            {
                "metric": f"predators_{n_prey}_steps_per_sec",
                "value": round(1.0 / best, 2),
                "unit": "steps/s",
                "ms_per_step": round(best * 1000, 2),
                "build_s": round(build, 1),
                "warmup_s": round(warm, 1),
                "active": int(act.sum()),
                "vs_baseline": round((1.0 / best) / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
