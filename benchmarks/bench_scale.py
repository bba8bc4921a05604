"""Scale ladder benchmark (BASELINE.md configs): balls-style physics at
10k → 1M entities on one chip. Run: python benchmarks/bench_scale.py [sizes...]

Writes one JSON line per size to stdout.
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


def run_size(n_balls: int, chunk: int = 20) -> dict:
    import jax
    import numpy as np

    from multithreadedgameengine_tpu.models.balls import make_balls_engine

    # world scaled to keep density comparable to the 10k demo scene
    # (10k in 9000x4000); radius distribution identical (10-30)
    scale = (n_balls / 10_000) ** 0.5
    eng = make_balls_engine(
        n_balls=n_balls,
        seed=123456,
        world_width=9000.0 * scale,
        world_height=4000.0 * scale,
    )
    t0 = time.time()
    eng.step(5, block=True)  # block=True syncs via device_get internally
    warm = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        eng.step(chunk, block=True)
        times.append((time.time() - t0) / chunk)
    best = min(times)
    snap = eng.snapshot()
    y = np.asarray(snap.transform.y)[1:]
    assert np.isfinite(y).all()
    return {
        "metric": f"balls_{n_balls}_physics_steps_per_sec",
        "value": round(1.0 / best, 2),
        "unit": "steps/s",
        "ms_per_step": round(best * 1000, 2),
        "warmup_s": round(warm, 1),
        "vs_baseline": round((1.0 / best) / 60.0, 3),
    }


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [10_000, 100_000, 1_000_000]
    for n in sizes:
        try:
            print(json.dumps(run_size(n)), flush=True)
        except Exception as e:  # keep the ladder going
            print(json.dumps({"metric": f"balls_{n}", "error": str(e)}), flush=True)


if __name__ == "__main__":
    main()
