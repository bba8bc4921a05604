"""Headline benchmark: physics steps/sec on the balls demo scene
(BASELINE.md config 1: 10k pooled balls, gravity, Verlet, subStepCount=2,
cellSize=50, world 9000x4000).

Baseline: the reference runs this scene at ~50-60 FPS in a browser
(PERFORMANCE_ANALYSIS.md:5, 60 FPS rAF target) — vs_baseline is measured
steps/sec divided by 60.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Note on the axon tunnel: the first execution of a compiled program pays a
multi-minute deployment cost; the timing loop warms each program first and
amortizes host->device dispatch by running chunks of steps in one
device-side fori_loop.
"""

from __future__ import annotations

import json
import sys
import time

N_BALLS = 10_000
WARMUP_STEPS = 10
CHUNK = 30
CHUNKS = 4
BASELINE_STEPS_PER_SEC = 60.0


def _probe_backend(timeout_s: int = 420) -> None:
    """Fail fast with an error JSON if the device backend cannot initialize
    (the axon tunnel hangs indefinitely when its host-side relay is down,
    which would otherwise hang the whole bench run). The probe runs in a
    subprocess so a hung init is killable; its device ownership is released
    before the real run starts."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=timeout_s, check=True,
            capture_output=True,
        )
    except Exception as e:
        print(json.dumps({
            "metric": "balls_10000_steps_per_sec",
            "value": 0.0,
            "unit": "steps/s",
            "vs_baseline": 0.0,
            "error": f"device backend unavailable: {type(e).__name__}",
        }))
        raise SystemExit(2)


def main() -> None:
    _probe_backend()

    import jax

    from multithreadedgameengine_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from multithreadedgameengine_tpu.models.balls import make_balls_engine

    eng = make_balls_engine(n_balls=N_BALLS, seed=123456)

    # warm up the chunked-step program (compile + first-execution deploy)
    eng.step(WARMUP_STEPS, block=True)

    t0 = time.time()
    for _ in range(CHUNKS):
        eng.step(CHUNK)
    eng.sync()  # real device barrier (block_until_ready lies under axon)
    dt = time.time() - t0
    steps_per_sec = CHUNKS * CHUNK / dt

    # sanity: simulation must still be healthy
    import numpy as np

    snap = eng.snapshot()
    y = np.asarray(snap.transform.y)[1:]
    assert np.isfinite(y).all(), "non-finite positions after benchmark"
    assert int(jax.device_get(eng.world.step_count)) == WARMUP_STEPS + CHUNKS * CHUNK

    print(
        json.dumps(
            {
                "metric": f"balls_{N_BALLS}_physics_steps_per_sec",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
