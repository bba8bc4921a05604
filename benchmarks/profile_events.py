"""Decompose the predators collision-events tax (events-on minus events-off
ms/step) into device vs host terms:

 - real hooks (Prey blood-burst emissions etc.)         -> full tax
 - no-op hooks (device record/diff/log + host pull+dispatch loop, but
   hook bodies do nothing)                              -> minus hook bodies
 - events on, NO hooked classes (device machinery compiles out to the
   1-row log; measures residual)                        -> device floor

Usage: python benchmarks/profile_events.py [n_prey]
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


def measure(events: bool, hook_mode: str, n_prey: int) -> float:
    from multithreadedgameengine_tpu.models.predators import (
        Predator, Prey, make_predators_engine,
    )

    saved = {}
    if hook_mode != "real":
        for cls in (Prey, Predator):
            for base in ("on_collision_enter", "on_collision_stay",
                         "on_collision_exit"):
                # neutralize BOTH variants: the engine prefers the _batch
                # hook when defined, so leaving it active would keep the
                # real blood emissions in the noop/none legs and invalidate
                # the tax decomposition
                for h in (base, base + "_batch"):
                    if getattr(cls, h, None) is not None:
                        saved[(cls, h)] = getattr(cls, h)
                        if hook_mode == "noop":
                            setattr(
                                cls, h,
                                staticmethod(lambda ctx, me, other: None),
                            )
                        else:  # "none": no hooked classes at all
                            setattr(cls, h, None)
    try:
        over = (
            {"logic": dict(collision_events=True, event_chunk=30)}
            if events else {}
        )
        eng = make_predators_engine(n_prey=n_prey, **over)
        eng.step(5, block=True)
        eng.step(30 if events else 5)
        eng.sync()
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            eng.step(60)
            eng.sync()
            best = min(best, (time.time() - t0) / 60)
        eng.destroy()
        return best * 1000
    finally:
        for (cls, h), fn in saved.items():
            setattr(cls, h, fn)


def main() -> None:
    # each case in its own subprocess: the axon runtime accumulates
    # per-process executable state that has wedged later engines after an
    # earlier one ran (see run_ladder.py main)
    n_prey = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000
    from multithreadedgameengine_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if len(sys.argv) > 2 and sys.argv[2] == "--one":
        events, mode = sys.argv[3] == "1", sys.argv[4]
        print("ONE_MS " + str(measure(events, mode, n_prey)), flush=True)
        return

    import os
    import subprocess

    def run(events: bool, mode: str) -> float:
        proc = subprocess.run(
            [sys.executable, "-u", __file__, str(n_prey), "--one",
             "1" if events else "0", mode],
            capture_output=True, text=True, timeout=3000, env=dict(os.environ),
        )
        line = next(
            ln for ln in proc.stdout.splitlines() if ln.startswith("ONE_MS ")
        )
        return float(line[len("ONE_MS "):])

    out = {}
    out["noevents"] = round(run(False, "real"), 2)
    out["events_real_hooks"] = round(run(True, "real"), 2)
    out["events_noop_hooks"] = round(run(True, "noop"), 2)
    out["events_no_hooked_classes"] = round(run(True, "none"), 2)
    out["tax_total"] = round(out["events_real_hooks"] - out["noevents"], 2)
    out["tax_hook_bodies"] = round(
        out["events_real_hooks"] - out["events_noop_hooks"], 2
    )
    out["tax_device_record_diff_log_plus_pull"] = round(
        out["events_noop_hooks"] - out["events_no_hooked_classes"], 2
    )
    out["tax_events_residual"] = round(
        out["events_no_hooked_classes"] - out["noevents"], 2
    )
    print("EVENTS_PROFILE " + json.dumps(out))


if __name__ == "__main__":
    main()
