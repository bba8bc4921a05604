"""Decompose the residency-mode 1M frame: measure steps/s at several
rebin_intervals (the cached-frame floor emerges as interval grows) for
position_residency on vs off. Run on TPU."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import json, time

def run(res, interval, n=1_000_000, chunk=30):
    import subprocess, os
    code = f"""
import sys; sys.path.insert(0, {str(_Path(__file__).resolve().parent.parent)!r})
from multithreadedgameengine_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import time, json
from multithreadedgameengine_tpu.models.balls import make_balls_engine
scale = ({n} / 10_000) ** 0.5
eng = make_balls_engine(
    n_balls={n}, seed=123456,
    world_width=9000.0 * scale, world_height=4000.0 * scale,
    physics=dict(sub_step_count=2, max_collision_pairs=1, verlet_damping=0.99,
                 boundary_elasticity=0.0, collision_response_strength=0.8,
                 gravity=(0.0, 0.5), solver_capacity=12,
                 rebin_interval={interval}, position_residency={res!r}))
t0 = time.time(); eng.step(5, block=True); warm = time.time() - t0
best = float('inf')
for _ in range(3):
    t0 = time.time(); eng.step({chunk}); eng.sync()
    best = min(best, (time.time() - t0) / {chunk})
print("PROBE_JSON " + json.dumps(dict(res={res!r}, interval={interval},
    ms=round(best*1000,2), sps=round(1/best,2), warm=round(warm,1))), flush=True)
"""
    p = subprocess.run([_sys.executable, "-u", "-c", code],
                       capture_output=True, text=True, timeout=2400)
    for ln in p.stdout.splitlines():
        if ln.startswith("PROBE_JSON "):
            return json.loads(ln[11:])
    return {"res": res, "interval": interval,
            "error": (p.stderr or p.stdout).strip().splitlines()[-3:]}

if __name__ == "__main__":
    # optional argv: entity count (default 1M — the round-4 artifact; pass
    # 100000 to answer the r4 ladder's mid-scale regression question)
    n = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1_000_000
    out = []
    for res, interval in [("auto", 1000), ("auto", 8), ("auto", 1),
                          ("off", 1000), ("off", 1)]:
        r = run(res, interval, n=n)
        print(json.dumps(r), flush=True)
        out.append(r)
    suffix = "" if n == 1_000_000 else f"_{n}"
    with open(f"PROBE_RESIDENCY{suffix}.json", "w") as f:
        json.dump(out, f, indent=1)
