"""Ablate the mixed rung's feature set to find where its ms/step goes
(run_ladder.rung_mixed at 300k measured 188 ms vs 15 ms for the same
feature set at 15k — 12.5x the work for 20x the entities is plausible but
worth decomposing). Each variant runs in its own subprocess (axon
executable-state isolation, as run_ladder does). Run on TPU."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import json

VARIANTS = {
    "full": {},
    "noevents": {"events": False},
    "noshadows": {"shadows": False},
    "noparticles": {"particles": False},
    "nbr32": {"max_neighbors": 32},
    "lean": {"events": False, "shadows": False, "particles": False},
}


def run(name, n=300_000, frames=20):
    import subprocess
    v = VARIANTS[name]
    code = f"""
import sys; sys.path.insert(0, {str(_Path(__file__).resolve().parent.parent)!r})
from multithreadedgameengine_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import time, json
import numpy as np
from multithreadedgameengine_tpu.models.predators import make_predators_engine
v = {v!r}
n = {n}
scale = (n / 15_000) ** 0.5
over = dict(
    world_width=5000.0*scale, world_height=2000.0*scale,
    spatial=dict(cell_size=160.0, max_neighbors=v.get("max_neighbors", 64),
                 cell_capacity=64, per_class_assembly=True),
    physics=dict(sub_step_count=1, gravity=(0.0,0.0), verlet_damping=0.99,
                 collision_response_strength=0.9, boundary_elasticity=0.0,
                 max_collision_pairs=1<<18),
)
if v.get("events", True):
    over["logic"] = dict(collision_events=True, event_chunk=30, event_overlap=True)
if not v.get("shadows", True):
    over["lighting"] = dict(enabled=False, shadows_enabled=False)
if not v.get("particles", True):
    over["particle"] = dict(max_particles=0, decals=False)
eng = make_predators_engine(n_prey=n, n_predators=max(8, n//2000), n_lights=5,
                            spawn=False, **over)
cfg = eng.config
rng = np.random.default_rng(123456)
n_pred = max(8, n//2000)
eng.spawn_batch("Prey", n, x=(rng.random(n)*cfg.world_width).astype(np.float32),
                y=(rng.random(n)*cfg.world_height).astype(np.float32),
                call_on_spawned=False)
eng.spawn_batch("Predator", n_pred,
                x=(rng.random(n_pred)*cfg.world_width).astype(np.float32),
                y=(rng.random(n_pred)*cfg.world_height).astype(np.float32),
                call_on_spawned=False)
for _ in range(5):
    eng.spawn("TallLight", x=eng.rng()*cfg.world_width, y=eng.rng()*cfg.world_height)
eng._flush_pending()
t0 = time.time(); eng.step(5, block=True); warm = time.time() - t0
eng.step({20}); eng.sync()
t0 = time.time()
for _ in range(3):
    eng.step({frames})
eng.sync()
per = (time.time() - t0) / (3 * {frames})
print("PROBE_JSON " + json.dumps(dict(name={name!r},
    ms=round(per*1000,2), sps=round(1/per,2), warm=round(warm,1))), flush=True)
"""
    p = subprocess.run([_sys.executable, "-u", "-c", code],
                       capture_output=True, text=True, timeout=3600)
    for ln in p.stdout.splitlines():
        if ln.startswith("PROBE_JSON "):
            return json.loads(ln[11:])
    return {"name": name,
            "error": (p.stderr or p.stdout).strip().splitlines()[-3:]}


if __name__ == "__main__":
    names = _sys.argv[1:] or list(VARIANTS)
    out = []
    for name in names:
        r = run(name)
        print(json.dumps(r), flush=True)
        out.append(r)
    with open("PROBE_MIXED.json", "w") as f:
        json.dump(out, f, indent=1)
