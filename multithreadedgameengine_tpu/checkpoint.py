"""Checkpoint / resume (SURVEY.md §5.4).

The reference has no persistence — all state lives in SABs and dies with the
page; only runtime pause/resume exists (gameEngine.js:1585-1639). Because the
TPU build's whole simulation is one pytree plus small host-side pool/RNG
state, a checkpoint is a single npz:

 - every World leaf, keyed by its tree path;
 - host state: per-class free lists + active counts, the mulberry32 cursor,
   and a config fingerprint (checkpoints only restore into an engine with an
   identical config + registration layout).
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import jax
import numpy as np

if TYPE_CHECKING:
    from .engine import Engine

# v2: collision-event prev/enter/stay/exit tables moved into the World pytree
# (device-side diff, ops/events.py) — the host prev_pairs entry is gone
FORMAT_VERSION = 2


def _leaf_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _config_fingerprint(engine: "Engine") -> str:
    import dataclasses

    # normalize fields the engine auto-resolves at first step (they don't
    # affect state shapes and would differ between a stepped and a fresh
    # engine with identical construction parameters): the spatial scan radius
    # AND the solver backend (_build_step rewrites solver 'auto' -> 'pallas'
    # on TPU, so a checkpoint saved after stepping must load into a fresh
    # 'auto' engine)
    cfg = dataclasses.replace(
        engine.config,
        spatial=dataclasses.replace(engine.config.spatial, max_cell_radius=0),
        physics=dataclasses.replace(engine.config.physics, solver="auto"),
    )
    regs = [
        (name, reg.entity_type, reg.start_index, reg.count)
        for name, reg in engine.classes.items()
    ]
    return json.dumps([repr(cfg), regs])


def save_checkpoint(engine: "Engine", path: str) -> None:
    engine._require_init()
    engine._flush_pending()
    jax.block_until_ready(engine.world)
    leaves = jax.tree_util.tree_flatten_with_path(engine.world)[0]
    arrays = {f"world:{_leaf_key(p)}": np.asarray(jax.device_get(v)) for p, v in leaves}

    host = {
        "version": FORMAT_VERSION,
        "fingerprint": _config_fingerprint(engine),
        "rng_t": int(engine.rng._t),
        "pools": {
            name: {"free": list(map(int, reg.pool.free)),
                   "active": reg.pool.active_count}
            for name, reg in engine.classes.items()
        },
        "camera": [engine.input.camera_x, engine.input.camera_y,
                   engine.input.camera_zoom],
    }
    arrays["__host__"] = np.frombuffer(
        json.dumps(host).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_checkpoint(engine: "Engine", path: str) -> None:
    """Restore into an engine with the same config + registrations."""
    engine._require_init()
    data = np.load(path, allow_pickle=False)
    host = json.loads(bytes(data["__host__"]).decode())
    if host["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {host['version']}")
    if host["fingerprint"] != _config_fingerprint(engine):
        raise ValueError(
            "checkpoint was written by an engine with a different config or "
            "entity registration layout"
        )

    paths, treedef = jax.tree_util.tree_flatten_with_path(engine.world)
    leaves = []
    for p, old in paths:
        key = f"world:{_leaf_key(p)}"
        if key not in data and key.startswith("world:solver_"):
            # solver layout caches (solver_grad/solver_meta) install lazily
            # at the first _build_step; a checkpoint saved before stepping
            # lacks them. Zero caches are safe ONLY with an invalid stamp:
            # load_checkpoint never rebuilds an already-built engine's
            # _step_fn, so the stamp itself must read "never binned" (-1)
            # or all-zero slots would be trusted for up to
            # rebin_interval - 1 frames (advisor r3).
            if key in ("world:solver_bin_step", "world:solver_pos_step"):
                leaves.append(jax.numpy.full(old.shape, -1, old.dtype))
            else:
                leaves.append(jax.numpy.zeros(old.shape, old.dtype))
            continue
        arr = data[key]
        if arr.shape != old.shape:
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {old.shape}")
        leaves.append(jax.numpy.asarray(arr, old.dtype))
    engine.world = jax.tree_util.tree_unflatten(treedef, leaves)

    engine.rng._t = np.uint32(host["rng_t"])
    for name, pool_state in host["pools"].items():
        pool = engine.classes[name].pool
        pool.restore_free(pool_state["free"])
        pool.active_count = pool_state["active"]
    engine.input.camera_x, engine.input.camera_y, engine.input.camera_zoom = host["camera"]
    engine._pending_ops.clear()
