"""Time the DEVICE pieces of the collision-events machinery at the predators
operating point (VERDICT r2 next #4): candidate math + top-k compaction
(record_collision_pairs), the Enter/Stay/Exit set-diff (diff_pairs), and the
chunk-log write, each as its own in-loop jitted program (K iterations inside
one dispatch so the axon RTT amortizes).

Usage: python benchmarks/profile_events_device.py [n_prey] [K]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import json
import sys
import time

import jax
import jax.numpy as jnp


def timed_loop(make_body, init, K: int, reps: int = 3):
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, K, make_body, c))
    out = fn(init)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(init)
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)
        best = min(best, time.time() - t0)
    return best / K


def main() -> None:
    n_prey = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    from multithreadedgameengine_tpu.models.predators import (
        make_predators_engine,
    )
    from multithreadedgameengine_tpu.behavior import read_field
    from multithreadedgameengine_tpu.ops.events import diff_pairs
    from multithreadedgameengine_tpu.ops.physics import compact_pairs
    from multithreadedgameengine_tpu.ops.spatial import neighbor_lists

    eng = make_predators_engine(
        n_prey=n_prey, logic=dict(collision_events=True, event_chunk=30),
    )
    eng.step(5, block=True)
    eng.step(30)
    eng.sync()

    cfg = eng._resolve_spatial()
    cfg, geom, _ = eng._solver_plan(cfg)
    payload_channels, extra_paths = eng._payload_plan(cfg)
    world = eng.world
    t, c = world.transform, world.collider
    results = {}

    # realistic candidate tables: the step's own neighbor assembly
    extras = []
    for p in extra_paths:
        if p == "__collision__":
            extras.append(jnp.where(c.active, c.radius, jnp.float32(-3.0e38)))
        else:
            extras.append(read_field(world, p))
    nbr = jax.jit(lambda w: neighbor_lists(
        w.transform.x, w.transform.y, w.transform.active,
        w.collider.visual_range, cfg, tuple(extras),
    ))(world)
    S = nbr.ids.shape[1]
    results["candidate_width_S"] = S

    ids, d2 = nbr.ids, nbr.d2
    ch = nbr.payload.data[..., payload_channels["__collision__"]]

    # (a) the recording mask math alone (elementwise over [N, S])
    def rec_mask(x):
        coll_j = ch > jnp.float32(-1.0e30)
        ok = (t.active & c.active)[:, None] & (ids >= 0) & coll_j
        min_d = c.radius[:, None] + ch
        i_idx = jnp.arange(ids.shape[0], dtype=jnp.int32)[:, None]
        return ok & (d2 + x < min_d * min_d) & (ids > i_idx)

    results["rec_mask_math"] = timed_loop(
        lambda i, x: (rec_mask(x).sum(dtype=jnp.int32) * 0).astype(jnp.float32) + x,
        jnp.float32(0), K,
    )

    rec0 = jax.jit(rec_mask)(jnp.float32(0))

    # (b) compaction (top_k prefilter + cumsum scatter)
    def comp_body(i, x):
        pairs, count, dropped = compact_pairs(
            ids, rec0 & (ids + i >= i), world.collision_pairs.shape[0]
        )
        return x + count

    results["compact_pairs_topk"] = timed_loop(comp_body, jnp.int32(0), K)

    # (c) set diff (enter/stay/exit)
    pairs, count, _ = jax.jit(
        lambda: compact_pairs(ids, rec0, world.collision_pairs.shape[0])
    )()

    def diff_body(i, x):
        enter, n_e, stay, n_s, exit_, n_x = diff_pairs(
            pairs, count + i * 0, world.prev_collision_pairs,
            world.prev_collision_pair_count,
        )
        return x + n_e + n_s + n_x

    results["diff_pairs"] = timed_loop(diff_body, jnp.int32(0), K)

    print(json.dumps({
        k: (round(v * 1000, 3) if isinstance(v, float) else int(v))
        for k, v in results.items()
    }), flush=True)
    eng.destroy()


if __name__ == "__main__":
    main()
