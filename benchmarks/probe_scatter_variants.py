"""Measure XLA TPU scatter variants for the resident solver's per-frame x/y
position scatters (~6.7 ms per 1M-index field scatter — the largest
remaining per-frame cost after the round-3 push; see parity_status.md).

Variants probed at the 1M layout geometry:
 1. baseline: zeros[total].at[flat].set(v)  (gid-order indices, unique)
 2. indices_are_sorted=True with flat-SORTED indices (requires v[order],
    order rebin-cached; wins only if sorted scatter saves > the 1M gather)
 3. the v[order] gather alone (to price variant 2's input)
 4. scatter into a CARRIED buffer (no zeros init) — stale empty slots are
    meta-gated, so skipping the zero-fill is semantically free between
    rebins

Usage: python benchmarks/probe_scatter_variants.py [n] [reps]
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
import numpy as np


def timed_loop(make_body, init, K: int = 20, reps: int = 3):
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, K, make_body, c))
    out = fn(init)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(init)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.time() - t0)
    return best / K


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from multithreadedgameengine_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    # the 1M ladder layout geometry (cap 12, rows_buf ~556, cols_pad 1280)
    total = 12 * 556 * 1280
    rng = np.random.default_rng(0)
    flat_np = rng.choice(total, size=n, replace=False).astype(np.int32)
    flat = jnp.asarray(flat_np)
    order = jnp.asarray(np.argsort(flat_np).astype(np.int32))
    flat_sorted = jnp.asarray(np.sort(flat_np))
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    out = {}

    def base_body(_i, c):
        x, acc = c
        g = jnp.zeros((total,), jnp.float32).at[flat].set(
            x, mode="drop", unique_indices=True
        )
        return x + g[0], acc

    out["scatter_gid_order"] = timed_loop(base_body, (v, jnp.float32(0)))

    def sorted_body(_i, c):
        x, acc = c
        g = jnp.zeros((total,), jnp.float32).at[flat_sorted].set(
            x, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        return x + g[0], acc

    out["scatter_sorted_flag"] = timed_loop(sorted_body, (v, jnp.float32(0)))

    def gather_body(_i, c):
        x, acc = c
        return x + x[order][0] * 0, acc + x[order][-1]

    out["gather_order"] = timed_loop(gather_body, (v, jnp.float32(0)))

    def carried_body(_i, c):
        x, g = c
        g = g.at[flat].set(x, mode="drop", unique_indices=True)
        return x + g[0], g

    out["scatter_carried_no_zeros"] = timed_loop(
        carried_body, (v, jnp.zeros((total,), jnp.float32))
    )

    print(json.dumps({k: round(t * 1000, 3) for k, t in out.items()}))


if __name__ == "__main__":
    main()
