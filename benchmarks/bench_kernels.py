"""Micro-benchmarks of the 1M constraint-phase primitives on the real TPU.

Separates the candidate optimization levers before committing to a design:
scatter formulations (row vs per-field, unique_indices), the two argsorts in
bin_entities, grid-layout <-> slot-major transposes, and the Pallas pair pass
with/without its XLA-side layout shuffle.

Usage: python benchmarks/bench_kernels.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

# repo-root bootstrap: these harnesses run as scripts (and as rung
# subprocesses) where sys.path[0] is benchmarks/, not the repo root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def timed(fn, *args, reps: int = 5, warm: int = 2):
    out = None
    for _ in range(warm):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    N = 1_000_000
    R, C, cap = 534, 1201, 16
    flat_cells = (R + 2) * (C + 2) * cap
    rng = np.random.default_rng(0)
    rows_np = rng.uniform(size=(N, 8)).astype(np.float32)
    # unique slot per entity, uniform-ish over cells
    perm = rng.permutation(flat_cells)[:N].astype(np.int32)
    rows_d = jnp.asarray(rows_np)
    idx_d = jnp.asarray(perm)
    results = {}

    # --- scatter formulations -------------------------------------------
    def scat_row(rows, idx):
        base = jnp.zeros((flat_cells, 8), jnp.float32)
        return base.at[idx].set(rows, mode="drop")

    results["scatter_row8"], _ = timed(jax.jit(scat_row), rows_d, idx_d)

    def scat_row_unique(rows, idx):
        base = jnp.zeros((flat_cells, 8), jnp.float32)
        return base.at[idx].set(rows, mode="drop", unique_indices=True)

    results["scatter_row8_unique"], _ = timed(jax.jit(scat_row_unique), rows_d, idx_d)

    def scat_row6_unique(rows, idx):
        base = jnp.zeros((flat_cells, 6), jnp.float32)
        return base.at[idx].set(rows[:, :6], mode="drop", unique_indices=True)

    results["scatter_row6_unique"], _ = timed(jax.jit(scat_row6_unique), rows_d, idx_d)

    def scat_fields(rows, idx):
        outs = []
        for k in range(6):
            base = jnp.zeros((flat_cells,), jnp.float32)
            outs.append(base.at[idx].set(rows[:, k], mode="drop", unique_indices=True))
        return outs

    results["scatter_6xfield_unique"], _ = timed(jax.jit(scat_fields), rows_d, idx_d)

    # sorted (monotone) destination order — does XLA exploit it?
    sidx = jnp.asarray(np.sort(perm))
    results["scatter_row8_unique_sorted"], _ = timed(
        jax.jit(scat_row_unique), rows_d, sidx
    )

    # --- gathers ----------------------------------------------------------
    big = jnp.zeros((flat_cells, 5), jnp.float32)

    def gather_rows(t, idx):
        return t[idx]

    results["gather_row5"], _ = timed(jax.jit(gather_rows), big, idx_d)

    # --- the argsorts in bin_entities --------------------------------------
    cells = R * C
    cid = jnp.asarray(rng.integers(0, cells, N).astype(np.int32))

    results["argsort_1m"], order = timed(
        jax.jit(lambda c: jnp.argsort(c, stable=True).astype(jnp.int32)), cid
    )
    results["argsort_inverse"], _ = timed(
        jax.jit(lambda o: jnp.argsort(o).astype(jnp.int32)), order
    )

    def inv_by_scatter(o):
        n = o.shape[0]
        return (
            jnp.zeros((n,), jnp.int32)
            .at[o]
            .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
        )

    results["inverse_by_scatter"], _ = timed(jax.jit(inv_by_scatter), order)

    # --- layout shuffles ----------------------------------------------------
    grid = jnp.zeros((R + 2, C + 2, cap), jnp.float32)

    def to_slot_major(g):
        import math

        cp = math.ceil((C + 2) / 128) * 128
        t = jnp.transpose(g, (2, 0, 1))[:, 1:-1, :]
        rows_buf = ((R + 7) // 8) * 8 + 16
        return jnp.pad(t, ((0, 0), (8, rows_buf - 8 - R), (0, cp - (C + 2))))

    results["grid_to_slotmajor_1field"], slot = timed(jax.jit(to_slot_major), grid)

    # --- pallas pair pass: full wrapper vs pre-laid-out kernel --------------
    from multithreadedgameengine_tpu.ops.pallas_kernels import pair_pass_pallas
    from multithreadedgameengine_tpu.ops.spatial import GridGeom

    geom = GridGeom(cell_size=75.0, rows=R, cols=C, capacity=cap)
    # realistic occupancy: pile in the bottom 40% of rows
    xs = rng.uniform(0, 9000 * 10, N)
    ys = rng.uniform(4000 * 10 * 0.6, 4000 * 10, N)
    col = np.clip((xs / 75.0).astype(np.int32), 0, C - 1)
    row = np.clip((ys / 75.0).astype(np.int32), 0, R - 1)
    order_np = np.argsort(row.astype(np.int64) * C + col, kind="stable")
    scid = (row.astype(np.int64) * C + col)[order_np]
    rank = np.arange(N) - np.maximum.accumulate(
        np.where(np.concatenate([[True], scid[1:] != scid[:-1]]), np.arange(N), 0)
    )
    keep = rank < cap
    fi = ((row[order_np] + 1) * (C + 2) + (col[order_np] + 1)) * cap + rank
    x_grid = jnp.zeros(((R + 2) * (C + 2) * cap,), jnp.float32).at[
        jnp.asarray(fi[keep])
    ].set(jnp.asarray(xs[order_np][keep], jnp.float32)).reshape(R + 2, C + 2, cap)
    y_grid = jnp.zeros(((R + 2) * (C + 2) * cap,), jnp.float32).at[
        jnp.asarray(fi[keep])
    ].set(jnp.asarray(ys[order_np][keep], jnp.float32)).reshape(R + 2, C + 2, cap)
    radius = jnp.zeros(((R + 2) * (C + 2) * cap,), jnp.float32).at[
        jnp.asarray(fi[keep])
    ].set(20.0).reshape(R + 2, C + 2, cap)
    flags = jnp.zeros(((R + 2) * (C + 2) * cap,), jnp.float32).at[
        jnp.asarray(fi[keep])
    ].set(1.0 + 8.0).reshape(R + 2, C + 2, cap)
    gid = jnp.full(((R + 2) * (C + 2) * cap,), -1.0, jnp.float32).at[
        jnp.asarray(fi[keep])
    ].set(jnp.asarray(order_np[keep], jnp.float32)).reshape(R + 2, C + 2, cap)
    attrs = jnp.stack([radius, flags, gid], axis=-1)
    salt = jnp.uint32(7)

    results["pair_pass_pallas_full"], _ = timed(
        lambda: pair_pass_pallas(x_grid, y_grid, attrs, salt, geom, 0.8),
        reps=3,
    )

    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
