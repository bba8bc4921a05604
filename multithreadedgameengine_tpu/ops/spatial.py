"""Spatial hash grid → fixed-degree neighbor lists, TPU-native.

Replaces the reference's spatial worker (src/workers/spatial_worker.js:122-278):
an ``Array<Array<int>>`` uniform hash grid rebuilt every frame plus a per-entity
box scan writing ``[count, ids...]`` / ``[count, d²...]`` stride buffers.

TPU design (static shapes, one fused program — no per-cell JS arrays):

1. cell id per entity (clamped truncation, spatial_worker.js:157-161), with the
   reference's NaN guard (:152-153) folded in as an "invalid" sentinel;
2. stable argsort by cell id — within a cell, candidates appear in ascending
   entity order, matching the reference's insertion order (rebuildGrid loops
   ``i`` over entities in order, :146-169);
3. scatter the sorted order into a ``[total_cells+1, cell_capacity]`` table
   (row ``total_cells`` is the all-empty sentinel for out-of-world candidate
   cells; entities beyond ``cell_capacity`` in one cell are dropped — reported
   in ``NeighborLists.n_binned`` for observability);
4. gather the ``(2R+1)²`` cell neighborhood per entity (row-major, matching
   the reference's checkRow-outer/checkCol-inner scan order, :234-271) and
   apply the exact acceptance test ``0 < d² < visual_range²`` (:257);
5. compact the first ``max_neighbors`` hits (in scan order — the reference
   truncates in scan order too, :258-270) into ``[N, K]`` id/d² arrays.

The O(N²) brute-force variant is the test oracle and the small-N fast path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import EngineConfig


@dataclass(frozen=True)
class GridGeom:
    """Static geometry of a binning grid (host-side, hashable — jit-static).
    The spatial neighbor grid uses the user's config (cell_size etc.,
    spatial_worker.js:80-86); the physics solver derives its own geometry
    from the maximum collider radius (ops/physics_grid.py)."""

    cell_size: float
    rows: int
    cols: int
    capacity: int

    @property
    def num_cells(self) -> int:
        return self.rows * self.cols


@struct.dataclass
class BinTable:
    """Entities binned into grid cells by stable sort + rank scatter.

    ``table[c, k]`` = id of the k-th entity (in ascending-id order, matching
    the reference grid's insertion order, rebuildGrid spatial_worker.js:146-169)
    in cell c; -1 = empty. Row ``num_cells`` is the all-empty sentinel for
    out-of-bounds candidate lookups. Entities beyond ``capacity`` in one cell
    are dropped (reported via n_binned)."""

    table: jnp.ndarray  # int32[num_cells + 1, capacity]
    cell_id: jnp.ndarray  # int32[N] (num_cells for invalid entities)
    rank: jnp.ndarray  # int32[N] rank within cell (may exceed capacity)
    row: jnp.ndarray  # int32[N] clamped cell row
    col: jnp.ndarray  # int32[N] clamped cell col
    n_binned: jnp.ndarray  # int32 scalar


def bin_entities(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    geom: GridGeom,
    payload: jnp.ndarray = None,
    build_table: bool = True,
    table_values: jnp.ndarray = None,
    row: jnp.ndarray = None,
    col: jnp.ndarray = None,
) -> BinTable:
    """Clamped truncation cell assignment (spatial_worker.js:157-161) +
    stable argsort by cell + within-cell rank + table scatter.

    ``payload``: optional int32[N] of per-entity bits (< 128) packed into the
    table entries' bits 24+ alongside the id (bits 0-23) — consumers get
    per-candidate flags for free with the id gather. Requires N < 2^24.

    ``table_values``: optional f32[N, F] rows to scatter instead of int ids —
    the table becomes f32[cells+1, capacity, F] with channel 0 acting as the
    id (-1 in empty slots). Mutually exclusive with ``payload``.

    ``build_table=False`` skips the [cells, capacity] table (consumers that
    scatter their own payloads — the grid physics solver — only need
    cell/rank per entity); ``table`` is then a [1, capacity] placeholder.

    ``row``/``col``: optional precomputed integer cell coordinates. The halo
    path (parallel/halo.py) passes slab-LOCAL coordinates derived from the
    global truncation so local and single-device binning agree bit-for-bit
    (recomputing ``(y - offset) * inv`` would shift truncation boundaries by
    float error)."""
    n = x.shape[0]
    if payload is not None and n >= (1 << 24):
        raise ValueError("payload packing requires fewer than 2^24 entities")
    cells = geom.num_cells
    inv = 1.0 / geom.cell_size
    if row is None:
        col = jnp.clip((x * inv).astype(jnp.int32), 0, geom.cols - 1)
        row = jnp.clip((y * inv).astype(jnp.int32), 0, geom.rows - 1)
    cell_id = jnp.where(valid, row * geom.cols + col, cells)

    order = jnp.argsort(cell_id, stable=True).astype(jnp.int32)
    sorted_cid = cell_id[order]
    arange_n = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_cid[1:] != sorted_cid[:-1]]
    )
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, arange_n, 0)
    )
    rank_sorted = arange_n - run_start

    if build_table:
        table_rows = jnp.where(sorted_cid < cells, sorted_cid, cells + 1)
        table_cols = jnp.where(rank_sorted < geom.capacity, rank_sorted, geom.capacity)
        if table_values is not None:
            base = jnp.zeros(
                (cells + 1, geom.capacity, table_values.shape[1]), jnp.float32
            )
            base = base.at[:, :, 0].set(-1.0)  # empty: id channel = -1
            table = base.at[table_rows, table_cols].set(
                table_values[order], mode="drop"
            )
            n_binned = jnp.sum(table[..., 0] >= 0, dtype=jnp.int32)
        else:
            values = order if payload is None else order | (payload[order] << 24)
            table = (
                jnp.full((cells + 1, geom.capacity), -1, jnp.int32)
                .at[table_rows, table_cols]
                .set(values, mode="drop")
            )
            n_binned = jnp.sum(table >= 0, dtype=jnp.int32)
    else:
        table = jnp.full((1, geom.capacity), -1, jnp.int32)
        n_binned = jnp.sum(
            valid & (jnp.zeros_like(cell_id) == 0), dtype=jnp.int32
        )
    # per-entity rank: undo the sort by scattering rank_sorted back through
    # the permutation — `order` is a bijection so unique_indices holds. An
    # argsort(order) inverse costs a second full bitonic sort (~8-16 ms at
    # 1M on v5e); the scatter is ~2 ms and bit-identical.
    rank = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(rank_sorted, unique_indices=True)
    )
    return BinTable(
        table=table, cell_id=cell_id, rank=rank, row=row, col=col,
        n_binned=n_binned,
    )


@struct.dataclass
class NeighborPayload:
    """Per-candidate field channels gathered FOR FREE with the table rows.

    On TPU, gather cost is per-index: widening the neighbor table from ids to
    [id, x, y, *tick_fields] rows makes every per-candidate attribute read
    (the reference's direct SoA reads in hot loops, boid.js:137-240) come out
    of ONE [N, B] row-gather instead of per-field [N, S] random gathers —
    the difference between 1.2 s and tens of ms per step on the predators
    scene. ``data``: f32[N, S, F]; channel order is fixed by the caller
    (engine: id, x, y, then each class's declared ``neighbor_fields``)."""

    data: jnp.ndarray  # f32[N, S, F]


@struct.dataclass
class NeighborLists:
    """Fixed-degree neighbor lists: the device analog of the neighborData /
    distanceData SABs (gameEngine.js:553-559, stride ``1 + maxNeighbors``).

    TPU layout note: slots are in *candidate-scan order with gaps* — invalid
    slots hold id -1 — rather than the reference's compacted prefix. Compacting
    would need a [N, K] scatter (serialized and slow on TPU); every consumer
    masks on ``ids >= 0`` instead, which vectorizes for free. ``count`` still
    reports the reference's neighborCount (capped at max_neighbors), and the
    cap keeps the reference's scan-order truncation semantics
    (spatial_worker.js:258-270)."""

    ids: jnp.ndarray  # int32[N, S] slot table, -1 = empty slot
    d2: jnp.ndarray  # f32[N, S], squared distances (0 in empty slots)
    count: jnp.ndarray  # int32[N]
    # diagnostics: how many active entities made it into the grid table
    # (n_active - n_binned = cell-capacity overflow drops)
    n_binned: jnp.ndarray  # int32 scalar
    # optional packed per-candidate fields ([N, S, 0] when unused)
    payload: NeighborPayload


def cell_coords(
    x: jnp.ndarray, y: jnp.ndarray, cfg: EngineConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clamped integer cell coordinates (spatial_worker.js:157-161)."""
    inv = 1.0 / cfg.spatial.cell_size
    col = jnp.clip((x * inv).astype(jnp.int32), 0, cfg.grid_cols - 1)
    row = jnp.clip((y * inv).astype(jnp.int32), 0, cfg.grid_rows - 1)
    return row, col


def _cap_first_k(
    cand: jnp.ndarray, d2: jnp.ndarray, valid: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply the max_neighbors cap in candidate-scan order without compaction:
    mask out every valid candidate past the K-th (spatial_worker.js:258-270
    truncates the same way). cand/d2/valid: [N, M]. Returns the slot-form
    ids/d2 plus per-entity counts. Pure vector ops — no scatter."""
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1)  # 1-based rank
    keep = valid & (rank <= k)
    ids = jnp.where(keep, cand, -1)
    d2_out = jnp.where(keep, d2, 0.0)
    count = jnp.minimum(jnp.sum(valid, axis=1, dtype=jnp.int32), k)
    return ids, d2_out, count


def neighbor_lists_grid(
    x: jnp.ndarray,
    y: jnp.ndarray,
    active: jnp.ndarray,
    visual_range: jnp.ndarray,
    cfg: EngineConfig,
    extra_fields: Tuple[jnp.ndarray, ...] = (),
) -> NeighborLists:
    """Hash-grid neighbor search (the sort-and-bin kernel).

    ``extra_fields``: per-entity [N] arrays whose per-candidate values ride
    the table rows (channels 3..) — see NeighborPayload. Channels 0-2 are
    always (id, x, y); distances come from the payload, so the whole search
    costs ONE [N, B] row-gather regardless of how many fields ticks read."""
    n = x.shape[0]
    if n >= (1 << 24):
        raise ValueError("neighbor table packs ids into f32: N must be < 2^24")
    sp = cfg.spatial
    cells = cfg.total_cells
    cols, rows_n = cfg.grid_cols, cfg.grid_rows
    radius = max(1, sp.max_cell_radius)
    geom = GridGeom(
        cell_size=sp.cell_size, rows=rows_n, cols=cols, capacity=sp.cell_capacity
    )

    finite = jnp.isfinite(x) & jnp.isfinite(y)
    valid_entity = active & finite  # NaN guard (spatial_worker.js:152-153)
    arange_n = jnp.arange(n, dtype=jnp.int32)
    rows_vals = jnp.stack(
        [arange_n.astype(jnp.float32), x, y]
        + [jnp.asarray(f, jnp.float32) for f in extra_fields],
        axis=1,
    )
    bins = bin_entities(x, y, valid_entity, geom, table_values=rows_vals)

    cap, f_ch = sp.cell_capacity, rows_vals.shape[1]
    b_cells = (2 * radius + 1) ** 2
    # Candidate assembly strategy. The per-entity form gathers N·B table
    # rows of [cap, F] — per-INDEX gather latency made this 80% of the
    # predators-full step on v5e (~25 ms of a 30 ms frame at N=15k, B=25).
    # The cell-major form instead builds the whole neighborhood PER CELL
    # with static shifts of the padded table (no gather at all: concat of
    # (2R+1)² shifted slices, identical row-major offset/slot order), then
    # fetches each entity's assembled [B·cap, F] row with ONE index — B×
    # fewer gather indices for the same bytes. Worth it whenever the
    # assembled table fits a modest memory budget.
    cellmajor_bytes = (cells + 1) * b_cells * cap * f_ch * 4
    if cellmajor_bytes <= 256 * 1024 * 1024:
        tbl = bins.table[:cells].reshape(rows_n, cols, cap, f_ch)
        r = radius
        padded = jnp.zeros(
            (rows_n + 2 * r, cols + 2 * r, cap, f_ch), jnp.float32
        ).at[..., 0].set(-1.0)  # out-of-world cells: empty (id -1)
        padded = padded.at[r : r + rows_n, r : r + cols].set(tbl)
        nbh = jnp.concatenate(
            [
                padded[r + dr : r + dr + rows_n, r + dc : r + dc + cols]
                for dr in range(-r, r + 1)
                for dc in range(-r, r + 1)
            ],
            axis=2,
        ).reshape(cells, b_cells * cap, f_ch)
        sentinel = jnp.zeros((1, b_cells * cap, f_ch), jnp.float32).at[..., 0].set(-1.0)
        nbh = jnp.concatenate([nbh, sentinel], axis=0)
        flat = nbh[bins.cell_id]  # [N, S, F] — one row per entity
    else:
        # --- per-entity candidate gather, (2R+1)^2 neighborhood, row-major ---
        offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
        off_r = jnp.repeat(offs, 2 * radius + 1)  # row-major: row outer
        off_c = jnp.tile(offs, 2 * radius + 1)
        cand_row = bins.row[:, None] + off_r[None, :]  # [N, B]
        cand_col = bins.col[:, None] + off_c[None, :]
        in_bounds = (
            (cand_row >= 0) & (cand_row < rows_n) & (cand_col >= 0) & (cand_col < cols)
        )
        cand_cell = jnp.where(in_bounds, cand_row * cols + cand_col, cells)
        flat = bins.table[cand_cell]  # [N, B, cap, F] — one row-gather
        flat = flat.reshape(n, -1, flat.shape[-1])  # [N, S, F]
    cand = flat[..., 0].astype(jnp.int32)
    n_binned = bins.n_binned

    # --- exact distance test: 0 < d² < visual_range² (spatial_worker.js:257) ---
    dx = flat[..., 1] - x[:, None]
    dy = flat[..., 2] - y[:, None]
    d2 = dx * dx + dy * dy
    vr2 = (visual_range * visual_range)[:, None]
    valid = (
        (cand >= 0)
        & (cand != arange_n[:, None])
        & (d2 < vr2)
        & (d2 > 0)
        & valid_entity[:, None]
    )

    ids, d2_out, count = _cap_first_k(cand, d2, valid, sp.max_neighbors)
    return NeighborLists(
        ids=ids, d2=d2_out, count=count, n_binned=n_binned,
        payload=NeighborPayload(data=flat),
    )


def neighbor_lists_by_class(
    x: jnp.ndarray,
    y: jnp.ndarray,
    active: jnp.ndarray,
    visual_range: jnp.ndarray,
    cfg: EngineConfig,
    extra_fields: Tuple[jnp.ndarray, ...],
    ranges,
):
    """Per-class candidate assembly at per-class scan radii.

    The reference computes ``cellRadius`` per ENTITY from its own
    visualRange (spatial_worker.js:207-211); the engine's single global
    ``max_cell_radius`` instead sized every row's candidate scan for the
    LARGEST range in the scene — at the predators operating point the 8
    predators' range-250 scan (width 1600) was paid by all 15k prey whose
    range needs width 576, and the [N, S, F] candidate payload is the
    dominant HBM term of the whole step.

    ``ranges``: tuple of ``(name, start, count, radius)`` — contiguous class
    slot ranges and their scan radii (ceil(class max visual_range / cell)).
    Bins ONCE; builds one padded cell-major neighborhood table per distinct
    radius; each class row-gathers from its radius's table. Acceptance,
    scan order and max_neighbors truncation semantics are identical to
    :func:`neighbor_lists_grid` per row.

    Returns ({name: NeighborLists with rows PRE-SLICED to the class range},
    n_binned)."""
    n = x.shape[0]
    if n >= (1 << 24):
        raise ValueError("neighbor table packs ids into f32: N must be < 2^24")
    sp = cfg.spatial
    cells = cfg.total_cells
    cols, rows_n = cfg.grid_cols, cfg.grid_rows
    geom = GridGeom(
        cell_size=sp.cell_size, rows=rows_n, cols=cols, capacity=sp.cell_capacity
    )

    finite = jnp.isfinite(x) & jnp.isfinite(y)
    valid_entity = active & finite
    arange_n = jnp.arange(n, dtype=jnp.int32)
    rows_vals = jnp.stack(
        [arange_n.astype(jnp.float32), x, y]
        + [jnp.asarray(f, jnp.float32) for f in extra_fields],
        axis=1,
    )
    bins = bin_entities(x, y, valid_entity, geom, table_values=rows_vals)
    cap, f_ch = sp.cell_capacity, rows_vals.shape[1]
    tbl = bins.table[:cells].reshape(rows_n, cols, cap, f_ch)

    # one padded + assembled neighborhood table per distinct radius
    radii = sorted({r for _name, _s, _c, r in ranges})
    nbh_by_r = {}
    for r in radii:
        b_cells = (2 * r + 1) ** 2
        padded = jnp.zeros(
            (rows_n + 2 * r, cols + 2 * r, cap, f_ch), jnp.float32
        ).at[..., 0].set(-1.0)
        padded = padded.at[r : r + rows_n, r : r + cols].set(tbl)
        nbh = jnp.concatenate(
            [
                padded[r + dr : r + dr + rows_n, r + dc : r + dc + cols]
                for dr in range(-r, r + 1)
                for dc in range(-r, r + 1)
            ],
            axis=2,
        ).reshape(cells, b_cells * cap, f_ch)
        sentinel = (
            jnp.zeros((1, b_cells * cap, f_ch), jnp.float32).at[..., 0].set(-1.0)
        )
        nbh_by_r[r] = jnp.concatenate([nbh, sentinel], axis=0)

    out = {}
    for name, start, count, r in ranges:
        sl = slice(start, start + count)
        flat = nbh_by_r[r][bins.cell_id[sl]]  # [count, S_r, F]
        cand = flat[..., 0].astype(jnp.int32)
        dx = flat[..., 1] - x[sl][:, None]
        dy = flat[..., 2] - y[sl][:, None]
        d2 = dx * dx + dy * dy
        vr2 = (visual_range[sl] * visual_range[sl])[:, None]
        ok = (
            (cand >= 0)
            & (cand != arange_n[sl][:, None])
            & (d2 < vr2)
            & (d2 > 0)
            & valid_entity[sl][:, None]
        )
        ids, d2_out, cnt = _cap_first_k(cand, d2, ok, sp.max_neighbors)
        out[name] = NeighborLists(
            ids=ids, d2=d2_out, count=cnt, n_binned=bins.n_binned,
            payload=NeighborPayload(data=flat),
        )
    return out, bins.n_binned


def neighbor_lists_bruteforce(
    x: jnp.ndarray,
    y: jnp.ndarray,
    active: jnp.ndarray,
    visual_range: jnp.ndarray,
    cfg: EngineConfig,
    extra_fields: Tuple[jnp.ndarray, ...] = (),
) -> NeighborLists:
    """O(N²) oracle with identical acceptance semantics (candidate order is
    ascending entity index rather than the grid's cell-scan order; the
    *sets* agree whenever max_neighbors is not exceeded)."""
    n = x.shape[0]
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    valid_entity = active & finite
    dx = x[None, :] - x[:, None]
    dy = y[None, :] - y[:, None]
    d2 = dx * dx + dy * dy
    arange_n = jnp.arange(n, dtype=jnp.int32)
    vr2 = (visual_range * visual_range)[:, None]
    valid = (
        valid_entity[:, None]
        & valid_entity[None, :]
        & (arange_n[:, None] != arange_n[None, :])
        & (d2 < vr2)
        & (d2 > 0)
    )
    cand = jnp.broadcast_to(arange_n[None, :], (n, n))
    ids, d2_out, count = _cap_first_k(cand, d2, valid, cfg.spatial.max_neighbors)
    # every entity is a candidate of every other: payload rows in id order,
    # with inactive ids marked -1 to mirror the grid table's empty slots
    rows_vals = jnp.stack(
        [jnp.where(valid_entity, arange_n, -1).astype(jnp.float32), x, y]
        + [jnp.asarray(f, jnp.float32) for f in extra_fields],
        axis=1,
    )
    flat = jnp.broadcast_to(rows_vals[None, :, :], (n, n, rows_vals.shape[1]))
    return NeighborLists(
        ids=ids, d2=d2_out, count=count,
        n_binned=jnp.sum(valid_entity, dtype=jnp.int32),
        payload=NeighborPayload(data=flat),
    )


def neighbor_lists(
    x: jnp.ndarray,
    y: jnp.ndarray,
    active: jnp.ndarray,
    visual_range: jnp.ndarray,
    cfg: EngineConfig,
    extra_fields: Tuple[jnp.ndarray, ...] = (),
) -> NeighborLists:
    if cfg.spatial.method == "bruteforce":
        return neighbor_lists_bruteforce(
            x, y, active, visual_range, cfg, extra_fields
        )
    return neighbor_lists_grid(x, y, active, visual_range, cfg, extra_fields)
