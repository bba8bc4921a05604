"""Grid-resident constraint solver — the TPU-shaped collision hot path.

Semantically equivalent to the neighbor-list solver in ops/physics.py (the
faithful mapping of resolveCollisionsVerlet, physics_worker.js:405-568), but
restructured for the hardware: the per-entity [N, M] candidate gathers that
dominate the XLA profile are replaced by ONE gather into a dense cell-grid
layout ``[rows, cols, capacity]``, after which every substep is pure vector
math — neighborhood access becomes static array *shifts* of the padded grid
(no gathers, no scatters), and Newton's third law halves the pair work: each
of the (2R+1)²//2 "half-shell" cell offsets computes a C×C pair block once
and applies the reaction by writing the opposing contribution through the
reverse shift.

Physics needs pairs only within ``r_i + r_j <= 2·r_max``, so this solver runs
on its OWN grid geometry (cell ≈ 2·r_max → 3×3 neighborhood) independent of
the user-facing spatial config that defines game-logic perception
(visual_range). The reference couples the two — physics reads the spatial
worker's visualRange-based lists and documents that undersized ranges drop
collisions (physics_worker.js:379-382) — so this decoupling only ever *adds*
pairs the reference would have missed; for every reference demo
(visual_range ≥ collision reach) the pair sets are identical.

Known deviation (shared with the neighbor solver): Jacobi accumulation per
substep instead of in-place Gauss–Seidel; see ops/physics.py module notes.
Entities overflowing a cell's capacity fall back to boundary-only constraints
for that frame (counted in the returned diagnostics).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..state import World
from .physics import _boundary, _pair_hash_angle
from .spatial import GridGeom, bin_entities


def solver_geometry(
    cfg: EngineConfig,
    max_radius: float,
    reach_factor: float = 1.25,
    target_occupancy: float = 0.9,
) -> GridGeom:
    """Pick the solver grid: the smallest cell that keeps the pair search a
    3×3 neighborhood (cell ≥ 2·r_max), widened by ``reach_factor`` so pairs
    that drift into contact *during* a frame's substeps are still candidates
    — the same slack the reference gets from visualRange > collision reach
    (e.g. ball.js:34: vr = 1.33·cellSize ≈ 1.1 × max pair distance). Capacity
    is sized for dense packing of r_max/3-sized entities plus headroom.
    Static per compile; the engine re-derives it when a spawn writes a larger
    radius."""
    cell = max(2.0 * max_radius * reach_factor, 1e-3)
    rows = max(1, math.ceil(cfg.world_height / cell))
    cols = max(1, math.ceil(cfg.world_width / cell))
    # capacity: circles of radius >= r_max/3 whose centers fall in one cell
    # (worst-case transient stacking is higher; overflow is reported)
    r_small = max(max_radius / 3.0, 1e-3)
    cap = int((cell + 2 * r_small) ** 2 / (math.pi * r_small**2) * target_occupancy)
    cap = max(8, min(64, ((cap + 7) // 8) * 8))
    return GridGeom(cell_size=cell, rows=rows, cols=cols, capacity=cap)


def _shard_spatial_rows(arr: jnp.ndarray, cfg: EngineConfig) -> jnp.ndarray:
    """Spatial-domain sharding hint: split a [rows, cols, cap] grid tensor
    into per-device horizontal world slabs along the mesh's data axis. A
    no-op outside a mesh context (single-chip jit). Under a mesh, GSPMD
    partitions the whole constraint pass by world rows and materializes the
    3×3 neighborhood slices as halo exchanges between slab neighbors."""
    import jax as _jax
    from jax.sharding import PartitionSpec as _P

    try:
        return _jax.lax.with_sharding_constraint(
            arr, _P(cfg.sharding.axis_name, None, None)
        )
    except Exception:
        return arr


def grid_constraints(
    world: World,
    cfg: EngineConfig,
    geom: GridGeom,
) -> Tuple[World, jnp.ndarray, jnp.ndarray]:
    """Substepped boundary + pairwise constraints in grid layout
    (applyConstraintsVerlet, physics_worker.js:203-217, :323-395).

    Returns (world, n_binned, overflow_count)."""
    ph = cfg.physics
    t, rb, c = world.transform, world.rigid_body, world.collider
    n = t.x.shape[0]
    R, C = geom.rows, geom.cols
    cap = geom.capacity

    finite = jnp.isfinite(t.x) & jnp.isfinite(t.y)
    valid = t.active & finite
    # flags ride the table entries' payload bits — per-candidate booleans
    # come for free with the id, instead of four extra [grid] gathers
    payload = (
        c.active.astype(jnp.int32)
        | (c.is_trigger.astype(jnp.int32) << 1)
        | (rb.static.astype(jnp.int32) << 2)
        | ((t.active & rb.active & ~rb.static).astype(jnp.int32) << 3)
    )
    bins = bin_entities(t.x, t.y, valid, geom, payload=payload)

    # --- gather entity attributes into grid layout, ONCE per frame ---
    # grid tensors have shape [R+2, C+2, cap]: a one-cell border of empty
    # cells so every 3x3 shift is a static slice (no wraparound, no pad per
    # offset).
    table = bins.table[: geom.num_cells].reshape(R, C, cap)
    tpad = jnp.full((R + 2, C + 2, cap), -1, jnp.int32)
    tpad = tpad.at[1:-1, 1:-1, :].set(table)
    occupied = tpad >= 0
    pk = jnp.where(occupied, tpad >> 24, 0)
    gid = jnp.where(occupied, tpad & 0xFFFFFF, -1)
    tsafe = jnp.maximum(gid, 0)

    def grab(arr, fill=0.0):
        g = arr[tsafe]
        return jnp.where(occupied, g, jnp.asarray(fill, g.dtype))

    shard = lambda a: _shard_spatial_rows(a, cfg)
    gx = shard(grab(t.x))
    gy = shard(grab(t.y))
    gpx = shard(grab(rb.px))
    gpy = shard(grab(rb.py))
    grad = shard(grab(c.radius))
    g_coll = (pk & 1) == 1
    g_trig = (pk & 2) != 0
    g_static = (pk & 4) != 0
    g_moving = (pk & 8) != 0

    strength = jnp.float32(ph.collision_response_strength)
    elasticity = ph.boundary_elasticity
    salt = world.step_count.astype(jnp.uint32)

    # half-shell cell offsets (3x3): self handled separately with a triangle
    # mask; each remaining unordered cell pair appears exactly once.
    HALF_OFFSETS = ((0, 1), (1, -1), (1, 0), (1, 1))
    tri_a = jnp.arange(cap, dtype=jnp.int32)[:, None]
    tri_b = jnp.arange(cap, dtype=jnp.int32)[None, :]
    tri = tri_a < tri_b  # [cap, cap] pair-once within a cell

    def pair_block(xa, ya, ra, ca_, qa, sa, ia, xb, yb, rbad, cb, qb, sb, ib, pair_mask):
        """All-pairs block between slot sets a (axis -2) and b (axis -1).
        Returns (disp_a [.., cap], disp_b [.., cap], count_a, count_b)."""
        dx = xa[..., :, None] - xb[..., None, :]
        dy = ya[..., :, None] - yb[..., None, :]
        d2 = dx * dx + dy * dy
        min_d = ra[..., :, None] + rbad[..., None, :]
        ok = pair_mask & ca_[..., :, None] & cb[..., None, :]
        overlap = ok & (d2 < min_d * min_d)

        trig = qa[..., :, None] | qb[..., None, :]
        st_a = sa[..., :, None]
        st_b = sb[..., None, :]
        share_a = jnp.where(trig | st_a, 0.0, jnp.where(st_b, 1.0, 0.5))
        share_b = jnp.where(trig | st_b, 0.0, jnp.where(st_a, 1.0, 0.5))

        dist = jnp.sqrt(d2)
        inv_dist = jnp.where(dist > 0, 1.0 / jnp.maximum(dist, 1e-30), 0.0)
        corr = (min_d - dist) * strength
        nx = dx * inv_dist
        ny = dy * inv_dist

        # exact-overlap jitter (physics_worker.js:459-506): pair-consistent
        # hash angle; the lower-id side pushes +, the higher-id side −
        zero = d2 == 0
        ang = _pair_hash_angle(ia[..., :, None], ib[..., None, :], salt)
        sep = jnp.float32(0.001)
        sign_a = jnp.where(ia[..., :, None] < ib[..., None, :], 1.0, -1.0)
        zshare_a = jnp.where(trig | st_a, 0.0, jnp.where(st_b, 2.0, 1.0))
        zshare_b = jnp.where(trig | st_b, 0.0, jnp.where(st_a, 2.0, 1.0))
        zx = jnp.cos(ang) * sep
        zy = jnp.sin(ang) * sep

        px_a = jnp.where(zero, zx * sign_a * zshare_a, nx * corr * share_a)
        py_a = jnp.where(zero, zy * sign_a * zshare_a, ny * corr * share_a)
        px_b = jnp.where(zero, zx * (-sign_a) * zshare_b, -nx * corr * share_b)
        py_b = jnp.where(zero, zy * (-sign_a) * zshare_b, -ny * corr * share_b)

        ov = overlap.astype(jnp.float32)
        disp_ax = jnp.sum(px_a * ov, axis=-1)
        disp_ay = jnp.sum(py_a * ov, axis=-1)
        disp_bx = jnp.sum(px_b * ov, axis=-2)
        disp_by = jnp.sum(py_b * ov, axis=-2)
        cnt_a = jnp.sum(overlap, axis=-1, dtype=jnp.int32)
        cnt_b = jnp.sum(overlap, axis=-2, dtype=jnp.int32)
        return disp_ax, disp_ay, disp_bx, disp_by, cnt_a, cnt_b

    center = (slice(1, R + 1), slice(1, C + 1))

    def substep(_k, carry):
        gx, gy, gpx, gpy, cnt = carry
        # boundary clamp + bounce in grid layout (physics_worker.js:344-376)
        bx, bpx = _boundary(gx, gpx, grad, cfg.world_width, g_moving, elasticity)
        by, bpy = _boundary(gy, gpy, grad, cfg.world_height, g_moving, elasticity)
        gx, gy, gpx, gpy = bx, by, bpx, bpy

        disp_x = jnp.zeros_like(gx)
        disp_y = jnp.zeros_like(gy)
        sub_cnt = jnp.zeros(gx.shape, jnp.int32)

        # within-cell pairs (triangle)
        args_c = (
            gx[center], gy[center], grad[center], g_coll[center],
            g_trig[center], g_static[center], gid[center],
        )
        dax, day, dbx, dby, ca_, cb = pair_block(*args_c, *args_c, tri)
        disp_x = disp_x.at[center].add(dax + dbx)
        disp_y = disp_y.at[center].add(day + dby)
        sub_cnt = sub_cnt.at[center].add(ca_ + cb)

        # half-shell neighbor cells: compute each unordered cell pair once,
        # reaction applied through the reverse shift
        for dr, dc in HALF_OFFSETS:
            nbr = (slice(1 + dr, R + 1 + dr), slice(1 + dc, C + 1 + dc))
            args_n = (
                gx[nbr], gy[nbr], grad[nbr], g_coll[nbr],
                g_trig[nbr], g_static[nbr], gid[nbr],
            )
            dax, day, dbx, dby, ca_, cb = pair_block(*args_c, *args_n, True)
            disp_x = disp_x.at[center].add(dax)
            disp_y = disp_y.at[center].add(day)
            sub_cnt = sub_cnt.at[center].add(ca_)
            disp_x = disp_x.at[nbr].add(dbx)
            disp_y = disp_y.at[nbr].add(dby)
            sub_cnt = sub_cnt.at[nbr].add(cb)
        # NOTE: args_c reads the pre-pass gx while disp accumulates — Jacobi.
        return (gx + disp_x, gy + disp_y, gpx, gpy, cnt + sub_cnt)

    init = (gx, gy, gpx, gpy, jnp.zeros(gx.shape, jnp.int32))
    gx, gy, gpx, gpy, g_count = jax.lax.fori_loop(0, ph.sub_step_count, substep, init)

    # --- scatter back: entities read their own grid slot (one [N] gather) ---
    binned = valid & (bins.rank < cap)
    flat_idx = jnp.where(
        binned,
        (bins.row + 1) * (C + 2) * cap + (bins.col + 1) * cap + bins.rank,
        0,
    )
    take = lambda g: g.reshape(-1)[flat_idx]
    moving = t.active & rb.active & ~rb.static
    new_x = jnp.where(binned, take(gx), t.x)
    new_y = jnp.where(binned, take(gy), t.y)
    new_px = jnp.where(binned, take(gpx), rb.px)
    new_py = jnp.where(binned, take(gpy), rb.py)
    new_count = jnp.where(binned, take(g_count), 0)

    # overflow entities: boundary-only fallback (idempotent clamp once)
    over = valid & ~binned
    fx, fpx = _boundary(t.x, rb.px, c.radius, cfg.world_width, moving & over, ph.boundary_elasticity)
    fy, fpy = _boundary(t.y, rb.py, c.radius, cfg.world_height, moving & over, ph.boundary_elasticity)
    new_x = jnp.where(over, fx, new_x)
    new_y = jnp.where(over, fy, new_y)
    new_px = jnp.where(over, fpx, new_px)
    new_py = jnp.where(over, fpy, new_py)

    world = world.replace(
        transform=t.replace(x=new_x, y=new_y),
        rigid_body=rb.replace(px=new_px, py=new_py, collision_count=new_count),
    )
    overflow = jnp.sum(over, dtype=jnp.int32)
    return world, bins.n_binned, overflow
