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
from .physics import _boundary, _pair_hash_dir
from .spatial import GridGeom, bin_entities


def solver_geometry(
    cfg: EngineConfig,
    max_radius: float,
    mean_radius: float = 0.0,
    reach_factor: float = 1.25,
    target_occupancy: float = 0.9,
) -> GridGeom:
    """Pick the solver grid: the smallest cell that keeps the pair search a
    3×3 neighborhood (cell ≥ 2·r_max), widened by ``reach_factor`` so pairs
    that drift into contact *during* a frame's substeps are still candidates
    — the same slack the reference gets from visualRange > collision reach
    (e.g. ball.js:34: vr = 1.33·cellSize ≈ 1.1 × max pair distance).

    Capacity sizes for dense packing of *typical* (mean-radius) entities with
    50% headroom — pair work scales with capacity², so an over-provisioned
    cap is the solver's main waste. Pathological clusters beyond capacity
    degrade to boundary-only for the frame and are visible in the overflow
    diagnostic (the reference's analogous degradation is its maxNeighbors
    truncation dropping collision pairs, physics_worker.js:379-382)."""
    cell = max(2.0 * max_radius * reach_factor, 1e-3)
    rows = max(1, math.ceil(cfg.world_height / cell))
    cols = max(1, math.ceil(cfg.world_width / cell))
    if cfg.physics.solver_capacity > 0:
        # pinned by the user (measured occupancy; see PhysicsConfig docs —
        # values > 64 are rejected by PhysicsConfig.validated)
        return GridGeom(
            cell_size=cell, rows=rows, cols=cols,
            capacity=cfg.physics.solver_capacity,
        )
    r_bar = mean_radius if mean_radius > 0 else max_radius
    r_bar = max(r_bar, max_radius / 3.0, 1e-3)
    cap = int(
        (cell + 2 * r_bar) ** 2 / (math.pi * r_bar**2) * target_occupancy * 1.5
    )
    # capacity is the layout's leading (batch) dim — no 8/128 tiling
    # constraint applies; round to 4 only to limit recompile churn
    cap = max(8, min(64, ((cap + 3) // 4) * 4))
    return GridGeom(cell_size=cell, rows=rows, cols=cols, capacity=cap)


def _shard_spatial_rows(arr: jnp.ndarray, cfg: EngineConfig) -> jnp.ndarray:
    """Spatial-domain sharding hint: split a [rows, cols, cap] grid tensor
    into per-device horizontal world slabs along the mesh's data axis. A
    no-op outside a mesh context (single-chip jit). Under a mesh, GSPMD
    partitions the whole constraint pass by world rows and materializes the
    3×3 neighborhood slices as halo exchanges between slab neighbors.

    The mesh test is explicit (no blanket except): if tracing runs under an
    abstract mesh that carries the configured axis, the constraint MUST apply
    — an invalid spec then raises instead of silently running unsharded
    (VERDICT r1 weak #3). The fully explicit shard_map halo-exchange path
    lives in parallel/halo.py; this hint covers the GSPMD entity-sharded rung."""
    import jax as _jax
    from jax.sharding import PartitionSpec as _P

    mesh = _jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or cfg.sharding.axis_name not in mesh.axis_names:
        return arr
    return _jax.lax.with_sharding_constraint(
        arr, _P(cfg.sharding.axis_name, None, None)
    )


def pack_solver_rows(world: World, gid: jnp.ndarray = None) -> jnp.ndarray:
    """Pack the solver's per-entity attributes into [N, 8] f32 rows:
    (x, y, px, py, radius, flags, gid, 0). One row-scatter of these into grid
    layout replaces all per-field gathers (see grid_constraints notes).
    Flags and the entity id ride as exact small floats.

    ``gid``: optional GLOBAL entity ids for chunk-local worlds (the halo path
    packs per-device [N/D] chunks whose ids must stay globally unique for the
    pair-identity test and the overlap-jitter hash)."""
    t, rb, c = world.transform, world.rigid_body, world.collider
    n = t.x.shape[0]
    if gid is None:
        gid = jnp.arange(n, dtype=jnp.int32)
    if n >= (1 << 24):
        raise ValueError("grid solver packs entity ids into f32: N must be < 2^24")
    flags = (
        c.active.astype(jnp.float32)
        + c.is_trigger.astype(jnp.float32) * 2.0
        + rb.static.astype(jnp.float32) * 4.0
        + (t.active & rb.active & ~rb.static).astype(jnp.float32) * 8.0
    )
    return jnp.stack(
        [
            t.x, t.y, rb.px, rb.py, c.radius, flags,
            gid.astype(jnp.float32),  # exact: global id < 2^24
            jnp.zeros((n,), jnp.float32),
        ],
        axis=1,
    )


def scatter_solver_grid(
    packed: jnp.ndarray,
    flat_idx: jnp.ndarray,
    rows: int,
    cols: int,
    cap: int,
) -> jnp.ndarray:
    """Scatter [M, 8] packed rows into a bordered grid [rows+2, cols+2, cap, 8]
    at precomputed flat slots (OOB slots carry flat_idx == total, dropped).
    Empty slots have gid = -1."""
    flat_cells = (rows + 2) * (cols + 2) * cap
    base = jnp.zeros((flat_cells, 8), jnp.float32)
    base = base.at[:, 6].set(-1.0)  # empty slots: gid = -1
    grid = base.at[flat_idx].set(packed, mode="drop")
    return grid.reshape(rows + 2, cols + 2, cap, 8)


def run_solver_substeps(
    grid: jnp.ndarray,
    geom: GridGeom,
    cfg: EngineConfig,
    salt: jnp.ndarray,
    halo_xy=None,
    shard_hints: bool = True,
):
    """The substep loop over a bordered solver grid [R+2, C+2, cap, 8]
    (channel order per :func:`pack_solver_rows`). ``geom.rows/cols`` describe
    the INTERIOR; the one-cell border is either empty (single device — the
    world edge / shift padding) or holds halo copies of the neighboring
    slab's edge rows (parallel/halo.py).

    ``halo_xy(gx, gy) -> (gx, gy)``: optional per-substep refresh of the halo
    border rows from the neighbor devices (ppermute inside shard_map) — the
    positions of border entities change every substep, the static attribute
    channels do not. ``shard_hints`` gates the GSPMD sharding-constraint
    hints (they must NOT be emitted inside shard_map's manual axes).

    Returns (gx, gy, gpx, gpy, count_grid)."""
    ph = cfg.physics
    R, C, cap = geom.rows, geom.cols, geom.capacity

    shard = (lambda a: _shard_spatial_rows(a, cfg)) if shard_hints else (lambda a: a)
    gx = shard(grid[..., 0])
    gy = shard(grid[..., 1])
    gpx = shard(grid[..., 2])
    gpy = shard(grid[..., 3])
    grad = shard(grid[..., 4])
    pk = grid[..., 5].astype(jnp.int32)
    gid = grid[..., 6].astype(jnp.int32)
    g_coll = (pk & 1) == 1
    g_trig = (pk & 2) != 0
    g_static = (pk & 4) != 0
    g_moving = (pk & 8) != 0

    strength = jnp.float32(ph.collision_response_strength)
    elasticity = ph.boundary_elasticity

    use_pallas = cfg.physics.solver == "pallas"
    if use_pallas:
        from .pallas_kernels import pair_pass_pallas

        attrs = grid[..., 4:7]  # radius, flags, gid channels
        interp = jax.default_backend() != "tpu"

        def substep_pallas(_k, carry):
            gx, gy, gpx, gpy, cnt = carry
            if halo_xy is not None:
                gx, gy = halo_xy(gx, gy)
            gx, gpx = _boundary(gx, gpx, grad, cfg.world_width, g_moving, ph.boundary_elasticity)
            gy, gpy = _boundary(gy, gpy, grad, cfg.world_height, g_moving, ph.boundary_elasticity)
            dxg, dyg, cg = pair_pass_pallas(
                gx, gy, attrs, salt, geom,
                float(ph.collision_response_strength), interpret=interp,
            )
            return (gx + dxg, gy + dyg, gpx, gpy, cnt + cg)

    center = (slice(1, R + 1), slice(1, C + 1))
    # full-shell 3x3 offsets: every ordered pair (i, j) is evaluated from i's
    # side exactly once (the self cell's i==j case is masked by id equality),
    # so each entity accumulates its own share with no reaction scatter —
    # the same Jacobi form as the neighbor-list solver.
    OFFSETS = tuple(
        (dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
    )
    # neighbor slots processed in chunks of J: intermediates stay
    # [R, C, cap, J] (bounded, fusion-friendly) instead of [.., cap, cap];
    # capacity is a multiple of 4 (solver_geometry) or user-pinned, so fall
    # back to the largest chunk that divides it
    J = next(j for j in (8, 4, 2, 1) if cap % j == 0)

    def substep(_k, carry):
        gx, gy, gpx, gpy, cnt = carry
        if halo_xy is not None:
            gx, gy = halo_xy(gx, gy)
        # boundary clamp + bounce in grid layout (physics_worker.js:344-376)
        gx, gpx = _boundary(gx, gpx, grad, cfg.world_width, g_moving, elasticity)
        gy, gpy = _boundary(gy, gpy, grad, cfg.world_height, g_moving, elasticity)

        xs = gx[center][..., :, None]  # [R, C, cap, 1]
        ys = gy[center][..., :, None]
        rs = grad[center][..., :, None]
        ok_i = g_coll[center][..., :, None]
        trig_i = g_trig[center][..., :, None]
        st_i = g_static[center][..., :, None]
        id_i = gid[center][..., :, None]

        disp_x = jnp.zeros(gx[center].shape, jnp.float32)
        disp_y = jnp.zeros_like(disp_x)
        sub_cnt = jnp.zeros(disp_x.shape, jnp.int32)

        for dr, dc in OFFSETS:
            nbr = (slice(1 + dr, R + 1 + dr), slice(1 + dc, C + 1 + dc))
            xn_full, yn_full = gx[nbr], gy[nbr]
            rn_full = grad[nbr]
            okn_full, trign_full = g_coll[nbr], g_trig[nbr]
            stn_full, idn_full = g_static[nbr], gid[nbr]
            for c0 in range(0, cap, J):
                sl = slice(c0, c0 + J)
                xb = xn_full[..., None, sl]  # [R, C, 1, J]
                yb = yn_full[..., None, sl]
                rb_ = rn_full[..., None, sl]
                ok = ok_i & okn_full[..., None, sl] & (id_i != idn_full[..., None, sl])
                dx = xs - xb
                dy = ys - yb
                d2 = dx * dx + dy * dy
                min_d = rs + rb_
                overlap = ok & (d2 < min_d * min_d)

                trig = trig_i | trign_full[..., None, sl]
                st_j = stn_full[..., None, sl]
                share = jnp.where(
                    trig | st_i, 0.0, jnp.where(st_j, 1.0, 0.5)
                )
                inv_dist = jnp.where(d2 > 0, jax.lax.rsqrt(d2), 0.0)
                dist = d2 * inv_dist
                corr = (min_d - dist) * strength * share
                # exact-overlap jitter (physics_worker.js:459-506)
                zero = d2 == 0
                id_j = idn_full[..., None, sl]
                ux, uy = _pair_hash_dir(id_i, id_j, salt)
                sign = jnp.where(id_i < id_j, 1.0, -1.0)
                zshare = jnp.where(
                    trig | st_i, 0.0, jnp.where(st_j, 2.0, 1.0)
                ) * sign * jnp.float32(0.001)
                push_x = jnp.where(zero, ux * zshare, dx * inv_dist * corr)
                push_y = jnp.where(zero, uy * zshare, dy * inv_dist * corr)
                ov = overlap.astype(jnp.float32)
                disp_x = disp_x + jnp.sum(push_x * ov, axis=-1)
                disp_y = disp_y + jnp.sum(push_y * ov, axis=-1)
                sub_cnt = sub_cnt + jnp.sum(overlap, axis=-1, dtype=jnp.int32)

        # NOTE: reads are against the substep's starting positions — Jacobi.
        pad = ((1, 1), (1, 1), (0, 0))
        return (
            gx + jnp.pad(disp_x, pad),
            gy + jnp.pad(disp_y, pad),
            gpx, gpy,
            cnt + jnp.pad(sub_cnt, pad),
        )

    # count init derives from a grid channel (not a fresh zeros) so its
    # varying-manual-axes type matches the loop body under shard_map
    init = (gx, gy, gpx, gpy, gid * 0)
    return jax.lax.fori_loop(
        0, ph.sub_step_count, substep_pallas if use_pallas else substep, init
    )


def resident_tile_rows(cap: int, cols_pad: int) -> int:
    """Pick the pair-kernel row tile (multiple of 8). Wider tiles amortize
    the halo DMA/roll overhead ((tr+2H)/tr: 1.5x at 32 vs 2.0x at 16), but
    the kernel's scoped-VMEM stack grows with the tile: measured on v5e at
    the 1M-balls geometry (cap 16, 1280 lanes), tr=32 allocates 120.2 MiB
    scoped against a 111.4 MiB limit (compile-time OOM) while tr=16 fits.
    The scoped stack tracks ~2.2x the analytic scratch footprint
    (8 halo tiles + 3 accumulators + double-buffered outputs), so pick the
    widest tile whose projected stack stays under 100 MiB.

    The 8-buffer halo term deliberately over-counts for the predicated
    symmetric kernel (pair_pass_resident dropped its 4 rolled scratch
    buffers): both kernel variants must pick the SAME tile height because
    resident_layout_shape — and therefore the world's cached
    solver_grad/solver_meta shapes — derives from this function, and a
    per-variant estimate would recompile/reshape the caches when
    solver_predicated flips at runtime (advisor r3)."""
    from .pallas_kernels import HALO

    for tr in (32, 16, 8):
        # 8 halo-window buffers + 3 accumulators + double-buffered outputs
        # (9·tr) + the symmetric kernel's 3 spill scratch rows, 3
        # double-buffered spill outputs (72 row-equivalents) and 3 back-sum
        # planes (3·tr/cap rows — cap-independent [tr, Cp] buffers)
        est = cap * cols_pad * 4 * (8 * (tr + 2 * HALO) + 9 * tr + 72)
        est += 3 * tr * cols_pad * 4
        if est * 2.2 <= 100 * 1024 * 1024:
            return tr
    return 8


def resident_layout_shape(geom: GridGeom) -> Tuple[int, int, int]:
    """The resident solver's slot-major layout shape [cap, rows_buf, Cp]
    for a geometry — the shape of the solver_grad/solver_meta world cache
    fields Engine._build_step installs (must match grid_constraints_resident's
    own derivation)."""
    from .pallas_kernels import HALO

    cap = geom.capacity
    cp = -(-(geom.cols + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-geom.rows // tr)
    return cap, n_tiles * tr + 2 * HALO, cp


def _cached_bins(world: World, cfg: EngineConfig, compute):
    """Bin-cache gate for ``physics.rebin_interval > 1`` (config.py docs):
    recompute (flat slot, in-grid mask) on the first frame and every k-th
    frame after; reuse the cached assignment in between, exactly like the
    reference's physics worker consuming the spatial worker's previous-frame
    grid (physics_worker.js:379-383). Positions scattered into the (possibly
    stale) slots are always CURRENT, so recorded overlaps use true distances;
    staleness can only miss pairs for cell-crossers, never invent them.

    Returns (world', flat, in_grid). No-op (always compute) when the engine
    did not install the cache arrays."""
    interval = max(1, cfg.physics.rebin_interval)
    if interval == 1 or world.solver_flat is None:
        flat, in_grid = compute()
        return world, flat, in_grid
    fresh_for = world.step_count - world.solver_bin_step
    rebin = (world.solver_bin_step < 0) | (fresh_for >= interval)
    flat, in_grid = jax.lax.cond(
        rebin,
        compute,
        lambda: (world.solver_flat, world.solver_in_grid),
    )
    world = world.replace(
        solver_flat=flat,
        solver_in_grid=in_grid,
        solver_bin_step=jnp.where(
            rebin, world.step_count, world.solver_bin_step
        ).astype(jnp.int32),
    )
    return world, flat, in_grid


def _resident_substeps(
    gx, gy, gpx, gpy, grad, meta, g_moving, cfg, tr, n_tiles,
    salt, use_symmetric, interp, carry_px, band=None,
):
    """The shared substep loop of the resident solver paths: boundary clamp
    + Pallas pair pass, in the slot-major layout. ``carry_px=False`` runs the
    NaN-carry px variant (see grid_constraints_resident's px/py notes);
    ``True`` applies the full reflected-bounce _boundary to real px/py.

    ``band=(r_lo, r_hi, lane_lo, lane_hi)`` activates the BANDED boundary
    (round 4, requires ``carry_px`` + the symmetric kernel): the POSITION
    clamp folds into the pair kernel's VMEM tiles (every slot, every substep
    — positions can never escape the world), while the px/py bounce write —
    which only fires for entities that actually clamp, i.e. within one drift
    bound of a world border — touches only the border bands: layout rows
    [:r_lo] and [r_hi:] for the y axis, lanes [:lane_lo] and [-lane_hi:]
    for x (lane_hi also spans the column pad, _band_spec). The full-
    layout `_boundary` HBM read-modify-write (measured 1.6 ms/substep at the
    1M geometry, benchmarks/probe_fast_parts.py) drops to band-sized slices.
    Band sizing + the drift-violation metric live in the caller
    (resident_persistent_step)."""
    from .pallas_kernels import HALO, pair_pass_resident

    ph = cfg.physics
    strength = float(ph.collision_response_strength)
    elasticity = ph.boundary_elasticity
    if band is not None:
        assert carry_px and use_symmetric
        r_lo, r_hi, lane_lo, lane_hi = band
        cp_w = gx.shape[2]

    def _band_px(a, pa, sls, extent):
        """Bounce-write `px = cx + (cx - px)*e` on border slices only."""
        for sl in sls:
            ab, pb = a[sl], pa[sl]
            rb, mb = grad[sl], g_moving[sl]
            cxb = jnp.clip(ab, rb, extent - rb)
            hit = mb & (cxb != ab)
            pa = pa.at[sl].set(
                jnp.where(hit, cxb + (cxb - pb) * elasticity, pb)
            )
        return pa

    def substep(_k, carry):
        gx, gy, gpx, gpy, cnt = carry
        if band is not None:
            # px/py bounce on the bands; the position clamp itself rides
            # the kernel (clamp_bounds below) for ALL slots
            gpx = _band_px(
                gx, gpx,
                (jnp.index_exp[:, :, :lane_lo],
                 jnp.index_exp[:, :, cp_w - lane_hi:]),
                cfg.world_width,
            )
            gpy = _band_px(
                gy, gpy,
                (jnp.index_exp[:, :r_lo], jnp.index_exp[:, r_hi:]),
                cfg.world_height,
            )
        elif carry_px:
            gx, gpx = _boundary(gx, gpx, grad, cfg.world_width, g_moving, elasticity)
            gy, gpy = _boundary(gy, gpy, grad, cfg.world_height, g_moving, elasticity)
        else:
            cx = jnp.clip(gx, grad, cfg.world_width - grad)
            gpx = jnp.where(g_moving & (cx != gx), cx, gpx)
            gx = jnp.where(g_moving, cx, gx)
            cy = jnp.clip(gy, grad, cfg.world_height - grad)
            gpy = jnp.where(g_moving & (cy != gy), cy, gpy)
            gy = jnp.where(g_moving, cy, gy)
        nx, ny, c_ = pair_pass_resident(
            gx, gy, grad, meta, salt, strength,
            tile_rows=tr, interpret=interp,
            symmetric=use_symmetric,
            clamp_bounds=(
                (cfg.world_width, cfg.world_height)
                if band is not None else None
            ),
        )
        # full-height concat beats dynamic_update_slice here (measured 24.25
        # vs 23.55 steps/s at 1M — the in-place DUS forces a copy of the
        # carried buffer plus a read-modify-write on the count plane)
        pad = ((0, 0), (HALO, HALO), (0, 0))
        return (
            jnp.concatenate([gx[:, :HALO], nx, gx[:, HALO + n_tiles * tr:]], axis=1),
            jnp.concatenate([gy[:, :HALO], ny, gy[:, HALO + n_tiles * tr:]], axis=1),
            gpx, gpy,
            cnt + jnp.pad(c_, pad),
        )

    # STATIC UNROLL: sub_step_count is a small static (2 in the balls demo).
    # A fori_loop here materializes the 5-array layout carry on entry
    # (measured 14.9 ms at 1M — benchmarks/profile_solver_parts.py: first
    # substep 26.8 ms vs 11.9 for the second); unrolling lets XLA fuse the
    # NaN-carry inits and count zeros into the substep bodies instead.
    carry = (gx, gy, gpx, gpy, meta * 0)
    if ph.sub_step_count <= 8:
        for k in range(ph.sub_step_count):
            carry = substep(k, carry)
    else:
        carry = jax.lax.fori_loop(0, ph.sub_step_count, substep, carry)
    return carry


def grid_constraints_resident(
    world: World,
    cfg: EngineConfig,
    geom: GridGeom,
) -> Tuple[World, jnp.ndarray, jnp.ndarray]:
    """The single-chip Pallas fast path: the whole constraint phase stays in
    the pair kernel's slot-major layout ``[cap, rows_buf, cols_pad]``.

    Motivated by measured 1M-entity costs on v5e (benchmarks/bench_kernels.py):
    an [N, 8] row-scatter costs ~104 ms where 6 per-FIELD scatters cost ~40 ms,
    and each grid↔slot-major transpose costs ~3.4 ms/field — the legacy path
    paid the transposes inside every substep's kernel wrapper. Here binning
    scatters straight into the kernel's resident layout (per-field, computed
    flat indices), the substep loop (boundary + pair pass) runs in that layout
    with no reshuffling, and the read-back is one channel-stacked row gather.

    Bit-exact with the XLA grid solver (grid_constraints): same binning, same
    per-slot elementwise formulas, same offset/slot accumulation order —
    tests/test_pallas.py asserts array equality.
    """
    from .pallas_kernels import HALO, pair_pass_resident

    ph = cfg.physics
    t, rb, c = world.transform, world.rigid_body, world.collider
    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp
    n = t.x.shape[0]
    if n >= (1 << 24):
        raise ValueError("resident solver packs entity ids into meta: N < 2^24")

    finite = jnp.isfinite(t.x) & jnp.isfinite(t.y)
    valid = t.active & finite

    def _compute_bins():
        bins = bin_entities(t.x, t.y, valid, geom, build_table=False)
        in_grid = valid & (bins.rank < cap)
        # clamp rank BEFORE the slot product: overflow ranks can reach N and
        # the (rank * rows_buf * cp) product would wrap int32; masked to
        # `total` after
        rank_safe = jnp.where(in_grid, bins.rank, 0)
        flat = (rank_safe * rows_buf + (HALO + bins.row)) * cp + (1 + bins.col)
        return jnp.where(in_grid, flat, total), in_grid  # OOB -> dropped

    # per-field scatters build the layout (measured: a gather-based build —
    # one meta scatter + [total]-index gathers through the ids — costs 605
    # ms/step at 1M vs 88 for the scatters; TPU's general gather at 11.5M
    # indices is far slower than 1M-index scatters into a zeroed buffer)
    def scat_at(flat_idx, vals, dtype=jnp.float32):
        return (
            jnp.zeros((total,), dtype)
            .at[flat_idx]
            .set(vals.astype(dtype), mode="drop", unique_indices=True)
            .reshape(cap, rows_buf, cp)
        )

    def _attr_layouts(flat_idx):
        """Radius + meta (gid | flags<<24; empty slot = 0) layouts for a
        slot assignment — static between rebins, so they ride the rebin
        cond: at 1M each field scatter costs ~7 ms in-context on v5e
        (bench_kernels.py; the 4 scatters were the largest solver cost
        after the pair kernel), and only x/y change every frame."""
        grad = scat_at(flat_idx, c.radius)
        flags = (
            c.active.astype(jnp.int32)
            | (c.is_trigger.astype(jnp.int32) << 1)
            | (rb.static.astype(jnp.int32) << 2)
            | ((t.active & rb.active & ~rb.static).astype(jnp.int32) << 3)
        )
        gid = jnp.arange(n, dtype=jnp.int32)
        meta = scat_at(flat_idx, gid | (flags << 24), jnp.int32)
        return grad, meta

    interval = max(1, cfg.physics.rebin_interval)
    attr_cached = (
        interval > 1
        and world.solver_grad is not None
        and world.solver_grad.shape == (cap, rows_buf, cp)
    )
    if not attr_cached:
        world, flat, in_grid = _cached_bins(world, cfg, _compute_bins)
        grad, meta = _attr_layouts(flat)
    else:
        # one cond carries bins AND attribute layouts: between rebins the
        # radius/meta scatters are skipped entirely. Staleness matches the
        # bin cache's documented semantics (_cached_bins): attribute edits
        # (radius writes, active-flag flips from in-program despawns) land
        # at the next rebin, bounded by rebin_interval frames — the
        # reference's physics likewise consumes the spatial worker's
        # previous-frame view (physics_worker.js:379-383).
        fresh_for = world.step_count - world.solver_bin_step
        rebin = (world.solver_bin_step < 0) | (fresh_for >= interval)
        # residency installs a max_vel layout (solver_maxv) alongside
        # grad/meta; when this NON-resident path rebins (FramePlan chunks
        # run it with residency leaves present) it must refresh maxv with
        # the same slot assignment, or later resident FAST frames would
        # clamp velocities through a stale layout (round-4 review finding)
        track_maxv = (
            world.solver_maxv is not None
            and world.solver_maxv.shape == (cap, rows_buf, cp)
        )

        def _fresh():
            flat, in_grid = _compute_bins()
            grad, meta = _attr_layouts(flat)
            out = (flat, in_grid, grad, meta)
            if track_maxv:
                out += (scat_at(flat, rb.max_vel),)
            return out

        def _keep():
            out = (
                world.solver_flat, world.solver_in_grid,
                world.solver_grad, world.solver_meta,
            )
            if track_maxv:
                out += (world.solver_maxv,)
            return out

        carried = jax.lax.cond(rebin, _fresh, _keep)
        flat, in_grid, grad, meta = carried[:4]
        world = world.replace(
            solver_flat=flat,
            solver_in_grid=in_grid,
            solver_grad=grad,
            solver_meta=meta,
            solver_bin_step=jnp.where(
                rebin, world.step_count, world.solver_bin_step
            ).astype(jnp.int32),
            **({"solver_maxv": carried[4]} if track_maxv else {}),
        )
    t, rb = world.transform, world.rigid_body  # rebind post-replace

    def scat(vals, dtype=jnp.float32):
        return scat_at(flat, vals, dtype)

    gx = scat(t.x)
    gy = scat(t.y)
    g_moving = ((meta >> 24) & 8) != 0

    strength = float(ph.collision_response_strength)
    elasticity = ph.boundary_elasticity
    salt = world.step_count.astype(jnp.uint32)
    interp = jax.default_backend() != "tpu"

    # predicated-kernel gate (PhysicsConfig.solver_predicated docs): the
    # occupancy-predicated symmetric kernel wins at wide layouts and loses
    # to the two-sided full-block kernel at narrow ones (measured crossover
    # ~512 padded lanes)
    use_symmetric = bool(ph.solver_symmetric) and (
        ph.solver_predicated == "on"
        or (ph.solver_predicated == "auto" and cp >= 512)
    )

    # px/py handling: the pair kernel never reads them — only the boundary
    # bounce does. With elasticity == 0 the reflection collapses to
    # px' = clamped-at-last-hit (no dependence on the old px), so the two
    # px/py field scatters (~15 ms of the 1M frame) are replaced by NaN-init
    # "last clamped value" carries updated elementwise in-loop; bit-exact.
    carry_px = elasticity != 0.0
    if carry_px:
        gpx = scat(rb.px)
        gpy = scat(rb.py)
    else:
        gpx = jnp.full((cap, rows_buf, cp), jnp.nan, jnp.float32)
        gpy = jnp.full((cap, rows_buf, cp), jnp.nan, jnp.float32)

    gx, gy, gpx, gpy, g_count = _resident_substeps(
        gx, gy, gpx, gpy, grad, meta, g_moving, cfg, tr, n_tiles,
        salt, use_symmetric, interp, carry_px,
    )

    # read back: one channel-stacked row gather. Measured at 1M on v5e:
    # 5 per-field [1M]-index gathers cost ~28 ms MORE than stacking
    # (229 MB write) + one [1M, 5] row gather — the per-index overhead of a
    # TPU gather amortizes over row channels, so batch channels into rows
    out_flat = jnp.stack(
        [gx, gy, gpx, gpy, g_count.astype(jnp.float32)], axis=-1
    ).reshape(total, 5)
    rows = out_flat[jnp.where(in_grid, flat, 0)]
    moving = t.active & rb.active & ~rb.static
    new_x = jnp.where(in_grid, rows[:, 0], t.x)
    new_y = jnp.where(in_grid, rows[:, 1], t.y)
    if carry_px:
        new_px = jnp.where(in_grid, rows[:, 2], rb.px)
        new_py = jnp.where(in_grid, rows[:, 3], rb.py)
    else:
        # NaN carry = never boundary-hit: keep the original px/py
        new_px = jnp.where(in_grid & jnp.isfinite(rows[:, 2]), rows[:, 2], rb.px)
        new_py = jnp.where(in_grid & jnp.isfinite(rows[:, 3]), rows[:, 3], rb.py)
    new_count = jnp.where(in_grid, rows[:, 4].astype(jnp.int32), 0)

    # overflow entities: boundary-only fallback (idempotent clamp once)
    over = valid & ~in_grid
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
    return world, jnp.sum(in_grid, dtype=jnp.int32), overflow


def grid_constraints(
    world: World,
    cfg: EngineConfig,
    geom: GridGeom,
) -> Tuple[World, jnp.ndarray, jnp.ndarray]:
    """Substepped boundary + pairwise constraints in grid layout
    (applyConstraintsVerlet, physics_worker.js:203-217, :323-395).

    Returns (world, n_binned, overflow_count)."""
    if cfg.physics.solver == "pallas":
        return grid_constraints_resident(world, cfg, geom)
    ph = cfg.physics
    t, rb, c = world.transform, world.rigid_body, world.collider
    R, C = geom.rows, geom.cols
    cap = geom.capacity

    finite = jnp.isfinite(t.x) & jnp.isfinite(t.y)
    valid = t.active & finite
    flat_cells = (R + 2) * (C + 2) * cap

    def _compute_bins():
        bins = bin_entities(t.x, t.y, valid, geom, build_table=False)
        idx = ((bins.row + 1) * (C + 2) + (bins.col + 1)) * cap + bins.rank
        in_grid = valid & (bins.rank < cap)
        return jnp.where(in_grid, idx, flat_cells), in_grid  # OOB -> dropped

    world, flat_idx, in_grid = _cached_bins(world, cfg, _compute_bins)
    t, rb = world.transform, world.rigid_body

    # --- SCATTER entity attributes into grid layout, ONCE per frame ---
    # One [N, 8]-row scatter instead of per-field gathers: on TPU, gather/
    # scatter cost is per-INDEX (a row of 8 f32 costs the same as one), and
    # scatters are several times cheaper per index than gathers — this is the
    # dominant term of the whole frame at 1M entities. Grid tensors are
    # [R+2, C+2, cap(, 8)]: a one-cell border of empty cells so every 3x3
    # shift is a static slice.
    packed = pack_solver_rows(world)
    grid = scatter_solver_grid(packed, flat_idx, R, C, cap)

    gx, gy, gpx, gpy, g_count = run_solver_substeps(
        grid, geom, cfg, world.step_count.astype(jnp.uint32)
    )

    # --- read back: one [N]-row gather of the packed outputs ---
    binned = in_grid
    out_flat = jnp.stack(
        [gx, gy, gpx, gpy, g_count.astype(jnp.float32)], axis=-1
    ).reshape(flat_cells, 5)
    rows = out_flat[jnp.where(binned, flat_idx, 0)]
    moving = t.active & rb.active & ~rb.static
    new_x = jnp.where(binned, rows[:, 0], t.x)
    new_y = jnp.where(binned, rows[:, 1], t.y)
    new_px = jnp.where(binned, rows[:, 2], rb.px)
    new_py = jnp.where(binned, rows[:, 3], rb.py)
    new_count = jnp.where(binned, rows[:, 4].astype(jnp.int32), 0)

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
    return world, jnp.sum(binned, dtype=jnp.int32), overflow


def _use_symmetric(cfg: EngineConfig, cp: int) -> bool:
    """Shared predicate for the predicated-symmetric pair kernel (used by
    resident_persistent_step, resident_lazy_frame and probes — one source
    of truth so banding/gating decisions can't diverge)."""
    ph = cfg.physics
    return bool(ph.solver_symmetric) and (
        ph.solver_predicated == "on"
        or (ph.solver_predicated == "auto" and cp >= 512)
    )


def _pin_layout_positions(gx0, gy0, flat0, in_grid0, xs, ys, pin_rows, total):
    """Refresh host-driven rows' layout positions (the mouse, written by
    apply_inputs in entity order every frame): one tiny scatter per pinned
    row — same "current positions in stale slots" semantics as the
    scatter-per-frame bin cache."""
    for r in pin_rows:
        fr = jnp.where(in_grid0[r], flat0[r], total)
        gx0 = gx0.reshape(total).at[fr].set(xs[r], mode="drop").reshape(gx0.shape)
        gy0 = gy0.reshape(total).at[fr].set(ys[r], mode="drop").reshape(gy0.shape)
    return gx0, gy0


def _layout_verlet(
    gx0, gy0, gpx0, gpy0, meta0, maxv0, cfg, force_specs, inputs, dt_ratio
):
    """The layout-space tick-force + Verlet move shared by
    resident_persistent_step's FAST branch and resident_lazy_frame (one
    implementation so the lazy chunk can never drift from the eager FAST
    semantics the bit-exactness tests pin — advisor r4). Applies
    eval_layout_forces over slots, the damping/gravity/max_vel-clamped
    Verlet displacement (verlet_move's formula, physics_worker.js:240-316),
    moving-slot predication from the meta flags. Returns (gx1, gy1, gpx1,
    gpy1)."""
    from ..behavior import eval_layout_forces

    ph = cfg.physics
    gid0 = meta0 & 0xFFFFFF
    gax, gay = eval_layout_forces(force_specs, gx0, gy0, gid0, inputs, cfg)
    mv = ((meta0 >> 24) & 8) != 0
    damping = jnp.float32(ph.verlet_damping)
    gscale = jnp.float32(dt_ratio) ** 2
    grav_x, grav_y = ph.gravity
    dx = (gx0 - gpx0) * damping + gscale * grav_x + gax * dt_ratio
    dy = (gy0 - gpy0) * damping + gscale * grav_y + gay * dt_ratio
    max_speed = jnp.where(maxv0 > 0, maxv0, 100.0)
    dx = jnp.clip(dx, -max_speed, max_speed)
    dy = jnp.clip(dy, -max_speed, max_speed)
    return (
        jnp.where(mv, gx0 + dx, gx0),
        jnp.where(mv, gy0 + dy, gy0),
        jnp.where(mv, gx0, gpx0),
        jnp.where(mv, gy0, gpy0),
    )


def _band_spec(
    cfg: EngineConfig,
    geom: GridGeom,
    rows_buf: int,
    band_vel_bound: float,
    use_symmetric: bool,
) -> Tuple["Tuple[int, int, int] | None", int]:
    """Banded-boundary sizing shared by resident_persistent_step and
    resident_lazy_frame (see resident_persistent_step's docstring): drift
    between rebins is bounded by (interval-1) Verlet-clamped frames plus
    pair-push / cell-quantization slack (4 cells covers the max radius
    twice over — solver cells are >= 2*r_max + reach slack,
    solver_geometry). Returns ((r_lo, r_hi, lane_lo, lane_hi) or None,
    band_cells)."""
    from .pallas_kernels import HALO

    if not (band_vel_bound > 0.0 and use_symmetric):
        return None, 0
    interval = max(2, cfg.physics.rebin_interval)
    R, C, _cap, cp = _resident_dims(geom)[:4]
    drift_px = (interval - 1) * float(band_vel_bound)
    band_cells = int(math.ceil(drift_px / geom.cell_size)) + 4
    r_lo = -(-(HALO + band_cells) // 8) * 8
    pad_rows = (rows_buf - 2 * HALO) - R
    bot = -(-(band_cells + pad_rows + HALO) // 8) * 8
    lane_lo = -(-(1 + band_cells) // 128) * 128
    # The RIGHT band must reach through the column pad cp-(C+2) (advisor
    # round-4 high finding): entities occupy lanes 1..C, so the slice
    # [:, :, cp-lane_hi:] must start at or below lane C-band_cells —
    # lane_hi >= cp - C + band_cells. Sizing it like the left band
    # (1+band_cells) left the whole band inside the pad for geometries
    # with a large lane pad (e.g. C in [383,390] at cp=512): right-border
    # entities got the in-kernel clamp but never the px bounce.
    lane_hi = -(-(cp - C + band_cells) // 128) * 128
    if r_lo + bot + 8 <= rows_buf and lane_lo + lane_hi + 128 <= cp:
        return (r_lo, rows_buf - bot, lane_lo, lane_hi), band_cells
    return None, band_cells


def resident_persistent_step(
    world: World,
    cfg: EngineConfig,
    geom: GridGeom,
    inputs,
    force_specs,
    dt_ratio: float,
    pin_rows: Tuple[int, ...] = (),
    band_vel_bound: float = 0.0,
) -> Tuple[World, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Verlet move + constraints with LAYOUT-RESIDENT positions
    (physics.position_residency): x/y/px/py live in the pair kernel's
    slot-major layout [cap, rows_buf, Cp] ACROSS frames (world.solver_x/y/
    px/py), so the per-frame entity→layout position scatters — measured
    ~13 ms/frame of the 36 ms 1M-entity floor on v5e (docs/parity_status.md)
    — only run on layout (re)build frames. Replaces verlet_move +
    grid_constraints for qualified scenes (behavior.probe_layout_safe);
    ``update_derived`` still runs after.

    Per frame, one of two regimes (one in-program cond):
      - FAST (layout fresh AND bins unexpired): tick forces
        (``force_specs``) and the Verlet integrate evaluate directly over
        layout slots (behavior.eval_layout_forces) — no scatters, no
        binning.
      - REBUILD (bins expired, first frame, host mutation invalidated the
        cache, or a non-resident program advanced step_count): bins come
        from the entity-order post-move positions (cached slots when only
        the layout is stale), and x/y/px/py scatter into the layout.

    The entity-order Verlet (``w_e``) runs every frame regardless — cheap
    elementwise — and is EXACT, because the readback keeps entity-order
    x/y/px/py current every frame (px/py ride the same channel-stacked
    row gather as x/y for ~0.3 ms at 1M — the price of never needing a
    host-side sync). It supplies vx/vy (bit-identical to a layout
    evaluation: same formula, same inputs), the rebuild scatter values,
    and the out-of-grid overflow fallback. Host code therefore sees fully
    current entity state at all times; host mutations only need the bin
    cache invalidated (Engine._apply_columns does), which routes the next
    frame through REBUILD.

    Bit-exactness vs position_residency='off': the FAST branch applies the
    same elementwise formulas (verlet_move, physics_worker.js:240-316) to
    the same values, and the real-px boundary is algebraically identical
    to the 'off' path's NaN-carry variant at elasticity 0 —
    tests/test_round4.py asserts whole-trajectory equality including px/py.

    ``band_vel_bound`` (round 4): > 0 enables the BANDED boundary when the
    predicated symmetric kernel is active — the boundary position clamp
    folds into the pair kernel (every slot, every substep) and the px/py
    bounce writes shrink to the world-border bands of the layout, sized so
    that an entity whose per-frame displacement the Verlet clamps to
    ``band_vel_bound`` cannot drift from an out-of-band slot to a border
    between rebins (the engine passes max(100, max host-written max_vel)
    and rebuilds the step if a later write exceeds it; layout-safe ticks
    cannot write max_vel, behavior.LAYOUT_WRITABLE). Values are bit-exact
    with the full-layout boundary whenever the bound holds; the returned
    ``band_drift`` counts in-grid entities whose drift EXCEEDED the sizing
    assumption (0 in healthy runs — a nonzero value means px bounces may
    have been missed until the next rebuild).

    Returns (world, n_binned, overflow_count, band_drift).
    """
    from .physics import verlet_move

    ph = cfg.physics
    interval = max(2, ph.rebin_interval)
    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    from .pallas_kernels import HALO

    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp
    n = world.transform.x.shape[0]
    if n >= (1 << 24):
        raise ValueError("resident solver packs entity ids into meta: N < 2^24")
    if world.solver_x is None or world.solver_x.shape != (cap, rows_buf, cp):
        raise ValueError(
            "position residency requires Engine-installed solver_x/y/px/py "
            "layout leaves at the current geometry"
        )

    # entity-order Verlet — exact every frame (see docstring); also zeroes
    # ax/ay for moving rows, keeping the reference's "ax consumed every
    # frame" semantics for the NEXT tick's ctx.ax reads
    w_e = verlet_move(world, cfg, dt_ratio)
    te, rbe = w_e.transform, w_e.rigid_body
    c = world.collider
    moving_e = te.active & rbe.active & ~rbe.static
    finite = jnp.isfinite(te.x) & jnp.isfinite(te.y)
    valid_e = te.active & finite

    pos_valid = world.solver_pos_step == world.step_count
    fresh_for = world.step_count - world.solver_bin_step
    expired = (world.solver_bin_step < 0) | (fresh_for >= interval)

    def scat_at(flat_idx, vals, dtype=jnp.float32):
        return (
            jnp.zeros((total,), dtype)
            .at[flat_idx]
            .set(vals.astype(dtype), mode="drop", unique_indices=True)
            .reshape(cap, rows_buf, cp)
        )

    def _fast():
        """Layout fresh + bins unexpired: Verlet in layout space."""
        flat0, in_grid0 = world.solver_flat, world.solver_in_grid
        grad0, meta0, maxv0 = (
            world.solver_grad, world.solver_meta, world.solver_maxv
        )
        gx0, gy0 = world.solver_x, world.solver_y
        gpx0, gpy0 = world.solver_px, world.solver_py

        gx0, gy0 = _pin_layout_positions(
            gx0, gy0, flat0, in_grid0, te.x, te.y, pin_rows, total
        )
        gx1, gy1, gpx1, gpy1 = _layout_verlet(
            gx0, gy0, gpx0, gpy0, meta0, maxv0, cfg, force_specs, inputs,
            dt_ratio,
        )
        return (
            flat0, in_grid0, grad0, meta0, maxv0, gx1, gy1, gpx1, gpy1,
        )

    def _rebuild():
        """Layout stale and/or bins expired: (re)bin from the entity-order
        post-move state and scatter it in — today's classic path."""

        def _fresh_bins():
            bins = bin_entities(te.x, te.y, valid_e, geom, build_table=False)
            in_grid = valid_e & (bins.rank < cap)
            rank_safe = jnp.where(in_grid, bins.rank, 0)
            flat = (rank_safe * rows_buf + (HALO + bins.row)) * cp + (1 + bins.col)
            flat = jnp.where(in_grid, flat, total)
            grad = scat_at(flat, c.radius)
            flags = (
                c.active.astype(jnp.int32)
                | (c.is_trigger.astype(jnp.int32) << 1)
                | (rbe.static.astype(jnp.int32) << 2)
                | (te.active & rbe.active & ~rbe.static).astype(jnp.int32) << 3
            )
            gid = jnp.arange(n, dtype=jnp.int32)
            meta = scat_at(flat, gid | (flags << 24), jnp.int32)
            maxv = scat_at(flat, rbe.max_vel)
            return flat, in_grid, grad, meta, maxv

        flat, in_grid, grad, meta, maxv = jax.lax.cond(
            expired,
            _fresh_bins,
            lambda: (
                world.solver_flat, world.solver_in_grid,
                world.solver_grad, world.solver_meta, world.solver_maxv,
            ),
        )
        return (
            flat, in_grid, grad, meta, maxv,
            scat_at(flat, te.x), scat_at(flat, te.y),
            scat_at(flat, rbe.px), scat_at(flat, rbe.py),
        )

    (
        flat, in_grid, grad, meta, maxv, gx, gy, gpx, gpy,
    ) = jax.lax.cond(pos_valid & ~expired, _fast, _rebuild)

    g_moving = ((meta >> 24) & 8) != 0
    salt = world.step_count.astype(jnp.uint32)
    interp = jax.default_backend() != "tpu"
    use_symmetric = _use_symmetric(cfg, cp)

    band, band_cells = _band_spec(cfg, geom, rows_buf, band_vel_bound, use_symmetric)

    gx, gy, gpx, gpy, g_count = _resident_substeps(
        gx, gy, gpx, gpy, grad, meta, g_moving, cfg, tr, n_tiles,
        salt, use_symmetric, interp, carry_px=True, band=band,
    )

    # readback: x/y/px/py/count to entity order — px/py riding the same
    # stacked row gather keeps entity order FULLY current (no host sync
    # machinery; snapshots/checkpoints/mutations read/write live state)
    out_flat = jnp.stack(
        [gx, gy, gpx, gpy, g_count.astype(jnp.float32)], axis=-1
    ).reshape(total, 5)
    rows = out_flat[jnp.where(in_grid, flat, 0)]
    new_x = jnp.where(in_grid, rows[:, 0], te.x)
    new_y = jnp.where(in_grid, rows[:, 1], te.y)
    new_px = jnp.where(in_grid, rows[:, 2], rbe.px)
    new_py = jnp.where(in_grid, rows[:, 3], rbe.py)
    new_count = jnp.where(in_grid, rows[:, 4].astype(jnp.int32), 0)

    # overflow entities: boundary-only fallback in entity order (as the
    # non-persistent paths)
    over = valid_e & ~in_grid
    fx, fpx = _boundary(te.x, rbe.px, c.radius, cfg.world_width, moving_e & over, ph.boundary_elasticity)
    fy, fpy = _boundary(te.y, rbe.py, c.radius, cfg.world_height, moving_e & over, ph.boundary_elasticity)
    new_x = jnp.where(over, fx, new_x)
    new_y = jnp.where(over, fy, new_y)
    new_px = jnp.where(over, fpx, new_px)
    new_py = jnp.where(over, fpy, new_py)

    # band-assumption monitor (only when banding is live): in-grid entities
    # whose post-step position drifted farther from their slot's cell than
    # the band was sized for — px/py bounce writes may have been missed for
    # them until the next rebuild. 0 in healthy runs.
    if band is not None:
        slot_col = (flat % cp - 1).astype(jnp.float32)
        slot_row = ((flat // cp) % rows_buf - HALO).astype(jnp.float32)
        lim = jnp.float32((band_cells - 1) * geom.cell_size)
        ctr_x = (slot_col + 0.5) * geom.cell_size
        ctr_y = (slot_row + 0.5) * geom.cell_size
        band_drift = jnp.sum(
            in_grid
            & ((jnp.abs(new_x - ctr_x) > lim) | (jnp.abs(new_y - ctr_y) > lim)),
            dtype=jnp.int32,
        )
    else:
        band_drift = jnp.int32(0)

    bin_step = jnp.where(expired, world.step_count, world.solver_bin_step)
    world = w_e.replace(
        transform=te.replace(x=new_x, y=new_y),
        rigid_body=rbe.replace(
            px=new_px, py=new_py, collision_count=new_count,
        ),
        solver_flat=flat,
        solver_in_grid=in_grid,
        solver_grad=grad,
        solver_meta=meta,
        solver_maxv=maxv,
        solver_x=gx,
        solver_y=gy,
        solver_px=gpx,
        solver_py=gpy,
        solver_bin_step=bin_step.astype(jnp.int32),
        solver_pos_step=(world.step_count + 1).astype(jnp.int32),
    )
    overflow = jnp.sum(over, dtype=jnp.int32)
    return world, jnp.sum(in_grid, dtype=jnp.int32), overflow, band_drift


def _resident_dims(geom: GridGeom):
    """Layout dimensions shared by the resident solver entry points:
    (rows, cols, capacity, padded_cols, tile_rows, n_tiles, rows_buf, total)."""
    from .pallas_kernels import HALO

    R, C, cap = geom.rows, geom.cols, geom.capacity
    cp = -(-(C + 2) // 128) * 128
    tr = resident_tile_rows(cap, cp)
    n_tiles = -(-R // tr)
    rows_buf = n_tiles * tr + 2 * HALO
    total = cap * rows_buf * cp
    return R, C, cap, cp, tr, n_tiles, rows_buf, total


def resident_sync_entity(world: World, cfg: EngineConfig, geom: GridGeom) -> World:
    """Pull entity-order x/y/px/py current from the resident layout — the
    DEFERRED form of resident_persistent_step's per-frame readback, used by
    the lazy-readback chunk (Engine._build_step n_steps) before any frame
    that consumes entity order. The gather and merge are identical to the
    in-step readback, so syncing after K lazy frames reproduces bit-exactly
    the entity state the eager path would have at the same step.

    Gated in-program: the layout is authoritative only when it is position-
    current (solver_pos_step == step_count) AND the bin cache was not
    host-invalidated (solver_bin_step >= 0 — Engine._apply_columns sets -1
    after entity-column writes, making ENTITY order authoritative again).
    Outside that, this is the identity. Idempotent: syncing an already-
    current world re-gathers the exact values the last readback wrote."""
    total = _resident_dims(geom)[-1]

    def _sync(w: World) -> World:
        flat, in_grid = w.solver_flat, w.solver_in_grid
        out_flat = jnp.stack(
            [w.solver_x, w.solver_y, w.solver_px, w.solver_py], axis=-1
        ).reshape(total, 4)
        rows = out_flat[jnp.where(in_grid, flat, 0)]
        t, rb = w.transform, w.rigid_body
        return w.replace(
            transform=t.replace(
                x=jnp.where(in_grid, rows[:, 0], t.x),
                y=jnp.where(in_grid, rows[:, 1], t.y),
            ),
            rigid_body=rb.replace(
                px=jnp.where(in_grid, rows[:, 2], rb.px),
                py=jnp.where(in_grid, rows[:, 3], rb.py),
            ),
        )

    authoritative = (world.solver_pos_step == world.step_count) & (
        world.solver_bin_step >= 0
    )
    return jax.lax.cond(authoritative, _sync, lambda w: w, world)


def resident_lazy_frame(
    world: World,
    cfg: EngineConfig,
    geom: GridGeom,
    inputs,
    force_specs,
    dt_ratio: float,
    pin_rows: Tuple[int, ...] = (),
    band_vel_bound: float = 0.0,
) -> World:
    """One layout-only FAST frame WITHOUT the entity-order readback — the
    lazy-readback chunk's mid-chunk body (round 4/5 lever: the readback's
    interleave stack + 1M-row gather measured ~8.9 ms of the 26.7 ms
    in-context fast path, benchmarks/probe_ablate.py; frames whose entity
    state nothing observes need not pay it).

    Runs the same layout-space tick-force + Verlet + substeps as
    resident_persistent_step's FAST branch, leaving entity-order
    x/y/px/py/vx/vy/collision_count STALE for in-grid rows —
    resident_sync_entity restores x/y/px/py bit-exactly before any
    consuming frame, and vx/vy/collision_count/speed/angle/ax/ay are
    always rewritten by that frame's own verlet_move/substeps/
    update_derived before anything reads them (the caller guarantees the
    chunk's LAST frame is a full eager frame).

    Entity-order rows NOT in the layout still evolve exactly here (they
    live only in entity order): layout-safe tick forces re-evaluated at
    their (current) entity positions, the Verlet move, and the boundary-
    only overflow fallback — the same per-frame treatment the eager path
    gives them.

    Preconditions (the caller's full/lazy routing enforces them): layout
    position-current, bins unexpired and not host-invalidated, every
    ticking class layout-safe, and no per-frame entity-order consumers in
    the step (events, particles, shadows, neighbor ticks).

    Returns (world, band_drift) — band_drift computed in layout space
    (each occupied slot's (row, lane) is its own bin), so lazy frames
    report drift violations without a readback (advisor r4)."""
    from ..behavior import eval_layout_forces

    ph = cfg.physics
    _R, _C, _cap, cp, tr, n_tiles, rows_buf, total = _resident_dims(geom)

    t, rb, c = world.transform, world.rigid_body, world.collider
    n = t.x.shape[0]
    in_grid = world.solver_in_grid
    finite = jnp.isfinite(t.x) & jnp.isfinite(t.y)
    moving = t.active & rb.active & ~rb.static
    out_mv = moving & ~in_grid  # every not-in-layout mover (incl. NaN rows)
    over = t.active & finite & ~in_grid  # the boundary-fallback set

    # --- entity-order: rows outside the layout evolve as in the eager path.
    # Tick forces: run_logic_phase's merge (tick output where class-range &
    # active, else the carried rb.ax) evaluated in entity order — layout-safe
    # ticks read only (id, x, y, inputs), all current for these rows.
    gid = jnp.arange(n, dtype=jnp.int32)
    if force_specs:
        eax, eay = eval_layout_forces(force_specs, t.x, t.y, gid, inputs, cfg)
        ticked = jnp.zeros((n,), jnp.bool_)
        for _fn, s_, c_ in force_specs:
            ticked |= (gid >= s_) & (gid < s_ + c_)
        use_t = ticked & t.active
        ax_use = jnp.where(use_t, eax, rb.ax)
        ay_use = jnp.where(use_t, eay, rb.ay)
    else:
        ax_use, ay_use = rb.ax, rb.ay

    damping = jnp.float32(ph.verlet_damping)
    gscale = jnp.float32(dt_ratio) ** 2
    grav_x, grav_y = ph.gravity
    dxe = (t.x - rb.px) * damping + gscale * grav_x + ax_use * dt_ratio
    dye = (t.y - rb.py) * damping + gscale * grav_y + ay_use * dt_ratio
    ms_e = jnp.where(rb.max_vel > 0, rb.max_vel, 100.0)
    dxe = jnp.clip(dxe, -ms_e, ms_e)
    dye = jnp.clip(dye, -ms_e, ms_e)
    ex = jnp.where(out_mv, t.x + dxe, t.x)
    ey = jnp.where(out_mv, t.y + dye, t.y)
    epx = jnp.where(out_mv, t.x, rb.px)
    epy = jnp.where(out_mv, t.y, rb.py)
    # ax consumed by the move → zeroed, so the NEXT lazy frame's non-ticked
    # movers integrate ax=0 exactly like the eager path's zeroing verlet.
    # (vx/vy/collision_count are NOT maintained here — the next full frame
    # rewrites them for every moving row before anything reads them.)
    ax_new = jnp.where(out_mv, 0.0, rb.ax)
    ay_new = jnp.where(out_mv, 0.0, rb.ay)
    elasticity = ph.boundary_elasticity
    ex, epx = _boundary(ex, epx, c.radius, cfg.world_width, moving & over, elasticity)
    ey, epy = _boundary(ey, epy, c.radius, cfg.world_height, moving & over, elasticity)

    # --- layout space: the SAME _layout_verlet as
    # resident_persistent_step._fast (advisor r4: one implementation, so a
    # FAST-branch change can't silently break the lazy chunk's bit-exactness)
    flat0, in_grid0 = world.solver_flat, world.solver_in_grid
    grad0, meta0, maxv0 = world.solver_grad, world.solver_meta, world.solver_maxv
    gx0, gy0 = _pin_layout_positions(
        world.solver_x, world.solver_y, flat0, in_grid0, ex, ey, pin_rows,
        total,
    )
    gx1, gy1, gpx1, gpy1 = _layout_verlet(
        gx0, gy0, world.solver_px, world.solver_py, meta0, maxv0, cfg,
        force_specs, inputs, dt_ratio,
    )
    mv = ((meta0 >> 24) & 8) != 0

    salt = world.step_count.astype(jnp.uint32)
    interp = jax.default_backend() != "tpu"
    use_symmetric = _use_symmetric(cfg, cp)
    band, band_cells = _band_spec(
        cfg, geom, rows_buf, band_vel_bound, use_symmetric
    )
    gx2, gy2, gpx2, gpy2, _cnt = _resident_substeps(
        gx1, gy1, gpx1, gpy1, grad0, meta0, mv, cfg, tr, n_tiles,
        salt, use_symmetric, interp, carry_px=True, band=band,
    )

    # band-assumption monitor IN LAYOUT SPACE (advisor r4: mid-chunk drift
    # followed by a rebin before the chunk's final full frame erased the
    # evidence when only full frames reported it): each occupied moving
    # slot's own (row, lane) IS its bin, so the drift check needs no
    # entity-order readback — pure elementwise over the layout.
    if band is not None:
        from .pallas_kernels import HALO as _H

        lane = jax.lax.broadcasted_iota(jnp.int32, gx2.shape, 2)
        row = jax.lax.broadcasted_iota(jnp.int32, gx2.shape, 1)
        cell = jnp.float32(geom.cell_size)
        ctr_x = (lane.astype(jnp.float32) - 0.5) * cell  # lane-1 cell center
        ctr_y = (row.astype(jnp.float32) - _H + 0.5) * cell
        lim = jnp.float32((band_cells - 1) * geom.cell_size)
        band_drift = jnp.sum(
            mv & (
                (jnp.abs(gx2 - ctr_x) > lim) | (jnp.abs(gy2 - ctr_y) > lim)
            ),
            dtype=jnp.int32,
        )
    else:
        band_drift = jnp.int32(0)

    return world.replace(
        transform=t.replace(x=ex, y=ey),
        rigid_body=rb.replace(px=epx, py=epy, ax=ax_new, ay=ay_new),
        solver_x=gx2,
        solver_y=gy2,
        solver_px=gpx2,
        solver_py=gpy2,
        solver_pos_step=(world.step_count + 1).astype(jnp.int32),
        step_count=world.step_count + 1,
    ), band_drift
