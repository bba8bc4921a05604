"""POSITION-HOMED spatial-domain multi-chip step (round 4): entity home
follows its world slab, so steady-state frames route only boundary-crossing
MOVERS instead of every entity.

The index-homed step (parallel/halo.py) keeps each entity at a fixed
device/slot and routes its FULL packed component row to the slab owner and
back EVERY frame (two all_to_alls of ~40 int32 lanes x N rows for the logic
phase alone) — measured +65-72% total work over single-device at 4-8 slabs
on the 102k-boids artifact (HALO_SCALING_BOIDS_r03.json). Here instead:

 - each device OWNS the entities currently inside its slab (a contiguous
   block of spatial-grid rows, exactly phase A's banding in halo.py): its
   chunk is a dense, GID-SORTED table of component rows ([n_cap] slots,
   gid lane -1 = free);
 - phase A (neighbor tables + ticks) runs entirely on local rows — the
   slab's table is built from residents it already holds, halo table rows
   arrive by ppermute exactly as before (slab bands align to spatial grid
   rows, so every table row is single-owner), and NO entity row crosses
   the interconnect;
 - phase B (solver) still routes its 8-channel solver rows by post-move
   position (the one phase whose binning can cross the band by a frame's
   movement), but the received rows are re-sorted by gid so within-cell
   slot order — and therefore every fp accumulation — matches the
   single-device step bit-for-bit;
 - at frame end, entities whose FINAL position crossed a band boundary
   MIGRATE: a quota-limited all_to_all of just the movers (typically a few
   % of N), after which each chunk re-sorts to gid order. Ungranted movers
   (destination chunk full / per-pair route cap) stay home as VIOLATORS —
   out-of-band residents that degrade exactly like route-overflow rows in
   the index-homed step (no neighbor list, boundary-only solver via the
   phase-B route which still works from any position) and retry next
   frame; `home_violators` surfaces them.

Gid-sorted chunks are the linchpin of bit-exactness: the single-device
step's within-cell insertion order is ascending entity index, and a stable
cell-sort over a gid-sorted chunk reproduces it for every fully-owned table
row; phase B restores it globally with one small sort of the routed rows.

Scope (v2, round 5): the FULL mixed feature set — ticks (neighbor-consuming
and local), XLA grid + Pallas solver, device-side despawns, particles/
emissions replicated as in halo.py, AND the three passes that kept mixed
scenes on the index-homed step in v1 (each the same per-slab pass as
halo.py, driven from the gid-sorted chunks):
 - collision events: per-chunk hook-scoped pair recording with global gids
   → all_gather + rank-compaction into the replicated pair table → the
   same device-side Enter/Stay/Exit diff as the single-chip step;
 - shadow sprites: global first-L light selection by gid order, sprites
   computed on the light's OWNING chunk (its neighbor list lives there),
   psum-composed output;
 - decal stamping: replicated particle pool → device-identical stamp
   batches into the replicated tile canvas.
Violator rows (out-of-band residents awaiting migration retry) degrade for
those passes exactly as they do for neighbor ticks: no neighbor list, so no
recorded pairs / no shadow contribution until they migrate home (0 frames
in healthy runs — `home_violators`).

Host control plane: chunks are placed once (`place_fn`); host-side spawns /
despawns DURING the run insert into / clear from the owning band's chunk
via the returned control object (round 5 — no re-placement; the same
gid-sorted merge the migration path uses), matching the reference's spawn
fan-out as a live control-plane event (gameEngine.js:1651-1670). Full
re-placement remains the fallback when an insert is denied (band chunk
full).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..behavior import run_logic_phase_masked
from ..state import World
from ..ops.spatial import (
    GridGeom,
    NeighborLists,
    NeighborPayload,
    _cap_first_k,
    bin_entities,
)
from ..ops.physics_grid import (
    _boundary,
    run_solver_substeps,
    scatter_solver_grid,
)
from .halo import (
    _ENTITY_COMPONENTS,
    _edge_perms,
    _merge_emissions,
    entity_leaf_specs,
    pack_world_rows,
    route_capacity,
    unpack_world_rows,
)


def _resize_entity_leaves(world: World, rows: int) -> World:
    """Zeroed copy of ``world`` with every PER-ENTITY component leaf given a
    ``rows``-long leading axis. Selection is BY COMPONENT NAME (the same
    sets halo_world_specs shards), never by shape: a shape test would
    misclassify equal-length non-entity leaves — e.g. a particle pool with
    max_particles == n_entities — and silently zero them through a
    place/unplace round trip."""

    def expand(comp):
        return jax.tree.map(
            lambda leaf: jnp.zeros((rows,) + leaf.shape[1:], leaf.dtype),
            comp,
        )

    ent = {name: expand(getattr(world, name)) for name in _ENTITY_COMPONENTS}
    ent["custom"] = {k: expand(v) for k, v in world.custom.items()}
    return world.replace(**ent)

_I32_MAX = np.int32(2**31 - 1)


def make_homed_step(engine, mesh: Mesh, headroom: float = 2.0,
                    mig_oversub: float = 1.0, adjacent_frac: float = None,
                    check_vma: bool = None):
    """Build the position-homed sharded step for an initialized engine.

    Returns (step_fn, place_fn, unplace_fn, ctl):
      - ``place_fn(world) -> (world_chunks, gid)`` assigns every entity to
        the device owning its CURRENT position's slab and lays chunks out
        over the mesh (gid-sorted, [D*n_cap] leading axis);
      - ``step_fn(world_chunks, gid, inputs) -> (world_chunks, gid,
        metrics)`` — jitted, donated;
      - ``unplace_fn(world_chunks, gid) -> world`` reassembles the
        entity-ordered single-device world (host-side numpy; snapshots /
        parity tests);
      - ``ctl`` — live host spawn/despawn without re-placement:
        ``ctl.pack_rows(world, gids)``, ``ctl.insert(chunks, gid, rows,
        gids)``, ``ctl.remove(chunks, gid, gids)``.

    ``headroom``: chunk slots per device = ceil(N/D * headroom) — the load
    imbalance the layout absorbs before movers start bouncing (violators).
    Phase A's table/candidate shapes scale with it: use ~1.25 for
    uniform-density scenes, more for piling ones.
    ``mig_oversub``: migration route slots per (source, dest) pair =
    route_capacity(n_cap, D, mig_oversub).
    ``adjacent_frac``: phase B's per-direction adjacent-exchange block =
    ceil(n_cap * adjacent_frac) rows — the fraction of a chunk that may
    need the NEIGHBOR slab's solver band in one frame (band-boundary
    straddle + one frame's movement). Default ``None`` derives it from the
    seam geometry: solver bands align to the spatial seams (round 5), so
    the strip that can route is cell_s/2 rounding residue + one frame's
    max_vel, sized at 2x uniform density. 1.0 guarantees capacity for any
    clustering.
    """
    engine._require_init()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    world0 = engine.world
    n = world0.n_entities

    cfg = engine._resolve_spatial()
    if cfg.spatial.method != "grid":
        raise ValueError("homed step requires spatial.method='grid'")
    if check_vma is None:
        check_vma = cfg.physics.solver != "pallas"
    # mixed-scene passes (v2): the same per-slab event / shadow / decal
    # passes as make_halo_step, driven from the gid-sorted chunks
    ev_on = cfg.logic.collision_events
    hooked_types = tuple(
        reg.entity_type
        for reg in engine.classes.values()
        if reg.count > 0 and engine._class_has_hooks(reg.cls)
    )
    ev_scope_hooked = (
        ev_on and not cfg.logic.record_all_pairs and bool(hooked_types)
    )
    max_pairs = cfg.physics.max_collision_pairs
    p_loc = max_pairs  # per-chunk pair-table slots
    shadows_on = cfg.lighting.enabled and cfg.lighting.shadows_enabled
    decals_on = cfg.particle.max_particles > 0 and cfg.particle.decals
    if decals_on:
        from ..ops.decals import default_decal_textures

        decal_textures = default_decal_textures(len(engine.sprites.textures))
    else:
        decal_textures = None
    cfg, solver_geom, forced = engine._solver_plan(cfg)
    if solver_geom is None or forced:
        raise ValueError("homed step could not derive a solver geometry")
    if cfg.physics.solver == "neighbors":
        raise ValueError("homed step requires the grid constraint solver")

    has_particles = cfg.particle.max_particles > 0
    emit_budget = cfg.particle.max_emit_per_step if has_particles else 0
    payload_channels, extra_paths = engine._payload_plan(cfg)
    if shadows_on:
        # caster data rides the candidate table (halo.py's channels)
        payload_channels = dict(payload_channels)
        extra_paths = list(extra_paths)
        for p in ("__shadow__", "shadow.height"):
            if p not in payload_channels:
                payload_channels[p] = 3 + len(extra_paths)
                extra_paths.append(p)
    type_specs = tuple(
        (reg.cls, reg.entity_type)
        for reg in engine.classes.values()
        if reg.count > 0 and getattr(reg.cls, "tick", None) is not None
    )
    need_neighbors = (
        ev_on
        or shadows_on  # lights walk their neighbor lists
        or any(
            reg.count > 0
            and getattr(reg.cls, "tick", None) is not None
            and reg.cls.uses_neighbors
            for reg in engine.classes.values()
        )
    )
    frame_counts = engine._frame_counts()
    specs = entity_leaf_specs(world0)
    n_lanes = len(specs)

    # --- slab geometry: bands of spatial-grid rows (phase A alignment) ---
    sp = cfg.spatial
    rows_g, cols_g = cfg.grid_rows, cfg.grid_cols
    hw = max(1, sp.max_cell_radius)
    rpd = math.ceil(rows_g / n_dev)  # spatial rows per band
    if need_neighbors and hw > rpd:
        raise ValueError(
            f"spatial halo width {hw} exceeds rows-per-slab {rpd}"
        )
    rows_loc = rpd + 2 * hw
    cells_loc = rows_loc * cols_g
    geom_sp_loc = GridGeom(
        cell_size=sp.cell_size, rows=rows_loc, cols=cols_g,
        capacity=sp.cell_capacity,
    )
    R_s, C_s, cap_s = solver_geom.rows, solver_geom.cols, solver_geom.capacity
    # --- phase-B solver-band ownership ALIGNED to the spatial seams (r5) ---
    # With independent quantization (dest = grow // ceil(R_s/D)) the solver
    # seam drifts from the spatial seam by up to D*(rpd*cell_sp - rps*cell_s)
    # px — at the 102k-boids artifact geometry nearly half of slab 6's
    # residents landed in slab 7's solver band, which is why adjacent_frac
    # needed hand-tuning to 0.45 at 8 slabs (HALO_SCALING_BOIDS_r04 header).
    # Placing each band boundary on the solver row NEAREST its spatial seam
    # bounds the routed strip by cell_s/2 + one frame's movement, independent
    # of D. Bands then differ in length by ±1 row: local grids pad to the
    # longest and the last-row halo index becomes per-device (dynamic).
    seam_rows = [0]
    for dd in range(1, n_dev):
        raw = int(round(dd * rpd * sp.cell_size / solver_geom.cell_size))
        seam_rows.append(min(max(raw, seam_rows[-1] + 1), R_s - (n_dev - dd)))
    seam_rows.append(R_s)
    if any(b <= a for a, b in zip(seam_rows, seam_rows[1:])):
        raise ValueError(
            f"solver grid has too few rows ({R_s}) for {n_dev} slabs"
        )
    band_len = [b - a for a, b in zip(seam_rows, seam_rows[1:])]
    rps = max(band_len)
    geom_s_loc = GridGeom(
        cell_size=solver_geom.cell_size, rows=rps, cols=C_s, capacity=cap_s
    )
    _sr_lo = jnp.asarray(seam_rows[:n_dev], jnp.int32)  # [D] band start row
    _s_len = jnp.asarray(band_len, jnp.int32)  # [D] band interior rows
    _s_bounds = jnp.asarray(seam_rows[1:n_dev], jnp.int32)  # [D-1] boundaries

    n_cap = int(((math.ceil(n / n_dev * headroom)) + 7) // 8 * 8)
    m_mig = route_capacity(n_cap, n_dev, mig_oversub)
    # phase B adjacent-exchange block (see phase_b): one fixed [cap_pb, 8]
    # buffer per direction — NO D-scaling (ppermute, not all_to_all)
    if adjacent_frac is None:
        # seam-geometry auto capacity (round 5): a row lands in the adjacent
        # band only from the strip of seam-rounding residue (cell_s/2) plus
        # one frame's Verlet movement (per-axis max_vel clamp — taken from
        # the spawned world's actual per-entity values, not the engine
        # default) on each side of the seam; size for 2x uniform density.
        # Faster later host-spawned entities can exceed the strip: their
        # rows degrade to boundary-only for the frame (`route_overflow`
        # metrics) and migrate home normally.
        _vel = np.asarray(world0.rigid_body.max_vel, np.float32)
        _act = np.asarray(world0.transform.active, bool)
        vel_bound = float(_vel[_act].max()) if _act.any() else float(_vel.max())
        vel_bound = max(vel_bound, 1.0)
        strip = 0.5 * solver_geom.cell_size + vel_bound
        frac = min(2.0 * strip / (rpd * sp.cell_size), 1.0)
        cap_pb = int(min(max((math.ceil(n_cap * frac) + 7) // 8 * 8, 64),
                         n_cap))
    else:
        cap_pb = int(min(max((math.ceil(n_cap * adjacent_frac) + 7) // 8 * 8,
                             8), n_cap))
    down_perm, up_perm = _edge_perms(n_dev)
    inv_sp = 1.0 / sp.cell_size
    inv_s = 1.0 / solver_geom.cell_size
    f32 = jnp.float32

    def band_of_y(y):
        grow = jnp.clip((y * inv_sp).astype(jnp.int32), 0, rows_g - 1)
        return jnp.minimum(grow // rpd, n_dev - 1)

    # ------------------------------------------------------------------
    # phase A: local neighbor tables + ticks (NO entity routing)
    # ------------------------------------------------------------------
    def phase_a(local: World, gid, inputs, d):
        lt = local.transform
        res_fin = jnp.isfinite(lt.x) & jnp.isfinite(lt.y)
        in_band = band_of_y(lt.y) == d
        # violators (out-of-band residents, see module docs) degrade like
        # route-overflow rows: excluded from the table and neighbor lists
        valid_ent = lt.active & res_fin & (gid >= 0) & in_band
        violators = jnp.sum(
            lt.active & (gid >= 0) & res_fin & ~in_band, dtype=jnp.int32
        )

        def hooked_mask(types):
            m = jnp.zeros_like(lt.active)
            for et in types:
                m |= lt.entity_type == jnp.int32(et)
            return m

        grow_r = jnp.clip((lt.y * inv_sp).astype(jnp.int32), 0, rows_g - 1)
        gcol_r = jnp.clip((lt.x * inv_sp).astype(jnp.int32), 0, cols_g - 1)
        loc_row = jnp.clip(grow_r - d * rpd + hw, 0, rows_loc - 1)
        from ..behavior import read_field

        extras = []
        for p in extra_paths:
            if p == "__collision__":
                # packed events channel — same encoding as the single-chip
                # step and make_halo_step (engine._build_step)
                c_ = local.collider
                enc = c_.radius
                if ev_scope_hooked:
                    enc = jnp.where(hooked_mask(hooked_types), enc, -enc - 1.0)
                extras.append(jnp.where(c_.active, enc, jnp.float32(-3.0e38)))
            elif p == "__shadow__":
                sh_, sp_l = local.shadow, local.sprite
                ok_c = sh_.active & sp_l.is_on_screen
                extras.append(
                    jnp.where(ok_c, sh_.shadow_radius, jnp.float32(-1.0))
                )
            else:
                extras.append(jnp.asarray(read_field(local, p), f32))
        rows_vals = jnp.stack(
            [gid.astype(f32), lt.x, lt.y] + extras, axis=1
        )
        bins = bin_entities(
            lt.x, lt.y, valid_ent, geom_sp_loc, table_values=rows_vals,
            row=loc_row, col=gcol_r,
        )

        # halo: boundary table-row blocks from the slab neighbors — bands
        # align to spatial rows, so every row is single-owner (halo.py
        # phase A's exchange, unchanged)
        n_ch = rows_vals.shape[1]
        body = bins.table[:cells_loc].reshape(
            rows_loc, cols_g, sp.cell_capacity, n_ch
        )
        from_up = jax.lax.ppermute(body[rpd : rpd + hw], axis, down_perm)
        from_dn = jax.lax.ppermute(body[hw : 2 * hw], axis, up_perm)
        body = body.at[0:hw].set(from_up)
        body = body.at[hw + rpd : 2 * hw + rpd].set(from_dn)
        table = jnp.concatenate(
            [body.reshape(cells_loc, sp.cell_capacity, n_ch),
             bins.table[cells_loc:]],
            axis=0,
        )

        offs = jnp.arange(-hw, hw + 1, dtype=jnp.int32)
        off_r = jnp.repeat(offs, 2 * hw + 1)
        off_c = jnp.tile(offs, 2 * hw + 1)
        cand_grow = grow_r[:, None] + off_r[None, :]
        cand_gcol = gcol_r[:, None] + off_c[None, :]
        in_b = (
            (cand_grow >= 0) & (cand_grow < rows_g)
            & (cand_gcol >= 0) & (cand_gcol < cols_g)
        )
        cand_lrow = cand_grow - d * rpd + hw
        cand_cell = jnp.where(in_b, cand_lrow * cols_g + cand_gcol, cells_loc)
        flat = table[cand_cell].reshape(lt.x.shape[0], -1, n_ch)
        cand = flat[..., 0].astype(jnp.int32)
        dx = flat[..., 1] - lt.x[:, None]
        dy = flat[..., 2] - lt.y[:, None]
        d2 = dx * dx + dy * dy
        vr2 = (local.collider.visual_range ** 2)[:, None]
        ok = (
            (cand >= 0)
            & (cand != gid[:, None])
            & (d2 < vr2)
            & (d2 > 0)
            & valid_ent[:, None]
        )
        ids, d2_out, count = _cap_first_k(cand, d2, ok, sp.max_neighbors)
        nbr = NeighborLists(
            ids=ids, d2=d2_out, count=count, n_binned=bins.n_binned,
            payload=NeighborPayload(data=flat),
        )

        # undeclared-path ctx.gather: all_gather field + gid, scatter into
        # entity order — device-identical (replicated) by construction
        def gather_fn(path):
            vals = jax.lax.all_gather(
                jnp.asarray(read_field(local, path)), axis
            ).reshape(-1)
            gids_all = jax.lax.all_gather(gid, axis).reshape(-1)
            safe = jnp.where(gids_all >= 0, gids_all, n)
            return (
                jnp.zeros((n + 1,), vals.dtype)
                .at[safe].set(vals, mode="drop")[:n]
            )

        local, emissions = run_logic_phase_masked(
            local, nbr, inputs, cfg, type_specs, payload_channels,
            gather_fn=gather_fn,
        )

        # collision-pair recording on the chunk's in-band residents (the
        # per-slab pass of make_halo_step phase_a, gids already global).
        # Violators have all-(-1) neighbor lists and no table row, so their
        # pairs drop until they migrate home (degradation documented above).
        ev = None
        if ev_on:
            from ..ops.physics import compact_pairs

            lt2, lc2 = local.transform, local.collider
            ch = flat[..., payload_channels["__collision__"]]
            coll_j = ch > jnp.float32(-1.0e30)
            self_ok = lt2.active & lc2.active & res_fin & (gid >= 0)
            if ev_scope_hooked:
                hooked_j = ch >= 0
                r_j = jnp.where(hooked_j, ch, -ch - 1.0)
                okp = (
                    (self_ok & hooked_mask(hooked_types))[:, None]
                    & (ids >= 0) & coll_j
                )
                once = jnp.where(hooked_j, ids > gid[:, None], True)
            else:
                r_j = ch
                okp = self_ok[:, None] & (ids >= 0) & coll_j
                once = ids > gid[:, None]
            min_d = lc2.radius[:, None] + r_j
            rec = okp & (d2_out < min_d * min_d) & once
            ev = compact_pairs(ids, rec, p_loc, row_ids=gid)

        sh_out = None
        if shadows_on:
            from .halo import _slab_shadow_sprites

            sh_out = _slab_shadow_sprites(
                local, nbr, flat, gid, valid_ent, payload_channels,
                cfg, axis,
            )
        return local, bins.n_binned, violators, (emissions, gid), ev, sh_out

    def phase_a_local(local: World, gid, inputs, d):
        m = local.transform.x.shape[0]
        empty = NeighborLists(
            ids=jnp.full((m, 1), -1, jnp.int32),
            d2=jnp.zeros((m, 1), f32),
            count=jnp.zeros((m,), jnp.int32),
            n_binned=jnp.int32(-1),
            payload=NeighborPayload(data=jnp.zeros((m, 1, 0), f32)),
        )
        from ..behavior import read_field

        def gather_fn(path, local=local):
            vals = jax.lax.all_gather(
                jnp.asarray(read_field(local, path)), axis
            ).reshape(-1)
            gids_all = jax.lax.all_gather(gid, axis).reshape(-1)
            safe = jnp.where(gids_all >= 0, gids_all, n)
            return (
                jnp.zeros((n + 1,), vals.dtype)
                .at[safe].set(vals, mode="drop")[:n]
            )

        local, emissions = run_logic_phase_masked(
            local, empty, inputs, cfg, type_specs, payload_channels,
            gather_fn=gather_fn,
        )
        lt = local.transform
        in_band = band_of_y(lt.y) == d
        violators = jnp.sum(
            lt.active & (gid >= 0)
            & jnp.isfinite(lt.y) & ~in_band, dtype=jnp.int32
        )
        return local, jnp.int32(-1), violators, (emissions, gid), None, None

    # ------------------------------------------------------------------
    # phase B: solver — routed 8-channel rows, GID-SORTED on arrival so
    # within-cell order matches the single-device step exactly
    # ------------------------------------------------------------------
    def phase_b(local: World, gid, d):
        """Solver phase, homed: residents' solver rows are (nearly) all
        LOCAL — only rows whose post-move solver band is the ADJACENT slab
        (band-boundary straddle + this frame's movement) exchange via two
        ppermutes of a small fixed block. No all_to_all: in a
        position-homed layout the all_to_all self-pair would have to carry
        the whole chunk (clustered scenes overflow any per-pair capacity
        short of n_cap), while adjacent traffic is bounded by crossers.
        Rows landing beyond d±1 in one frame degrade to boundary-only
        (counted) and migrate properly at frame end.

        The combined row set (locals in chunk order + up/down arrivals)
        enters binning in global gid order — via a sorted MERGE, since the
        chunk itself is gid-sorted — so within-cell slot order, and every
        fp accumulation, matches the single-device step exactly."""
        from ..ops.physics_grid import pack_solver_rows

        t, rb, c = local.transform, local.rigid_body, local.collider
        finite = jnp.isfinite(t.x) & jnp.isfinite(t.y)
        valid = t.active & finite & (gid >= 0)
        packed = pack_solver_rows(local, gid=jnp.maximum(gid, 0))
        packed = packed.at[:, 7].set(valid.astype(f32))  # occupancy lane
        grow = jnp.clip((t.y * inv_s).astype(jnp.int32), 0, R_s - 1)
        # owner of a solver row, from the seam-aligned band table
        dest = jnp.sum(
            grow[:, None] >= _s_bounds[None, :], axis=1, dtype=jnp.int32
        )

        is_loc = valid & (dest == d)
        to_up = valid & (dest == d - 1)
        to_dn = valid & (dest == d + 1)

        def stage(mask):
            # rank in row order (= gid order: chunks are gid-sorted)
            rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
            ok = mask & (rank < cap_pb)
            slot = jnp.where(ok, rank, cap_pb)
            buf = (
                jnp.zeros((cap_pb, 8), f32)
                .at[slot].set(packed, mode="drop")
            )
            return buf, jnp.where(ok, slot, -1), jnp.sum(mask & ~ok, dtype=jnp.int32)

        buf_up, slot_up, _ovf_u = stage(to_up)
        buf_dn, slot_dn, _ovf_d = stage(to_dn)
        # my to_up block goes to d-1 (up_perm); I receive d+1's to_up block
        from_above = jax.lax.ppermute(buf_up, axis, up_perm)
        from_below = jax.lax.ppermute(buf_dn, axis, down_perm)

        # --- merged gid order WITHOUT a full-size sort (round 5) --- the
        # chunk is gid-sorted, so the valid local rows are already an
        # ascending-gid subsequence; only the two small arrival blocks sort.
        # Merge positions come from two searchsorteds (gids are globally
        # unique, so no cross-sequence ties exist), replacing the old
        # argsort over all [n_cap + 2*cap_pb] rows — the binning sort below
        # is then the phase's ONLY full-size sort.
        arr = jnp.concatenate([from_above, from_below], axis=0)
        arr_n = 2 * cap_pb
        arr_valid = arr[:, 7] > 0
        arr_key = jnp.where(arr_valid, arr[:, 6].astype(jnp.int32), _I32_MAX)
        arr_order = jnp.argsort(arr_key).astype(jnp.int32)
        arr_sorted = arr[arr_order]
        arr_key_s = arr_key[arr_order]
        arr_valid_s = arr_valid[arr_order]

        loc_key = jnp.where(is_loc, gid, _I32_MAX)
        loc_rank = jnp.cumsum(is_loc.astype(jnp.int32)) - 1
        # dense sorted array of the valid local gids (tail = MAX) so the
        # arrivals' searchsorted sees no invalid-row gaps
        loc_compact = (
            jnp.full((n_cap,), _I32_MAX, jnp.int32)
            .at[jnp.where(is_loc, loc_rank, n_cap)]
            .set(loc_key, mode="drop")
        )
        M = n_cap + arr_n
        pos_loc = loc_rank + jnp.searchsorted(
            arr_key_s, loc_key
        ).astype(jnp.int32)
        pos_arr = jnp.arange(arr_n, dtype=jnp.int32) + jnp.searchsorted(
            loc_compact, arr_key_s
        ).astype(jnp.int32)
        res = jnp.zeros((M, 8), f32)
        res = res.at[jnp.where(is_loc, pos_loc, M)].set(packed, mode="drop")
        res = res.at[jnp.where(arr_valid_s, pos_arr, M)].set(
            arr_sorted, mode="drop"
        )
        res_valid = res[:, 7] > 0

        rx, ry = res[:, 0], res[:, 1]
        grow_r = jnp.clip((ry * inv_s).astype(jnp.int32), 0, R_s - 1)
        gcol_r = jnp.clip((rx * inv_s).astype(jnp.int32), 0, C_s - 1)
        lrow = jnp.clip(grow_r - _sr_lo[d], 0, rps - 1)
        bins = bin_entities(
            rx, ry, res_valid, geom_s_loc, build_table=False,
            row=lrow, col=gcol_r,
        )
        flat_cells = (rps + 2) * (C_s + 2) * cap_s
        in_grid = res_valid & (bins.rank < cap_s)
        flat_idx = ((bins.row + 1) * (C_s + 2) + (bins.col + 1)) * cap_s + bins.rank
        flat_idx = jnp.where(in_grid, flat_idx, flat_cells)
        grid = scatter_solver_grid(res, flat_idx, rps, C_s, cap_s)

        # bands vary in length (seam alignment): the last interior row is
        # len_d, so the below-halo lands at len_d + 1 (dynamic index). Rows
        # past it stay empty; the halo row now sits INSIDE the static
        # interior window, where the solver redundantly computes (and
        # discards) its displacement — owned rows' pair sums are unaffected.
        len_d = _s_len[d]

        def fill_border(g):
            fu = jax.lax.ppermute(
                jax.lax.dynamic_slice_in_dim(g, len_d, 1, axis=0),
                axis, down_perm,
            )
            fd = jax.lax.ppermute(g[1:2], axis, up_perm)
            g = g.at[0:1].set(fu)
            return jax.lax.dynamic_update_slice_in_dim(g, fd, len_d + 1, 0)

        grid = fill_border(grid)

        def halo_xy(gx, gy):
            st = jnp.stack([gx, gy], axis=0)
            fu = jax.lax.ppermute(
                jax.lax.dynamic_slice_in_dim(st, len_d, 1, axis=1),
                axis, down_perm,
            )
            fd = jax.lax.ppermute(st[:, 1:2], axis, up_perm)
            st = st.at[:, 0:1].set(fu)
            st = jax.lax.dynamic_update_slice_in_dim(st, fd, len_d + 1, 1)
            return st[0], st[1]

        gx, gy, gpx, gpy, gcnt = run_solver_substeps(
            grid, geom_s_loc, cfg, local.step_count.astype(jnp.uint32),
            halo_xy=halo_xy, shard_hints=False,
        )

        out_flat = jnp.stack([gx, gy, gpx, gpy], axis=-1).reshape(flat_cells, 4)
        cnt_flat = gcnt.reshape(flat_cells)
        safe_idx = jnp.where(in_grid, flat_idx, 0)
        out_rows = jnp.concatenate(
            [
                out_flat[safe_idx],
                cnt_flat[safe_idx][:, None].astype(f32),
                in_grid.astype(f32)[:, None],
            ],
            axis=1,
        )  # merged (res) order

        # locals read their merged slot directly; arrivals un-sort through
        # the small block sort's permutation, then return to their senders
        loc_out = out_rows[jnp.where(is_loc, pos_loc, 0)]
        arr_out_s = jnp.where(
            arr_valid_s[:, None],
            out_rows[jnp.where(arr_valid_s, pos_arr, 0)],
            0.0,
        )
        arr_out = (
            jnp.zeros((arr_n, out_rows.shape[1]), f32)
            .at[arr_order]
            .set(arr_out_s)
        )
        ret_above = arr_out[:cap_pb]
        ret_below = arr_out[cap_pb:]
        # return the processed blocks to their senders (reverse ppermutes)
        back_up = jax.lax.ppermute(ret_above, axis, down_perm)
        back_dn = jax.lax.ppermute(ret_below, axis, up_perm)
        got_up = back_up[jnp.maximum(slot_up, 0)]
        got_dn = back_dn[jnp.maximum(slot_dn, 0)]

        def pick(sent_mask, slot_arr, got):
            ok = sent_mask & (slot_arr >= 0) & (got[:, 5] > 0)
            return ok, got

        ok_loc = is_loc & (loc_out[:, 5] > 0)
        ok_up, up_vals = pick(to_up, slot_up, got_up)
        ok_dn, dn_vals = pick(to_dn, slot_dn, got_dn)
        solved = ok_loc | ok_up | ok_dn

        def ch(k):
            v = jnp.where(ok_up[:, None], up_vals, loc_out)
            v = jnp.where(ok_dn[:, None], dn_vals, v)
            return v[:, k]

        moving = t.active & rb.active & ~rb.static
        new_x = jnp.where(solved, ch(0), t.x)
        new_y = jnp.where(solved, ch(1), t.y)
        new_px = jnp.where(solved, ch(2), rb.px)
        new_py = jnp.where(solved, ch(3), rb.py)
        new_cc = jnp.where(solved, ch(4).astype(jnp.int32), 0)

        over = valid & ~solved
        ph = cfg.physics
        fx, fpx = _boundary(t.x, rb.px, c.radius, cfg.world_width, moving & over, ph.boundary_elasticity)
        fy, fpy = _boundary(t.y, rb.py, c.radius, cfg.world_height, moving & over, ph.boundary_elasticity)
        new_x = jnp.where(over, fx, new_x)
        new_y = jnp.where(over, fy, new_y)
        new_px = jnp.where(over, fpx, new_px)
        new_py = jnp.where(over, fpy, new_py)

        local = local.replace(
            transform=t.replace(x=new_x, y=new_y),
            rigid_body=rb.replace(px=new_px, py=new_py, collision_count=new_cc),
        )
        # every degraded row counts exactly once: far jumps, exchange-block
        # overflow AND local cell-capacity overflow all land in `over`
        # (the single-device solver_overflow degradation class)
        return local, jnp.sum(solved, dtype=jnp.int32), jnp.sum(
            over, dtype=jnp.int32
        )

    def migrate(local: World, gid, d):
        t = local.transform
        occupied = gid >= 0
        finite = jnp.isfinite(t.y)
        dest = jnp.where(occupied & t.active & finite, band_of_y(t.y), d)
        wants_out = occupied & t.active & (dest != d)

        # demand matrix [D, D] (replicated): my per-dest mover counts,
        # all_gathered; prefix-grant per dest against free capacity so no
        # destination chunk can overflow (deterministic on every device).
        # Capacity counts ALL currently occupied rows as staying — a mover
        # whose own grant is denied stays too, so subtracting only
        # non-movers could admit arrivals past n_cap and the merge sort
        # would silently drop entities (round-4 review finding)
        onehot = (
            (dest[:, None] == jnp.arange(n_dev, dtype=jnp.int32)[None, :])
            & wants_out[:, None]
        )
        my_demand = jnp.sum(onehot, axis=0, dtype=jnp.int32)  # [D]
        demand = jax.lax.all_gather(my_demand, axis)  # [D(src), D(dst)]
        demand = jnp.minimum(demand, m_mig)  # per-pair route cap
        occ_counts = jax.lax.all_gather(
            jnp.sum(occupied, dtype=jnp.int32), axis
        )  # [D]
        free = jnp.maximum(n_cap - occ_counts, 0)  # [D(dst)]
        used_before = jnp.cumsum(demand, axis=0) - demand  # prefix per dst
        grant = jnp.clip(free[None, :] - used_before, 0, demand)  # [D, D]
        my_grant = grant[d]  # [D] — how many I may send per dest

        # rank my movers per destination (gid order within dest — chunk is
        # gid-sorted, so row order IS gid order) and keep the granted prefix
        from .halo import _rank_within_dest

        rank = _rank_within_dest(dest, wants_out, n_dev)
        send_ok = wants_out & (rank < my_grant[dest])
        ungranted = jnp.sum(wants_out & ~send_ok, dtype=jnp.int32)

        # gid lane biased +1 so an empty (all-zero) send slot decodes to
        # gid -1 after finish_migration's -1, never aliasing entity 0
        rows = jnp.concatenate(
            [pack_world_rows(local, specs), (gid + 1)[:, None]], axis=1
        )
        slot = jnp.where(send_ok, dest * m_mig + rank, n_dev * m_mig)
        send = (
            jnp.zeros((n_dev * m_mig, rows.shape[1]), rows.dtype)
            .at[slot].set(rows, mode="drop")
        )
        recv = jax.lax.all_to_all(
            send.reshape(n_dev, m_mig, rows.shape[1]), axis, 0, 0
        ).reshape(n_dev * m_mig, rows.shape[1])
        return recv, send_ok, ungranted, rows

    def finish_migration(local: World, gid, recv, send_ok, rows):
        # merge: my stays + arrivals, gid-sorted into n_cap slots
        my_rows = rows[:, :n_lanes]
        my_gid = jnp.where(send_ok, -1, gid)  # departures free their slot
        arr_rows = recv[:, :n_lanes]
        arr_gid = recv[:, n_lanes] - 1  # biased +1 on send; empty slots -> -1
        all_rows = jnp.concatenate([my_rows, arr_rows], axis=0)
        all_gid = jnp.concatenate([my_gid, arr_gid], axis=0)
        key = jnp.where(all_gid >= 0, all_gid, _I32_MAX)
        order = jnp.argsort(key)[:n_cap]
        new_rows = all_rows[order]
        new_gid = jnp.where(key[order] < _I32_MAX, all_gid[order], -1)
        # zero out freed slots so inactive lanes (active flags) read False
        new_rows = jnp.where(new_gid[:, None] >= 0, new_rows, 0)
        local = unpack_world_rows(new_rows, local, specs)
        return local, new_gid

    # ------------------------------------------------------------------
    # the whole step per device
    # ------------------------------------------------------------------
    from ..ops.culling import update_entity_visibility
    from ..ops.physics import update_derived, verlet_move
    from ..render.extract import advance_animation

    def local_step(chunk: World, gid, inputs):
        d = jax.lax.axis_index(axis).astype(jnp.int32)
        # per-step input write, by GID (entity 0 = mouse lives on whichever
        # device owns its band; Mouse.js:30-104 semantics)
        t0_, m0_ = chunk.transform, chunk.mouse
        is_mouse = gid == 0
        chunk = chunk.replace(
            transform=t0_.replace(
                x=jnp.where(is_mouse, inputs.mouse_x, t0_.x),
                y=jnp.where(is_mouse, inputs.mouse_y, t0_.y),
            ),
            mouse=m0_.replace(
                button0_down=jnp.where(is_mouse, inputs.mouse_buttons[0], m0_.button0_down),
                button1_down=jnp.where(is_mouse, inputs.mouse_buttons[1], m0_.button1_down),
                button2_down=jnp.where(is_mouse, inputs.mouse_buttons[2], m0_.button2_down),
                is_present=jnp.where(is_mouse, inputs.mouse_present, m0_.is_present),
            ),
        )

        def rep_mark(v):
            # identity pmax proving a device-identical value replicated to
            # shard_map's vma checker (no-op collective semantics; skipped
            # when the check is off) — see make_halo_step's rep_mark
            if not check_vma:
                return v
            if v.dtype in (jnp.bool_, jnp.uint8):
                return jax.lax.pmax(v.astype(jnp.int32), axis).astype(v.dtype)
            return jax.lax.pmax(v, axis)

        if need_neighbors:
            chunk, n_binned, violators, em, ev, sh_out = phase_a(
                chunk, gid, inputs, d
            )
            n_binned = jax.lax.psum(n_binned, axis)
        else:
            chunk, n_binned, violators, em, ev, sh_out = phase_a_local(
                chunk, gid, inputs, d
            )

        # merge per-chunk pair tables into the replicated global table and
        # diff on every device — the identical block as make_halo_step
        # (itself the single-chip events block over all_gathered inputs)
        pairs_dropped = jnp.int32(0)
        pair_count = jnp.int32(0)
        if ev_on:
            pairs_loc, count_loc, dropped_loc = ev
            allp = jax.lax.all_gather(pairs_loc, axis).reshape(-1, 2)
            allc = jax.lax.all_gather(count_loc, axis)  # [D]
            ar = jnp.arange(p_loc, dtype=jnp.int32)
            validp = (ar[None, :] < allc[:, None]).reshape(-1)
            rank = jnp.cumsum(validp.astype(jnp.int32)) - 1
            destp = jnp.where(validp & (rank < max_pairs), rank, max_pairs)
            pairs = jnp.full((max_pairs, 2), -1, jnp.int32)
            pairs = pairs.at[destp, 0].set(allp[:, 0], mode="drop")
            pairs = pairs.at[destp, 1].set(allp[:, 1], mode="drop")
            total_p = jnp.sum(validp, dtype=jnp.int32)
            pair_count = jnp.minimum(total_p, max_pairs)
            pairs_dropped = jax.lax.psum(dropped_loc, axis) + (total_p - pair_count)
            chunk = chunk.replace(
                collision_pairs=pairs, collision_pair_count=pair_count
            )
            from ..ops.events import diff_pairs

            enter, n_e, stay, n_s, exit_, n_x = diff_pairs(
                chunk.collision_pairs, chunk.collision_pair_count,
                chunk.prev_collision_pairs, chunk.prev_collision_pair_count,
            )
            new_prev = jax.lax.optimization_barrier(
                (chunk.collision_pairs, chunk.collision_pair_count)
            )
            pair_count = rep_mark(pair_count)
            pairs_dropped = rep_mark(pairs_dropped)
            chunk = chunk.replace(
                collision_pairs=rep_mark(chunk.collision_pairs),
                collision_pair_count=pair_count,
                prev_collision_pairs=rep_mark(new_prev[0]),
                prev_collision_pair_count=rep_mark(new_prev[1]),
                event_enter=rep_mark(enter), event_enter_count=rep_mark(n_e),
                event_stay=rep_mark(stay), event_stay_count=rep_mark(n_s),
                event_exit=rep_mark(exit_), event_exit_count=rep_mark(n_x),
            )

        chunk = advance_animation(chunk, frame_counts, cfg.dt_ratio)
        chunk = verlet_move(chunk, cfg, cfg.dt_ratio)
        chunk, solver_binned, ovf_b = phase_b(chunk, gid, d)
        chunk = update_derived(chunk, cfg)

        p_active = jnp.int32(-1)
        if has_particles:
            from ..ops.culling import update_particle_visibility
            from ..ops.particles import apply_emission, update_particles

            pool, stamps, p_active = update_particles(
                chunk.particles, cfg, cfg.dt_ratio, decals_on
            )
            chunk = chunk.replace(particles=pool)
            if decals_on:
                from ..ops.decals import stamp_decals

                # stamps derive from the REPLICATED pool: every device blits
                # the identical batch into its replicated canvas (halo.py)
                canvas, dirty = stamp_decals(
                    chunk.decal_canvas, chunk.decal_dirty, stamps,
                    decal_textures, cfg,
                )
                chunk = chunk.replace(
                    decal_canvas=rep_mark(canvas),
                    decal_dirty=rep_mark(dirty),
                )
            requests, gids_em = em
            batch, total_e = _merge_emissions(
                requests, jnp.maximum(gids_em, 0), emit_budget, axis
            )
            if batch is not None:
                pool, spawned = apply_emission(chunk.particles, batch, total_e)
                pool = jax.tree.map(rep_mark, pool)
                chunk = chunk.replace(particles=pool)
                p_active = p_active + rep_mark(spawned)
            chunk = update_particle_visibility(chunk, cfg, inputs)
        p_active = rep_mark(p_active)

        chunk = update_entity_visibility(chunk, cfg, inputs)

        # shadow sprites: psum the disjoint per-chunk [L·M] contributions
        if shadows_on and sh_out is not None:
            from ..components import ShadowSprites

            summed = {
                k: jax.lax.psum(v.astype(jnp.float32), axis)
                for k, v in sh_out.items()
            }
            chunk = chunk.replace(
                shadow_sprites=ShadowSprites(
                    active=summed["active"] > 0,
                    x=summed["x"], y=summed["y"],
                    rotation=summed["rotation"],
                    scale_x=summed["scale_x"], scale_y=summed["scale_y"],
                    alpha=summed["alpha"], radius=summed["radius"],
                )
            )

        # movers-only migration on FINAL positions: next frame's phase A
        # sees every non-violator resident in-band
        recv, send_ok, ungranted, rows = migrate(chunk, gid, d)
        # (gid lane biased +1 inside migrate's packing? — no: bias applied
        # here, symmetric with finish_migration's -1)
        chunk, gid = finish_migration(chunk, gid, recv, send_ok, rows)

        chunk = chunk.replace(step_count=chunk.step_count + 1)
        t = chunk.transform
        occ = gid >= 0
        metrics = {
            "active_count": jax.lax.psum(
                jnp.sum(t.active & occ, dtype=jnp.int32), axis
            ),
            "collision_pair_count": pair_count,
            "collision_pairs_dropped": pairs_dropped,
            "n_binned": n_binned,
            "active_particles": p_active,
            "nonfinite_count": jax.lax.psum(
                jnp.sum(
                    t.active & occ
                    & ~(jnp.isfinite(t.x) & jnp.isfinite(t.y)),
                    dtype=jnp.int32,
                ),
                axis,
            ),
            "solver_binned": jax.lax.psum(solver_binned, axis),
            "route_overflow_solver": jax.lax.psum(ovf_b, axis),
            "migrated_rows": jax.lax.psum(
                jnp.sum(send_ok, dtype=jnp.int32), axis
            ),
            "home_violators": jax.lax.psum(violators + ungranted, axis),
        }
        return chunk, gid, metrics

    # --- shardings / wrappers ---
    def chunk_specs(world: World):
        from .halo import halo_world_specs

        return halo_world_specs(world, axis)

    w_specs = chunk_specs(world0)
    in_specs = (
        w_specs, P(axis),
        jax.tree.map(lambda _: P(), engine.input.snapshot()),
    )
    met_keys = (
        "active_count", "collision_pair_count", "collision_pairs_dropped",
        "n_binned", "active_particles", "nonfinite_count",
        "solver_binned", "route_overflow_solver", "migrated_rows",
        "home_violators",
    )
    out_specs = (w_specs, P(axis), {k: P() for k in met_keys})

    def full_step(world: World, gid, inputs):
        return jax.shard_map(
            local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_vma,
        )(world, gid, inputs)

    w_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), w_specs)
    gid_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    ins_shardings = jax.tree.map(lambda _: rep, engine.input.snapshot())
    met_shardings = {k: rep for k in met_keys}
    step_fn = jax.jit(
        full_step,
        in_shardings=(w_shardings, gid_sharding, ins_shardings),
        out_shardings=(w_shardings, gid_sharding, met_shardings),
        donate_argnums=(0, 1),
    )

    def place_fn(world: World):
        """Host-side initial placement: every entity to its position's band,
        gid-sorted chunks, free-slot padding."""
        w = jax.device_get(world)
        y = np.asarray(w.transform.y)
        active = np.asarray(w.transform.active)
        grow = np.clip((y * inv_sp).astype(np.int32), 0, rows_g - 1)
        dest = np.minimum(grow // rpd, n_dev - 1)
        dest = np.where(active, dest, -1)  # inactive slots: parked on d0
        dest = np.where(np.isfinite(y), dest, 0)
        # inactive entities still occupy pool slots host-side; park them on
        # device 0 so their rows exist somewhere (they are invisible to
        # binning/ticks via the active mask)
        dest = np.where(dest < 0, 0, dest)
        rows_np = np.asarray(jax.device_get(pack_world_rows(world, specs)))
        gid_chunks = np.full((n_dev, n_cap), -1, np.int32)
        row_chunks = np.zeros((n_dev, n_cap, n_lanes), np.int32)
        for dev in range(n_dev):
            idx = np.nonzero(dest == dev)[0]
            if idx.size > n_cap:
                raise ValueError(
                    f"placement overflow: band {dev} holds {idx.size} "
                    f"entities > chunk capacity {n_cap}; raise headroom"
                )
            gid_chunks[dev, : idx.size] = idx
            row_chunks[dev, : idx.size] = rows_np[idx]
        flat_rows = jnp.asarray(row_chunks.reshape(n_dev * n_cap, n_lanes))
        # build from the HOST copy `w`, never from `world`'s device arrays:
        # device_put of an already-placed leaf aliases its buffer, and the
        # step's donation would delete the caller's world out from under it
        # (live-control-plane flows re-read eng.world after placing)
        base = _resize_entity_leaves(w, n_dev * n_cap)
        chunked = unpack_world_rows(flat_rows, base, specs)
        placed = jax.tree.map(
            lambda leaf, s: jax.device_put(leaf, s), chunked, w_shardings
        )
        gid = jax.device_put(
            jnp.asarray(gid_chunks.reshape(-1)), gid_sharding
        )
        return placed, gid

    def unplace_fn(world_chunks: World, gid) -> World:
        """Reassemble the entity-ordered world (host-side, for snapshots)."""
        w = jax.device_get(world_chunks)
        g = np.asarray(jax.device_get(gid))
        rows_np = np.asarray(jax.device_get(pack_world_rows(w, specs)))
        out_rows = np.zeros((n, n_lanes), np.int32)
        occ = g >= 0
        out_rows[g[occ]] = rows_np[occ]
        base = _resize_entity_leaves(w, n)
        return unpack_world_rows(jnp.asarray(out_rows), base, specs)

    # ------------------------------------------------------------------
    # live host control plane (round 5): spawn / despawn DURING a homed
    # run without re-placing the whole world. The reference's spawn is a
    # control-plane fan-out into the running loop (gameEngine.js:1651-1670);
    # here a spawned row inserts into the chunk of the band owning its
    # position via the same gid-sorted merge migration uses, and a host
    # despawn clears its row in place (the freed slot compacts at the next
    # migration sort). Bit-exact vs full re-placement when no insert is
    # denied: both produce the same gid-sorted occupied set per band.
    # ------------------------------------------------------------------
    y_lane = next(
        i for i, (c, f, _) in enumerate(specs)
        if c == "transform" and f == "y"
    )

    def _insert_local(chunk: World, gid, new_rows, new_gids):
        d = jax.lax.axis_index(axis).astype(jnp.int32)
        y = jax.lax.bitcast_convert_type(
            new_rows[:, y_lane], jnp.float32
        )
        valid_new = new_gids >= 0
        dest = jnp.where(
            valid_new & jnp.isfinite(y), band_of_y(y), jnp.int32(-1)
        )
        mine = dest == d
        # capacity grant: occupied + granted prefix <= n_cap (deterministic
        # per destination — same guard class as migration's)
        occ = jnp.sum(gid >= 0, dtype=jnp.int32)
        rank = jnp.cumsum(mine.astype(jnp.int32)) - 1
        ok = mine & (rank < jnp.maximum(n_cap - occ, 0))
        denied = jax.lax.psum(jnp.sum(mine & ~ok, dtype=jnp.int32), axis)
        my_rows = pack_world_rows(chunk, specs)
        ins_gid = jnp.where(ok, new_gids, -1)
        all_rows = jnp.concatenate([my_rows, new_rows], axis=0)
        all_gid = jnp.concatenate([gid, ins_gid], axis=0)
        key = jnp.where(all_gid >= 0, all_gid, _I32_MAX)
        order = jnp.argsort(key)[:n_cap]
        rows2 = all_rows[order]
        gid2 = jnp.where(key[order] < _I32_MAX, all_gid[order], -1)
        rows2 = jnp.where(gid2[:, None] >= 0, rows2, 0)
        return unpack_world_rows(rows2, chunk, specs), gid2, denied

    def _remove_local(chunk: World, gid, victim_gids):
        hit = (
            (gid[:, None] == victim_gids[None, :])
            & (victim_gids >= 0)[None, :]
        ).any(axis=1)
        gid2 = jnp.where(hit, -1, gid)
        rows = pack_world_rows(chunk, specs)
        rows = jnp.where(hit[:, None], 0, rows)
        removed = jax.lax.psum(jnp.sum(hit, dtype=jnp.int32), axis)
        return unpack_world_rows(rows, chunk, specs), gid2, removed

    rep_p = P()
    _insert_jit = jax.jit(
        jax.shard_map(
            _insert_local, mesh=mesh,
            in_specs=(w_specs, P(axis), rep_p, rep_p),
            out_specs=(w_specs, P(axis), rep_p),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )
    _remove_jit = jax.jit(
        jax.shard_map(
            _remove_local, mesh=mesh,
            in_specs=(w_specs, P(axis), rep_p),
            out_specs=(w_specs, P(axis), rep_p),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )

    class _HomedControl:
        """Host control plane for a placed homed world (see module docs)."""

        @staticmethod
        def pack_rows(world: World, gids) -> jnp.ndarray:
            """[K, n_lanes] packed rows for ``gids`` from an entity-ordered
            world (e.g. the engine's scratch world after spawn_batch)."""
            rows = np.asarray(jax.device_get(pack_world_rows(world, specs)))
            return jnp.asarray(rows[np.asarray(gids)])

        @staticmethod
        def insert(world_chunks, gid, new_rows, new_gids):
            """Insert spawned rows into their bands' chunks.

            Returns (world_chunks, gid, denied). ``denied`` > 0 means some
            destination chunk was full — the caller should fall back to a
            full re-placement (``place_fn(unplace_fn(...))``), the same
            condition under which place_fn itself raises."""
            return _insert_jit(
                world_chunks, gid,
                jnp.asarray(new_rows, jnp.int32),
                jnp.asarray(new_gids, jnp.int32),
            )

        @staticmethod
        def remove(world_chunks, gid, victim_gids):
            """Host despawn: clear the rows of ``victim_gids`` wherever they
            live. Returns (world_chunks, gid, removed_count)."""
            return _remove_jit(
                world_chunks, gid, jnp.asarray(victim_gids, jnp.int32)
            )

    return step_fn, place_fn, unplace_fn, _HomedControl
