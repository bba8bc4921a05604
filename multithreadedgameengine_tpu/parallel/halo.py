"""Explicit spatial-domain multi-chip step: shard_map + all_to_all routing +
ppermute halo exchange (SURVEY.md §5.7, §7 step 7 — BASELINE config 5).

This is the second rung of the scale ladder, past the entity-sharded GSPMD
path (parallel/sharded.py): instead of replicating the spatial table on every
device, the WORLD is decomposed into horizontal slabs (contiguous blocks of
grid rows); each device owns one slab and materializes only its slab's share
of the neighbor table and solver grid — 1/D of the memory — with explicitly
exchanged halo rows standing in for the reference's cross-worker reads of the
shared grid (spatial_worker.js:122-278 read by every worker).

Reference mechanisms being mapped:
 - work distribution over entities (gameEngine.js:744-761 job queue)
   → all_to_all routing of entity rows to the device owning their world slab;
 - the one shared hash grid every worker reads (spatial_worker.js:122-278)
   → per-slab tables + ppermute'd boundary rows (the halo);
 - rebuild-every-frame (spatial_worker.js:283-294) → re-route every frame, so
   slabs stay coherent as entities move.

Design (one shard_map over the whole step; entity leaves sharded [N/D]):

  phase A (logic): route each ACTIVE entity's full packed component row to
    the device owning its SPATIAL grid row (pre-move position, exactly the
    rows the single-device spatial pass bins). The slab builds its local
    neighbor table, ppermutes ``hw`` boundary table-row blocks to fill halos,
    candidate-gathers and ticks its residents (run_logic_phase_masked), then
    routes the updated rows home. Binning, scan order, truncation and float
    arithmetic reproduce the single-device path bit-for-bit: global cell
    coordinates are computed from the SAME ``clip(y * inv)`` truncation and
    only then offset to slab-local indices, and resident order (source-major,
    index-ascending) preserves global-id order inside every cell.
  elementwise (home): animation advance, Verlet move — no communication.
  phase B (solver): route the 8-channel solver rows (pack_solver_rows) by
    POST-move position to the slab owner; scatter into the slab's bordered
    grid; exchange full border rows once, then refresh halo x/y via ppermute
    inside every substep (positions move, attributes don't); run the shared
    substep kernel (ops/physics_grid.run_solver_substeps); route x/y/px/py/
    collision_count home.
  elementwise (home): derived velocity/angle, screen culling, metrics (psum).

Routing capacity: each (source, destination) pair gets ``ceil(n_loc/D ·
oversub)`` row slots. Entities beyond it stay home for the frame and degrade
to boundary-only physics / tick-less logic — the same "capacity overflow"
class as cell-capacity drops, surfaced in the metrics (route_overflow_*).

The full mixed-scene feature set runs under this step (BASELINE config 5):
 - collision events: per-slab hook-scoped pair recording with GLOBAL ids →
   all_gather + rank-compaction into the replicated pair table → the same
   device-side Enter/Stay/Exit diff as the single-chip step, identical
   tables (diff output is (a, b)-sorted);
 - device-side "emit": per-slab requests sort-merged across the mesh into
   the single-device emission order (gid, slot) and applied to the
   replicated particle pool; particle physics runs replicated;
 - shadow sprites: global first-L light selection by entity-index order,
   per-slab sprite math from the lights' local neighbor lists + caster
   payload channels, psum-composed output buffer (frame-start caster
   state — a documented one-frame staleness the reference's free-running
   particle worker shares).

 - decal stamping: landed-particle stamps derive from the replicated pool,
   so every device blits the identical batch into its (default-replicated)
   tile canvas — same memory class as the replicated pool;
 - ``ctx.gather`` of undeclared neighbor fields: resolved against the HOME
   chunk's frame-start field all_gathered into global-id order — one
   collective per gathered path per step (declare fields in
   ``neighbor_fields`` for the payload-channel fast path).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..behavior import read_field, run_logic_phase_masked
from ..config import EngineConfig
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
    pack_solver_rows,
    run_solver_substeps,
    scatter_solver_grid,
)

_ENTITY_COMPONENTS = (
    "transform", "rigid_body", "collider", "sprite", "mouse", "light", "shadow"
)


# ---------------------------------------------------------------------------
# packed-row transport: every per-entity component field as one int32 lane
# (f32/u32 bitcast, bool/int widened) — one row-scatter to stage, one
# all_to_all to move, exact round-trip.
# ---------------------------------------------------------------------------

def entity_leaf_specs(world: World) -> List[Tuple[str, str, Any]]:
    """Deterministic [(component, field, dtype)] order over every per-entity
    leaf (built-ins then sorted custom components)."""
    specs = []
    for name in _ENTITY_COMPONENTS:
        comp = getattr(world, name)
        for f in dataclasses.fields(comp):
            specs.append((name, f.name, getattr(comp, f.name).dtype))
    for cname in sorted(world.custom):
        comp = world.custom[cname]
        for f in dataclasses.fields(comp):
            specs.append((f"custom:{cname}", f.name, getattr(comp, f.name).dtype))
    return specs


def _get_comp(world: World, cname: str):
    if cname.startswith("custom:"):
        return world.custom[cname[7:]]
    return getattr(world, cname)


def pack_world_rows(world: World, specs) -> jnp.ndarray:
    """[n, L] int32 rows: one lane per per-entity field."""
    cols = []
    for cname, fname, dt in specs:
        arr = getattr(_get_comp(world, cname), fname)
        dt = jnp.dtype(dt)
        if dt == jnp.dtype(jnp.float32) or dt == jnp.dtype(jnp.uint32):
            cols.append(jax.lax.bitcast_convert_type(arr, jnp.int32))
        else:
            cols.append(arr.astype(jnp.int32))
    return jnp.stack(cols, axis=1)


def unpack_world_rows(rows: jnp.ndarray, world: World, specs) -> World:
    """Rebuild a world whose per-entity leaves are the [m] unpacked rows
    (non-entity leaves carried from ``world``)."""
    fields: Dict[str, Dict[str, jnp.ndarray]] = {}
    for k, (cname, fname, dt) in enumerate(specs):
        col = rows[:, k]
        dt = jnp.dtype(dt)
        if dt == jnp.dtype(jnp.float32) or dt == jnp.dtype(jnp.uint32):
            arr = jax.lax.bitcast_convert_type(col, dt)
        elif dt == jnp.dtype(jnp.bool_):
            arr = col != 0
        else:
            arr = col.astype(dt)
        fields.setdefault(cname, {})[fname] = arr
    built = {}
    custom = dict(world.custom)
    for cname, fs in fields.items():
        comp = _get_comp(world, cname).replace(**fs)
        if cname.startswith("custom:"):
            custom[cname[7:]] = comp
        else:
            built[cname] = comp
    return world.replace(custom=custom, **built)


# ---------------------------------------------------------------------------
# routing primitives (inside shard_map)
# ---------------------------------------------------------------------------

def _rank_within_dest(dest: jnp.ndarray, valid: jnp.ndarray, n_dest: int) -> jnp.ndarray:
    """Rank of each row among same-destination rows, in row order (the same
    sort-and-run-scan used by bin_entities — preserves ascending-index order
    within a destination, which keeps within-cell ranks globally identical)."""
    n = dest.shape[0]
    key = jnp.where(valid, dest, n_dest).astype(jnp.int32)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    sorted_key = key[order]
    ar = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_key[1:] != sorted_key[:-1]]
    )
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, ar, 0)
    )
    rank_sorted = ar - run_start
    inv = jnp.argsort(order).astype(jnp.int32)
    return rank_sorted[inv]


def route_out(rows, dest, valid, n_dev, cap, axis):
    """Send row i to device dest[i]. Returns (recv [D·cap, L] — source-major
    blocks, empty slots all-zero; sent_slot [n] — my flat send slot or -1;
    overflow count)."""
    rank = _rank_within_dest(dest, valid, n_dev)
    ok = valid & (rank < cap)
    slot = jnp.where(ok, dest * cap + rank, n_dev * cap)
    send = (
        jnp.zeros((n_dev * cap, rows.shape[1]), rows.dtype)
        .at[slot].set(rows, mode="drop")
    )
    recv = jax.lax.all_to_all(
        send.reshape(n_dev, cap, rows.shape[1]), axis, 0, 0
    ).reshape(n_dev * cap, rows.shape[1])
    overflow = jnp.sum(valid & ~ok, dtype=jnp.int32)
    return recv, jnp.where(ok, slot, -1), overflow


def route_back(out_rows, sent_slot, n_dev, cap, axis):
    """Reverse of route_out: every processed resident row returns to its
    source device and original slot. Returns (rows_for_my_sends [n, L],
    valid mask)."""
    back = jax.lax.all_to_all(
        out_rows.reshape(n_dev, cap, out_rows.shape[1]), axis, 0, 0
    ).reshape(n_dev * cap, out_rows.shape[1])
    got = back[jnp.maximum(sent_slot, 0)]
    return got, sent_slot >= 0


def route_capacity(n_loc: int, n_dev: int, oversub: float) -> int:
    """Row slots per (source, destination) pair in the all_to_all routing
    buffers: ``ceil(n_loc·oversub/n_dev)`` rounded up to 8, clamped to
    [8, n_loc]. Shared by make_halo_step and the scaling benchmark's
    analytic comms accounting (benchmarks/halo_scaling.py) so the reported
    volumes cannot drift from what the program transfers."""
    cap = math.ceil(n_loc * oversub / n_dev)
    return int(min(max(((cap + 7) // 8) * 8, 8), n_loc))


def _edge_perms(n_dev: int):
    down = [(i, i + 1) for i in range(n_dev - 1)]  # toward higher slabs
    up = [(i, i + 1 - 2) for i in range(1, n_dev)]  # toward lower slabs
    return down, up


_I32_MAX = np.int32(2**31 - 1)


def _merge_emissions(requests, gids, budget: int, axis: str):
    """Merge per-slab device-emit request blocks into the replicated global
    emission batch, reproducing the single-device order exactly: requests
    sort by (emitter global id, slot) — class slot ranges ascend with
    registration order, so this equals run_logic_phase's class-then-row-
    then-slot order (see run_logic_phase_masked docs). Each slab pre-sorts
    and truncates to ``budget`` (what the pool could accept at most), then
    the gathered [D·budget] set sorts and truncates again — drops match the
    single-device budget truncation. Returns (batch, total) for
    ops/particles.apply_emission, or (None, None) with no requests."""
    if not requests or budget <= 0:
        return None, None
    stride = max(r["valid"].shape[1] for r in requests)
    keys, valids = [], []
    fields = {k: [] for k in requests[0]["fields"]}
    for r in requests:
        capk = r["valid"].shape[1]
        slot = jnp.arange(capk, dtype=jnp.int32)[None, :]
        keys.append((gids[:, None] * jnp.int32(stride) + slot).reshape(-1))
        valids.append(r["valid"].reshape(-1))
        for k in fields:
            fields[k].append(r["fields"][k].reshape(-1))
    key = jnp.concatenate(keys)
    valid = jnp.concatenate(valids)
    big = jnp.where(valid, key, _I32_MAX)
    if big.shape[0] < budget:
        pad = budget - big.shape[0]
        big = jnp.concatenate([big, jnp.broadcast_to(key[:1] * 0 + _I32_MAX, (pad,))])
        fields = {
            k: [jnp.concatenate(v + [jnp.zeros((pad,), v[0].dtype)])]
            for k, v in fields.items()
        }
    else:
        fields = {k: [jnp.concatenate(v)] for k, v in fields.items()}
    ordl = jnp.argsort(big)[:budget]
    keyl = big[ordl]
    fieldsl = {k: v[0][ordl] for k, v in fields.items()}

    allk = jax.lax.all_gather(keyl, axis).reshape(-1)
    ordg = jnp.argsort(allk)[:budget]
    batch = {
        k: jax.lax.all_gather(v, axis).reshape(-1)[ordg]
        for k, v in fieldsl.items()
    }
    total = jnp.minimum(
        jnp.sum(allk < _I32_MAX, dtype=jnp.int32), jnp.int32(budget)
    )
    return batch, total


def _slab_shadow_sprites(
    local, nbr, flat, res_gid, valid_ent, payload_channels, cfg, axis
):
    """This slab's shadow-sprite contributions (ops/lighting.shadow_sprites
    mapped to routed resident rows; particle_worker.js:861-1004): the global
    first-L light selection (entity-index order) is agreed via a tiny
    all_gather of candidate light ids, each selected light's sprites are
    computed on the slab that owns its row — its neighbor list and the
    casters' payload channels live there — and the per-slab [L·M] buffers
    psum into the full output (disjoint light slots). Caster state comes
    from the frame-start payload snapshot (documented deviation: the
    single-chip step reads current-frame caster state; the reference's
    free-running particle worker reads stale state like this path does).
    Returns {field: [L·M]} with zeros outside this slab's lights."""
    lc = cfg.lighting
    L, M = lc.max_shadow_casting_lights, lc.max_shadows_per_light
    t, li = local.transform, local.light
    sp_l = local.sprite

    light_ok = (
        li.active & t.active & sp_l.is_on_screen
        & (li.light_intensity > 0) & valid_ent
    )
    key = jnp.where(light_ok, res_gid, _I32_MAX)
    m = key.shape[0]
    loc_sorted = jax.lax.sort(key)[: min(L, m)]
    if loc_sorted.shape[0] < L:
        loc_sorted = jnp.concatenate([
            loc_sorted,
            jnp.broadcast_to(key[:1] * 0 + _I32_MAX, (L - loc_sorted.shape[0],)),
        ])
    sel = jax.lax.sort(jax.lax.all_gather(loc_sorted, axis).reshape(-1))[:L]
    sel_valid = sel < _I32_MAX

    eqm = (res_gid[None, :] == sel[:, None]) & light_ok[None, :]  # [L, m]
    has = jnp.any(eqm, axis=1) & sel_valid
    lrow = jnp.argmax(eqm, axis=1)

    ids_l = nbr.ids[lrow]  # [L, S]
    d2_l = nbr.d2[lrow]
    flat_l = flat[lrow]  # [L, S, F]
    lx = t.x[lrow][:, None]
    ly = t.y[lrow][:, None]
    l_int = li.light_intensity[lrow][:, None]

    ch_sh = flat_l[..., payload_channels["__shadow__"]]
    c_h_raw = flat_l[..., payload_channels["shadow.height"]]
    dist = jnp.sqrt(d2_l)
    caster_ok = has[:, None] & (ids_l >= 0) & (ch_sh >= 0) & (dist >= 1.0)
    rank = jnp.cumsum(caster_ok.astype(jnp.int32), axis=1)
    keep = caster_ok & (rank <= M)

    cx = flat_l[..., 1]
    cy = flat_l[..., 2]
    c_rad = jnp.where(ch_sh > 0, ch_sh, 10.0)  # || 10 (particle_worker :945)
    c_h = jnp.where(c_h_raw > 0, c_h_raw, c_rad)  # || radius (:946)
    dx = cx - lx
    dy = cy - ly
    inv_dist = 1.0 / jnp.maximum(dist, 1e-6)
    dir_x = dx * inv_dist
    dir_y = dy * inv_dist
    pos_x = cx - dir_x * c_rad
    pos_y = cy - dir_y * c_rad
    dist_ratio = jnp.minimum(dist * (1.0 / 256.0), 1.0)
    height_factor = c_h * 0.025
    length_scale = (0.3 + dist_ratio * 0.9) * height_factor
    width_scale = c_rad * 0.0714
    alpha = l_int / jnp.maximum(d2_l * 2.0, 1e-6)
    rotation = jnp.arctan2(dy, dx) - jnp.float32(jnp.pi / 2)

    ord2 = jnp.argsort(~keep, axis=1, stable=True)[:, :M]
    c2 = ord2.shape[1]
    kept_g = jnp.take_along_axis(keep, ord2, axis=1)
    kept_g = jnp.pad(kept_g, ((0, 0), (0, M - c2)))

    def gather(a):
        g = jnp.take_along_axis(a, ord2, axis=1)
        g = jnp.pad(g, ((0, 0), (0, M - c2)))
        # zero non-owned slots so the cross-slab psum composes exactly
        return jnp.where(kept_g, g, 0.0).reshape(-1)

    return {
        "active": kept_g.reshape(-1),
        "x": gather(pos_x), "y": gather(pos_y), "rotation": gather(rotation),
        "scale_x": gather(width_scale), "scale_y": gather(length_scale),
        "alpha": gather(alpha), "radius": gather(c_rad),
    }


# ---------------------------------------------------------------------------
# the halo step builder
# ---------------------------------------------------------------------------

def halo_world_specs(world: World, axis: str):
    """PartitionSpec pytree: per-entity component leaves P(axis), everything
    else replicated."""
    specs = jax.tree.map(lambda _: P(), world)
    ent = {
        name: jax.tree.map(lambda _: P(axis), getattr(world, name))
        for name in _ENTITY_COMPONENTS
    }
    ent["custom"] = {
        k: jax.tree.map(lambda _: P(axis), v) for k, v in world.custom.items()
    }
    return specs.replace(**ent)


def make_halo_step(engine, mesh: Mesh, oversub: float = 4.0,
                   chunk_steps: int = 1, check_vma: bool = None):
    """Build the spatial-domain sharded step for an initialized engine.

    Returns (step_fn, place_fn): ``place_fn(world)`` lays the world out over
    the mesh (entity leaves split into [N/D] chunks); ``step_fn(world,
    inputs) -> (world, metrics)`` is the jitted, donated halo step.

    ``chunk_steps=K > 1`` returns a CHUNKED step instead — the multi-chip
    analog of the single-chip FramePlan control plane: ``step_fn(world,
    inputs_timeline)`` runs K frames in ONE dispatch under ``lax.scan``,
    where ``inputs_timeline`` is the input pytree stacked on a leading [K]
    axis (per-frame input fidelity preserved; stack K copies of one
    snapshot to freeze it). Metrics come back stacked [K] per key. This
    amortizes the per-program dispatch cost (~70 ms through the axon
    tunnel, gameEngine frame loop parity at 60 FPS needs it) across K
    simulated frames.

    ``check_vma``: shard_map's replication checker. Default (None) enables
    it except with the Pallas solver (whose outputs it cannot type). When
    ON, identity pmax "marks" re-prove replication of the device-identical
    event tables / particle pool / decal canvas — real collectives the
    checker demands but hardware doesn't need; pass False (as the scaling
    bench does) to drop both the check and the marks, matching the real-TPU
    configuration. Replication correctness is pinned by the
    bit-exact-vs-single-device suites either way.
    """
    engine._require_init()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    world0 = engine.world
    n = world0.n_entities
    if n % n_dev != 0:
        raise ValueError(
            f"halo step needs entity count divisible by the mesh size "
            f"({n} % {n_dev} != 0); pad a registration"
        )
    n_loc = n // n_dev

    cfg = engine._resolve_spatial()
    if cfg.spatial.method != "grid":
        raise ValueError("halo step requires spatial.method='grid'")
    if check_vma is None:
        # jax 0.9's varying-mesh-axes validation cannot type pallas_call
        # outputs (ShapeDtypeStruct carries no vma), so the Pallas solver
        # inside the slab shard_map trips it on a real TPU mesh
        check_vma = cfg.physics.solver != "pallas"

    def rep_mark(v):
        """Identity pmax proving a device-identical value replicated to the
        vma checker; a no-op (and no collective) when the check is off."""
        if not check_vma:
            return v
        if v.dtype in (jnp.bool_, jnp.uint8):
            return jax.lax.pmax(
                v.astype(jnp.int32), mesh.axis_names[0]
            ).astype(v.dtype)
        return jax.lax.pmax(v, mesh.axis_names[0])
    if cfg.physics.solver == "neighbors":
        raise ValueError("halo step requires the grid constraint solver")
    # decals: the particle pool runs REPLICATED under this step, so landed
    # particles produce device-identical stamp batches and the tile canvas
    # (a default-replicated world leaf) stays consistent — each device blits
    # the same stamps (memory cost: one canvas per device, same as the pool)
    decals_on = cfg.particle.max_particles > 0 and cfg.particle.decals
    if decals_on:
        from ..ops.decals import default_decal_textures

        # numpy constant (embeds deterministically — see engine note on
        # jax 0.9 captured-constant lifting)
        decal_textures = default_decal_textures(len(engine.sprites.textures))
    else:
        decal_textures = None

    # collision events (engine one_step events block, mapped to slabs): each
    # slab records its residents' pairs with GLOBAL ids; the per-slab tables
    # all_gather + rank-compact into the replicated world pair table, and the
    # Enter/Stay/Exit diff runs identically on every device. Pair-recording
    # scope matches the engine (hook-scoped unless record_all_pairs).
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
    # per-slab pair-table slots: what one slab could record at most
    p_loc = max_pairs

    has_particles = cfg.particle.max_particles > 0
    emit_budget = cfg.particle.max_emit_per_step if has_particles else 0

    shadows_on = cfg.lighting.enabled and cfg.lighting.shadows_enabled
    cfg, solver_geom, forced = engine._solver_plan(cfg)
    if solver_geom is None or forced:
        raise ValueError("halo step could not derive a solver geometry (no radii)")

    payload_channels, extra_paths = engine._payload_plan(cfg)
    if shadows_on:
        # caster data for the shadow pass rides the candidate table: one
        # packed validity/radius channel + the caster height
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

    # --- slab geometry ---
    sp = cfg.spatial
    rows_g, cols_g = cfg.grid_rows, cfg.grid_cols
    hw = max(1, sp.max_cell_radius)  # spatial halo width = candidate scan radius
    rpd_sp = math.ceil(rows_g / n_dev)
    if need_neighbors and hw > rpd_sp:
        raise ValueError(
            f"spatial halo width {hw} exceeds rows-per-slab {rpd_sp}: "
            f"too many devices for this grid (rows={rows_g})"
        )
    rows_loc = rpd_sp + 2 * hw
    cells_loc = rows_loc * cols_g
    geom_sp_loc = GridGeom(
        cell_size=sp.cell_size, rows=rows_loc, cols=cols_g,
        capacity=sp.cell_capacity,
    )

    R_s, C_s, cap_s = solver_geom.rows, solver_geom.cols, solver_geom.capacity
    rps = math.ceil(R_s / n_dev)
    geom_s_loc = GridGeom(
        cell_size=solver_geom.cell_size, rows=rps, cols=C_s, capacity=cap_s
    )

    cap_a = route_capacity(n_loc, n_dev, oversub)
    cap_b = route_capacity(n_loc, n_dev, oversub)
    down_perm, up_perm = _edge_perms(n_dev)

    inv_sp = 1.0 / sp.cell_size
    inv_s = 1.0 / solver_geom.cell_size
    f32 = jnp.float32

    # ------------------------------------------------------------------
    # phase A: neighbor tables + ticks on slab residents
    # ------------------------------------------------------------------
    def phase_a(chunk: World, inputs, d):
        t = chunk.transform
        finite = jnp.isfinite(t.x) & jnp.isfinite(t.y)
        grow = jnp.clip((t.y * inv_sp).astype(jnp.int32), 0, rows_g - 1)
        dest = jnp.where(
            finite, jnp.minimum(grow // rpd_sp, n_dev - 1), d
        )
        gid = d * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
        rows = jnp.concatenate(
            [pack_world_rows(chunk, specs), gid[:, None]], axis=1
        )
        recv, sent_slot, ovf = route_out(rows, dest, t.active, n_dev, cap_a, axis)
        res_gid = recv[:, -1]
        local = unpack_world_rows(recv[:, :-1], chunk, specs)

        lt = local.transform
        res_fin = jnp.isfinite(lt.x) & jnp.isfinite(lt.y)
        valid_ent = lt.active & res_fin

        def hooked_mask(types):
            m = jnp.zeros_like(lt.active)
            for et in types:
                m |= lt.entity_type == jnp.int32(et)
            return m

        # local table: GLOBAL truncation, then slab offset (bit-exact binning)
        grow_r = jnp.clip((lt.y * inv_sp).astype(jnp.int32), 0, rows_g - 1)
        gcol_r = jnp.clip((lt.x * inv_sp).astype(jnp.int32), 0, cols_g - 1)
        loc_row = jnp.clip(grow_r - d * rpd_sp + hw, 0, rows_loc - 1)
        extras = []
        for p in extra_paths:
            if p == "__collision__":
                # packed events channel — same encoding as the engine's
                # single-chip step (see engine._build_step)
                c_ = local.collider
                enc = c_.radius
                if ev_scope_hooked:
                    enc = jnp.where(hooked_mask(hooked_types), enc, -enc - 1.0)
                extras.append(jnp.where(c_.active, enc, jnp.float32(-3.0e38)))
            elif p == "__shadow__":
                # packed caster channel: valid shadow caster -> radius, else -1
                sh_, sp_l = local.shadow, local.sprite
                ok_c = sh_.active & sp_l.is_on_screen
                extras.append(
                    jnp.where(ok_c, sh_.shadow_radius, jnp.float32(-1.0))
                )
            else:
                extras.append(jnp.asarray(read_field(local, p), f32))
        rows_vals = jnp.stack(
            [res_gid.astype(f32), lt.x, lt.y] + extras, axis=1
        )
        bins = bin_entities(
            lt.x, lt.y, valid_ent, geom_sp_loc, table_values=rows_vals,
            row=loc_row, col=gcol_r,
        )

        # halo: boundary table-row blocks from the slab neighbors
        n_ch = rows_vals.shape[1]
        body = bins.table[:cells_loc].reshape(
            rows_loc, cols_g, sp.cell_capacity, n_ch
        )
        from_up = jax.lax.ppermute(body[rpd_sp : rpd_sp + hw], axis, down_perm)
        from_dn = jax.lax.ppermute(body[hw : 2 * hw], axis, up_perm)
        body = body.at[0:hw].set(from_up)
        body = body.at[hw + rpd_sp : 2 * hw + rpd_sp].set(from_dn)
        table = jnp.concatenate(
            [body.reshape(cells_loc, sp.cell_capacity, n_ch),
             bins.table[cells_loc:]],
            axis=0,
        )

        # candidate gather: row-major (2hw+1)² neighborhood, global bounds
        # (the zero-filled edge halos are never addressed — out-of-world rows
        # mask to the sentinel cell)
        offs = jnp.arange(-hw, hw + 1, dtype=jnp.int32)
        off_r = jnp.repeat(offs, 2 * hw + 1)
        off_c = jnp.tile(offs, 2 * hw + 1)
        cand_grow = grow_r[:, None] + off_r[None, :]
        cand_gcol = gcol_r[:, None] + off_c[None, :]
        in_b = (
            (cand_grow >= 0) & (cand_grow < rows_g)
            & (cand_gcol >= 0) & (cand_gcol < cols_g)
        )
        cand_lrow = cand_grow - d * rpd_sp + hw
        cand_cell = jnp.where(in_b, cand_lrow * cols_g + cand_gcol, cells_loc)
        flat = table[cand_cell]  # [m, B, cap, F] — one row-gather
        flat = flat.reshape(lt.x.shape[0], -1, n_ch)
        cand = flat[..., 0].astype(jnp.int32)
        dx = flat[..., 1] - lt.x[:, None]
        dy = flat[..., 2] - lt.y[:, None]
        d2 = dx * dx + dy * dy
        vr2 = (local.collider.visual_range ** 2)[:, None]
        ok = (
            (cand >= 0)
            & (cand != res_gid[:, None])
            & (d2 < vr2)
            & (d2 > 0)
            & valid_ent[:, None]
        )
        ids, d2_out, count = _cap_first_k(cand, d2, ok, sp.max_neighbors)
        nbr = NeighborLists(
            ids=ids, d2=d2_out, count=count, n_binned=bins.n_binned,
            payload=NeighborPayload(data=flat),
        )

        # undeclared-field ctx.gather support: neighbor ids are GLOBAL, so
        # resolve the path against the HOME chunk's frame-start field
        # all_gathered into gid order — one collective per gathered path per
        # step (declared neighbor_fields payload channels remain the fast
        # path). Values match the single-device ctx.world (frame-start).
        def gather_fn(path):
            return jax.lax.all_gather(
                jnp.asarray(read_field(chunk, path)), axis
            ).reshape(-1)

        local, emissions = run_logic_phase_masked(
            local, nbr, inputs, cfg, type_specs, payload_channels,
            gather_fn=gather_fn,
        )

        # collision-pair recording on the slab's residents (the engine's
        # events block mapped to routed rows): post-tick flags, frame-start
        # positions/d² — identical acceptance to the single-chip step; pairs
        # carry GLOBAL ids so the cross-slab merge + diff is exact.
        ev = None
        if ev_on:
            from ..ops.physics import compact_pairs

            lt2, lc2 = local.transform, local.collider
            ch = flat[..., payload_channels["__collision__"]]
            coll_j = ch > jnp.float32(-1.0e30)
            self_ok = lt2.active & lc2.active & res_fin
            if ev_scope_hooked:
                hooked_j = ch >= 0
                r_j = jnp.where(hooked_j, ch, -ch - 1.0)
                ok = (
                    (self_ok & hooked_mask(hooked_types))[:, None]
                    & (ids >= 0) & coll_j
                )
                once = jnp.where(hooked_j, ids > res_gid[:, None], True)
            else:
                r_j = ch
                ok = self_ok[:, None] & (ids >= 0) & coll_j
                once = ids > res_gid[:, None]
            min_d = lc2.radius[:, None] + r_j
            rec = ok & (d2_out < min_d * min_d) & once
            ev = compact_pairs(ids, rec, p_loc, row_ids=res_gid)

        # shadow sprites for resident lights (particle_worker.js:861-1004):
        # global first-L light selection by gid order, casters from the
        # payload channels. Documented deviation vs the single-chip step:
        # caster positions/visibility are FRAME-START state (the payload
        # snapshot) — the reference's own particle worker reads equally
        # stale state from its free-running pipeline.
        sh_out = None
        if shadows_on:
            sh_out = _slab_shadow_sprites(
                local, nbr, flat, res_gid, valid_ent, payload_channels,
                cfg, axis,
            )

        out_rows = pack_world_rows(local, specs)
        got, got_ok = route_back(out_rows, sent_slot, n_dev, cap_a, axis)
        merged = jnp.where(got_ok[:, None], got, rows[:, :n_lanes])
        chunk = unpack_world_rows(merged, chunk, specs)
        return chunk, bins.n_binned, ovf, ev, (emissions, res_gid), sh_out

    # ------------------------------------------------------------------
    # phase A': tick without neighbor tables (classes with
    # uses_neighbors=False — no routing needed, ticks run at home)
    # ------------------------------------------------------------------
    def phase_a_local(chunk: World, inputs, d):
        m = n_loc
        empty = NeighborLists(
            ids=jnp.full((m, 1), -1, jnp.int32),
            d2=jnp.zeros((m, 1), f32),
            count=jnp.zeros((m,), jnp.int32),
            n_binned=jnp.int32(-1),
            payload=NeighborPayload(data=jnp.zeros((m, 1, 0), f32)),
        )
        # same all_gather gather_fn as phase_a: rows here stay home (local
        # index == global index offset), but ctx.gather must still resolve
        # GLOBAL ids — without it each slab would read ITS chunk's rows and
        # silently diverge from the single-device step. Default-arg binding:
        # `chunk` is reassigned below.
        def gather_fn(path, chunk=chunk):
            return jax.lax.all_gather(
                jnp.asarray(read_field(chunk, path)), axis
            ).reshape(-1)

        chunk, emissions = run_logic_phase_masked(
            chunk, empty, inputs, cfg, type_specs, payload_channels,
            gather_fn=gather_fn,
        )
        gid = d * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
        return chunk, jnp.int32(-1), jnp.int32(0), None, (emissions, gid), None

    # ------------------------------------------------------------------
    # phase B: solver grid with per-substep halo refresh
    # ------------------------------------------------------------------
    def phase_b(chunk: World, d):
        t, rb, c = chunk.transform, chunk.rigid_body, chunk.collider
        finite = jnp.isfinite(t.x) & jnp.isfinite(t.y)
        valid = t.active & finite
        gid = d * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
        packed = pack_solver_rows(chunk, gid=gid)
        packed = packed.at[:, 7].set(1.0)  # occupancy lane
        grow = jnp.clip((t.y * inv_s).astype(jnp.int32), 0, R_s - 1)
        dest = jnp.minimum(grow // rps, n_dev - 1)
        rows_i = jax.lax.bitcast_convert_type(packed, jnp.int32)
        recv, sent_slot, ovf = route_out(rows_i, dest, valid, n_dev, cap_b, axis)
        res = jax.lax.bitcast_convert_type(recv, f32)  # [m, 8]
        res_valid = res[:, 7] > 0
        rx, ry = res[:, 0], res[:, 1]

        grow_r = jnp.clip((ry * inv_s).astype(jnp.int32), 0, R_s - 1)
        gcol_r = jnp.clip((rx * inv_s).astype(jnp.int32), 0, C_s - 1)
        lrow = jnp.clip(grow_r - d * rps, 0, rps - 1)
        bins = bin_entities(
            rx, ry, res_valid, geom_s_loc, build_table=False,
            row=lrow, col=gcol_r,
        )
        flat_cells = (rps + 2) * (C_s + 2) * cap_s
        in_grid = res_valid & (bins.rank < cap_s)
        flat_idx = ((bins.row + 1) * (C_s + 2) + (bins.col + 1)) * cap_s + bins.rank
        flat_idx = jnp.where(in_grid, flat_idx, flat_cells)
        grid = scatter_solver_grid(res, flat_idx, rps, C_s, cap_s)

        # border rows <- neighbor slabs' edge rows (full channels, once)
        def fill_border(g):
            fu = jax.lax.ppermute(g[rps : rps + 1], axis, down_perm)
            fd = jax.lax.ppermute(g[1:2], axis, up_perm)
            return g.at[0:1].set(fu).at[rps + 1 : rps + 2].set(fd)

        grid = fill_border(grid)

        def halo_xy(gx, gy):
            st = jnp.stack([gx, gy], axis=0)
            fu = jax.lax.ppermute(st[:, rps : rps + 1], axis, down_perm)
            fd = jax.lax.ppermute(st[:, 1:2], axis, up_perm)
            st = st.at[:, 0:1].set(fu).at[:, rps + 1 : rps + 2].set(fd)
            return st[0], st[1]

        gx, gy, gpx, gpy, gcnt = run_solver_substeps(
            grid, geom_s_loc, cfg, chunk.step_count.astype(jnp.uint32),
            halo_xy=halo_xy, shard_hints=False,
        )

        out_flat = jnp.stack([gx, gy, gpx, gpy], axis=-1).reshape(flat_cells, 4)
        cnt_flat = gcnt.reshape(flat_cells)
        safe_idx = jnp.where(in_grid, flat_idx, 0)
        out_rows = out_flat[safe_idx]
        ret = jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(out_rows, jnp.int32),
                cnt_flat[safe_idx][:, None],
                in_grid.astype(jnp.int32)[:, None],
            ],
            axis=1,
        )
        got, got_ok = route_back(ret, sent_slot, n_dev, cap_b, axis)
        solved = got_ok & (got[:, 5] > 0)
        hx = jax.lax.bitcast_convert_type(got[:, 0], f32)
        hy = jax.lax.bitcast_convert_type(got[:, 1], f32)
        hpx = jax.lax.bitcast_convert_type(got[:, 2], f32)
        hpy = jax.lax.bitcast_convert_type(got[:, 3], f32)

        moving = t.active & rb.active & ~rb.static
        new_x = jnp.where(solved, hx, t.x)
        new_y = jnp.where(solved, hy, t.y)
        new_px = jnp.where(solved, hpx, rb.px)
        new_py = jnp.where(solved, hpy, rb.py)
        new_cc = jnp.where(solved, got[:, 4], 0)

        # overflow (route or cell capacity): boundary-only fallback, exactly
        # the single-device degradation class (ops/physics_grid.py)
        over = valid & ~solved
        ph = cfg.physics
        fx, fpx = _boundary(t.x, rb.px, c.radius, cfg.world_width, moving & over, ph.boundary_elasticity)
        fy, fpy = _boundary(t.y, rb.py, c.radius, cfg.world_height, moving & over, ph.boundary_elasticity)
        new_x = jnp.where(over, fx, new_x)
        new_y = jnp.where(over, fy, new_y)
        new_px = jnp.where(over, fpx, new_px)
        new_py = jnp.where(over, fpy, new_py)

        chunk = chunk.replace(
            transform=t.replace(x=new_x, y=new_y),
            rigid_body=rb.replace(px=new_px, py=new_py, collision_count=new_cc),
        )
        return chunk, jnp.sum(solved, dtype=jnp.int32), ovf

    # ------------------------------------------------------------------
    # the whole step per device
    # ------------------------------------------------------------------
    from ..ops.culling import update_entity_visibility
    from ..ops.physics import update_derived, verlet_move
    from ..render.extract import advance_animation

    def local_step(chunk: World, inputs):
        d = jax.lax.axis_index(axis).astype(jnp.int32)
        if need_neighbors:
            chunk, n_binned, ovf_a, ev, em, sh_out = phase_a(chunk, inputs, d)
            n_binned = jax.lax.psum(n_binned, axis)
        else:
            chunk, n_binned, ovf_a, ev, em, sh_out = phase_a_local(
                chunk, inputs, d
            )

        # merge per-slab pair tables into the replicated global table and
        # diff on every device (identical inputs → identical outputs keeps
        # the event leaves replicated). Same diff + barrier-swap as the
        # single-chip step (see engine._build_step's events block).
        pairs_dropped = jnp.int32(0)
        pair_count = jnp.int32(0)
        if ev_on:
            pairs_loc, count_loc, dropped_loc = ev
            allp = jax.lax.all_gather(pairs_loc, axis).reshape(-1, 2)
            allc = jax.lax.all_gather(count_loc, axis)  # [D]
            ar = jnp.arange(p_loc, dtype=jnp.int32)
            validp = (ar[None, :] < allc[:, None]).reshape(-1)
            rank = jnp.cumsum(validp.astype(jnp.int32)) - 1
            dest = jnp.where(validp & (rank < max_pairs), rank, max_pairs)
            pairs = jnp.full((max_pairs, 2), -1, jnp.int32)
            pairs = pairs.at[dest, 0].set(allp[:, 0], mode="drop")
            pairs = pairs.at[dest, 1].set(allp[:, 1], mode="drop")
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
            # rep_mark re-marks these as replicated for shard_map's
            # replication checker: they ARE device-identical (computed from
            # all_gathered inputs), but the checker cannot infer that
            # through the scatter/sort/barrier ops (tables are small:
            # [max_pairs, 2]); no-op when the check is off
            rep = rep_mark
            pair_count = rep(pair_count)
            pairs_dropped = rep(pairs_dropped)
            chunk = chunk.replace(
                collision_pairs=rep(chunk.collision_pairs),
                collision_pair_count=pair_count,
                prev_collision_pairs=rep(new_prev[0]),
                prev_collision_pair_count=rep(new_prev[1]),
                event_enter=rep(enter), event_enter_count=rep(n_e),
                event_stay=rep(stay), event_stay_count=rep(n_s),
                event_exit=rep(exit_), event_exit_count=rep(n_x),
            )

        chunk = advance_animation(chunk, frame_counts, cfg.dt_ratio)
        chunk = verlet_move(chunk, cfg, cfg.dt_ratio)
        chunk, solver_binned, ovf_b = phase_b(chunk, d)
        chunk = update_derived(chunk, cfg)

        # particle pool: replicated leaf — every device applies the identical
        # update + gathered emission batch (single-chip phase order: move,
        # then claim this frame's tick emissions)
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

                canvas, dirty = stamp_decals(
                    chunk.decal_canvas, chunk.decal_dirty, stamps,
                    decal_textures, cfg,
                )
                # rep_mark re-marks as replicated (see the pool note below):
                # the stamps come from the replicated pool, so every device
                # computed the identical canvas
                chunk = chunk.replace(
                    decal_canvas=rep_mark(canvas),
                    decal_dirty=rep_mark(dirty),
                )
            requests, gids = em
            batch, total_e = _merge_emissions(requests, gids, emit_budget, axis)
            if batch is not None:
                pool, spawned = apply_emission(chunk.particles, batch, total_e)
                # rep_mark re-marks the pool as replicated (see the events
                # block note): the emission scatter consumes all_gathered
                # inputs, device-identical by construction, but the checker
                # cannot infer replication through scatters
                pool = jax.tree.map(rep_mark, pool)
                chunk = chunk.replace(particles=pool)
                p_active = p_active + rep_mark(spawned)
            chunk = update_particle_visibility(chunk, cfg, inputs)

        chunk = update_entity_visibility(chunk, cfg, inputs)

        # shadow sprites: psum the disjoint per-slab [L·M] contributions
        # (each selected light's slots are written by exactly one slab)
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

        chunk = chunk.replace(step_count=chunk.step_count + 1)
        t = chunk.transform
        metrics = {
            "active_count": jax.lax.psum(
                jnp.sum(t.active, dtype=jnp.int32), axis
            ),
            "collision_pair_count": pair_count,
            "collision_pairs_dropped": pairs_dropped,
            "n_binned": n_binned,
            "active_particles": p_active,
            "nonfinite_count": jax.lax.psum(
                jnp.sum(
                    t.active & ~(jnp.isfinite(t.x) & jnp.isfinite(t.y)),
                    dtype=jnp.int32,
                ),
                axis,
            ),
            "solver_binned": jax.lax.psum(solver_binned, axis),
            "route_overflow_logic": jax.lax.psum(ovf_a, axis),
            "route_overflow_solver": jax.lax.psum(ovf_b, axis),
        }
        return chunk, metrics

    w_specs = halo_world_specs(world0, axis)
    in_specs = (w_specs, jax.tree.map(lambda _: P(), engine.input.snapshot()))
    out_specs = (w_specs, {k: P() for k in (
        "active_count", "collision_pair_count", "collision_pairs_dropped",
        "n_binned", "active_particles", "nonfinite_count", "solver_binned",
        "route_overflow_logic", "route_overflow_solver",
    )})

    from ..engine import apply_inputs

    def full_step(world: World, inputs):
        world = apply_inputs(world, inputs)
        return jax.shard_map(
            local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_vma,
        )(world, inputs)

    w_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), w_specs)
    rep = NamedSharding(mesh, P())
    ins_shardings = jax.tree.map(lambda _: rep, engine.input.snapshot())
    met_shardings = jax.tree.map(lambda _: rep, out_specs[1])
    if chunk_steps > 1:
        def chunked(world: World, inputs_timeline):
            return jax.lax.scan(
                lambda w, ins: full_step(w, ins), world, inputs_timeline,
                length=chunk_steps,
            )

        step_fn = jax.jit(
            chunked,
            in_shardings=(w_shardings, ins_shardings),
            out_shardings=(w_shardings, met_shardings),
            donate_argnums=0,
        )
    else:
        step_fn = jax.jit(
            full_step,
            in_shardings=(w_shardings, ins_shardings),
            out_shardings=(w_shardings, met_shardings),
            donate_argnums=0,
        )

    def place_fn(world: World) -> World:
        return jax.tree.map(
            lambda leaf, s: jax.device_put(leaf, s), world, w_shardings
        )

    return step_fn, place_fn
