"""Verlet physics: integrate → substepped constraints → derived properties.

Replaces the reference physics worker (src/workers/physics_worker.js):
 - ``moveBallsVerlet`` (:240-316): implicit velocity with damping, gravity and
   logic acceleration, per-axis speed clamp, writeback of x/px/vx, ax reset;
 - ``applyConstraintsVerlet`` (:323-395): world-boundary clamp with bounce via
   reflected previous position, then pairwise circle separation over the
   neighbor lists, run ``sub_step_count`` times;
 - ``resolveCollisionsVerlet`` (:405-568): positional correction
   ``depth * responseStrength`` split half/half (full push when the other body
   is static), trigger pairs detected but not resolved, per-entity collision
   counting, pair recording for Enter/Stay/Exit callbacks;
 - ``updateDerivedProperties`` (:575-604): speed + velocityAngle (atan2 + π/2)
   gated by minSpeedForRotation.

Parallelization note (SURVEY.md §7.2): the reference mutates positions in
place pair-by-pair (Gauss–Seidel) within a substep; this kernel evaluates all
pairs of a substep against the substep's starting positions and accumulates
corrections (Jacobi). Each pair still contributes exactly the reference's
half/half (or full-vs-static) correction, each substep re-reads the updated
positions, so the two schemes agree exactly for isolated pairs and converge to
the same configurations for stacks — trajectory tests compare with tolerance
bands (exact for collision-free and single-pair scenarios).

The pair (i, j) is resolved from BOTH entities' neighbor lists (each side
applies its own half), which is equivalent to the reference's process-once
``i < j`` loop applying both halves, whenever neighbor lists are symmetric
(uniform visual ranges — true of every reference demo).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import EngineConfig
from ..state import World
from .spatial import NeighborLists

#: per-row cap of the pair-recording top-k prefilter (record_collision_pairs)
#: — also bounds how many pairs one entity can contribute per frame, which
#: the engine uses to size the chunked event log under hook-scoped recording
PER_ENTITY = 16


def _pair_hash_dir(
    i: jnp.ndarray, j: jnp.ndarray, salt: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic pseudo-random unit direction for exact-overlap separation.

    The reference draws an angle ``rng() * 2π`` (physics_worker.js:472) — a
    shared scalar stream is unavailable to a data-parallel kernel, so the
    direction is a pair-consistent integer hash instead: both members of a
    coincident pair derive the SAME direction and push opposite ways.

    Implementation note: the direction comes from normalizing a hash point in
    a square (one rsqrt) rather than cos/sin of a hash angle — at 1M entities
    the grid solvers evaluate this for every candidate pair slot, and the two
    transcendentals per pair dominated the Pallas pair kernel. The angle
    distribution is square-ish rather than uniform; the jitter only needs
    pair-consistency and symmetry (documented deviation either way).
    """
    a = jnp.minimum(i, j).astype(jnp.uint32)
    b = jnp.maximum(i, j).astype(jnp.uint32)
    h = a * jnp.uint32(0x9E3779B1) ^ b * jnp.uint32(0x85EBCA77) ^ salt.astype(jnp.uint32)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    # low/high 16 bits -> int32-representable (Mosaic has no uint32->f32 cast)
    hx = (h & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32) - 32767.5
    hy = ((h >> 16) & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(
        jnp.float32
    ) - 32767.5
    inv = jax.lax.rsqrt(hx * hx + hy * hy)  # never 0: the ±0.5 offset
    return hx * inv, hy * inv


def verlet_move(world: World, cfg: EngineConfig, dt_ratio: float) -> World:
    """moveBallsVerlet (physics_worker.js:240-316)."""
    ph = cfg.physics
    t, rb = world.transform, world.rigid_body
    moving = t.active & rb.active & ~rb.static

    damping = jnp.float32(ph.verlet_damping)
    gravity_scale = jnp.float32(dt_ratio) ** 2
    gx, gy = ph.gravity

    dx = (t.x - rb.px) * damping + gravity_scale * gx + rb.ax * dt_ratio
    dy = (t.y - rb.py) * damping + gravity_scale * gy + rb.ay * dt_ratio

    # per-axis clamp to maxVel (default cap 100, physics_worker.js:284)
    max_speed = jnp.where(rb.max_vel > 0, rb.max_vel, 100.0)
    dx = jnp.clip(dx, -max_speed, max_speed)
    dy = jnp.clip(dy, -max_speed, max_speed)

    new_x = jnp.where(moving, t.x + dx, t.x)
    new_y = jnp.where(moving, t.y + dy, t.y)
    return world.replace(
        transform=t.replace(x=new_x, y=new_y),
        rigid_body=rb.replace(
            px=jnp.where(moving, t.x, rb.px),
            py=jnp.where(moving, t.y, rb.py),
            vx=jnp.where(moving, dx / dt_ratio, rb.vx),
            vy=jnp.where(moving, dy / dt_ratio, rb.vy),
            ax=jnp.where(moving, 0.0, rb.ax),
            ay=jnp.where(moving, 0.0, rb.ay),
        ),
    )


def _boundary(
    x: jnp.ndarray,
    px: jnp.ndarray,
    r: jnp.ndarray,
    lo_extent: float,
    moving: jnp.ndarray,
    elasticity: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-axis boundary clamp + bounce (physics_worker.js:344-376).

    The reference reflects the previous position about the clamped coordinate:
    ``px = x' + (x' - px) * e``. Low/high clamps cannot both fire in a frame.
    """
    clamped = jnp.clip(x, r, lo_extent - r)
    hit = moving & (clamped != x)
    new_px = jnp.where(hit, clamped + (clamped - px) * elasticity, px)
    return jnp.where(moving, clamped, x), new_px


@struct.dataclass
class PairInvariants:
    """Substep-invariant per-candidate data, gathered ONCE per frame.

    Collider attributes (active/trigger/static/radius) do not change within a
    frame, so the expensive [N, M] neighbor gathers for them are hoisted out
    of the substep loop; flags ride one packed int32 gather. Only positions
    must be re-gathered inside each substep (Gauss–Seidel reads current
    positions, physics_worker.js:447-455)."""

    j: jnp.ndarray  # int32[N, M] candidate ids (-1 empty)
    j_safe: jnp.ndarray  # int32[N, M]
    pair_ok: jnp.ndarray  # bool[N, M] both sides active+collider
    min_dist: jnp.ndarray  # f32[N, M] r_i + r_j
    respond_scale: jnp.ndarray  # f32[N, M] 0 / 0.5 / 1.0 response share for i
    zero_scale: jnp.ndarray  # f32[N, M] exact-overlap share (0 / 1 / 2) * sign
    zero_ux: jnp.ndarray  # f32[N, M] pair-hash jitter unit direction x
    zero_uy: jnp.ndarray  # f32[N, M] pair-hash jitter unit direction y


def build_pair_invariants(
    nbr: NeighborLists,
    active: jnp.ndarray,
    collider_active: jnp.ndarray,
    radius: jnp.ndarray,
    is_trigger: jnp.ndarray,
    is_static: jnp.ndarray,
    salt: jnp.ndarray,
) -> PairInvariants:
    n, _m = nbr.ids.shape
    j = nbr.ids
    j_safe = jnp.maximum(j, 0)
    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]

    # one packed gather: bit0 = active&collider, bit1 = trigger, bit2 = static;
    # radius folded into the same f32 via sign (radius >= 0 always)
    flags = (
        (active & collider_active).astype(jnp.int32)
        | (is_trigger.astype(jnp.int32) << 1)
        | (is_static.astype(jnp.int32) << 2)
    )
    flags_j = flags[j_safe]
    ok_j = (j >= 0) & ((flags_j & 1) == 1)
    trig_j = (flags_j & 2) != 0
    static_j = (flags_j & 4) != 0
    radius_j = radius[j_safe]

    ok_i = (active & collider_active)[:, None]
    pair_ok = ok_i & ok_j
    min_dist = radius[:, None] + radius_j

    trigger_either = is_trigger[:, None] | trig_j
    static_i = is_static[:, None]
    # i's share: half when both dynamic, full when j is static, none when i is
    # static or either is a trigger (physics_worker.js:513-547)
    respond_scale = jnp.where(
        trigger_either | static_i, 0.0, jnp.where(static_j, 1.0, 0.5)
    )
    # exact-overlap jitter share: the i side of the pair pushes +, j side -;
    # doubled when j is static (physics_worker.js:459-506)
    sign = jnp.where(i_idx < j, 1.0, -1.0)
    zero_scale = jnp.where(
        trigger_either | static_i, 0.0, jnp.where(static_j, 2.0, 1.0)
    ) * sign
    zero_ux, zero_uy = _pair_hash_dir(i_idx, j, salt)
    return PairInvariants(
        j=j, j_safe=j_safe, pair_ok=pair_ok, min_dist=min_dist,
        respond_scale=respond_scale, zero_scale=zero_scale,
        zero_ux=zero_ux, zero_uy=zero_uy,
    )


def resolve_collisions_pass(
    x: jnp.ndarray,
    y: jnp.ndarray,
    inv: PairInvariants,
    response_strength: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One Jacobi separation pass (resolveCollisionsVerlet,
    physics_worker.js:405-568). Returns (dx, dy, per-entity overlap count,
    overlap mask [N, M] for pair recording)."""
    dx = x[:, None] - x[inv.j_safe]
    dy = y[:, None] - y[inv.j_safe]
    d2 = dx * dx + dy * dy
    overlap = inv.pair_ok & (d2 < inv.min_dist * inv.min_dist)

    # normal case: push along the separation normal (rsqrt: one reciprocal
    # square root instead of sqrt + divide — the pair passes are VPU-bound)
    inv_dist = jnp.where(d2 > 0, jax.lax.rsqrt(d2), 0.0)
    dist = d2 * inv_dist
    depth = inv.min_dist - dist
    corr = depth * response_strength * inv.respond_scale
    push_x = dx * inv_dist * corr
    push_y = dy * inv_dist * corr

    # exact-overlap case (dist == 0): deterministic pair-hash jitter standing
    # in for the reference's rng() angle (physics_worker.js:459-506)
    zero = d2 == 0
    sep = jnp.float32(0.001)
    zpush_x = inv.zero_ux * sep * inv.zero_scale
    zpush_y = inv.zero_uy * sep * inv.zero_scale

    contrib_x = jnp.where(overlap, jnp.where(zero, zpush_x, push_x), 0.0)
    contrib_y = jnp.where(overlap, jnp.where(zero, zpush_y, push_y), 0.0)

    disp_x = jnp.sum(contrib_x, axis=1)
    disp_y = jnp.sum(contrib_y, axis=1)
    count = jnp.sum(overlap, axis=1, dtype=jnp.int32)
    return disp_x, disp_y, count, overlap


def apply_constraints(
    world: World, nbr: NeighborLists, cfg: EngineConfig
) -> Tuple[World, jnp.ndarray]:
    """Substepped boundary + collision constraints (physics_worker.js:203-217,
    :323-395). Returns (world, final-substep overlap mask [N, K])."""
    ph = cfg.physics
    t, rb, c = world.transform, world.rigid_body, world.collider
    moving = t.active & rb.active & ~rb.static

    n, m = nbr.ids.shape
    inv = build_pair_invariants(
        nbr, t.active, c.active, c.radius, c.is_trigger, rb.static,
        world.step_count.astype(jnp.uint32),
    )

    def substep(step_i, carry):
        x, y, px, py, cnt, _ = carry
        # boundary clamp + bounce
        x, px = _boundary(x, px, c.radius, cfg.world_width, moving, ph.boundary_elasticity)
        y, py = _boundary(y, py, c.radius, cfg.world_height, moving, ph.boundary_elasticity)
        # pairwise separation (Jacobi pass over neighbor lists)
        dx, dy, sub_cnt, overlap = resolve_collisions_pass(
            x, y, inv, ph.collision_response_strength
        )
        return (x + dx, y + dy, px, py, cnt + sub_cnt, overlap)

    init = (
        t.x, t.y, rb.px, rb.py,
        jnp.zeros_like(rb.collision_count),
        jnp.zeros((n, m), jnp.bool_),
    )
    x, y, px, py, cnt, overlap = jax.lax.fori_loop(
        0, ph.sub_step_count, substep, init
    )
    world = world.replace(
        transform=t.replace(x=x, y=y),
        rigid_body=rb.replace(px=px, py=py, collision_count=cnt),
    )
    return world, overlap


def update_derived(world: World, cfg: EngineConfig) -> World:
    """speed + velocityAngle (updateDerivedProperties, physics_worker.js:575-604)."""
    t, rb = world.transform, world.rigid_body
    on = t.active & rb.active
    speed = jnp.sqrt(rb.vx * rb.vx + rb.vy * rb.vy)
    angle = jnp.arctan2(rb.vy, rb.vx) + jnp.float32(jnp.pi / 2)
    return world.replace(
        rigid_body=rb.replace(
            speed=jnp.where(on, speed, rb.speed),
            velocity_angle=jnp.where(
                on & (speed > cfg.physics.min_speed_for_rotation),
                angle,
                rb.velocity_angle,
            ),
        )
    )


def record_collision_pairs(
    world: World,
    ids: jnp.ndarray,
    rec: jnp.ndarray,
    cfg: EngineConfig,
    row_ids: "jnp.ndarray | None" = None,
) -> Tuple[World, jnp.ndarray]:
    """Compact a recording mask into the ``[max_pairs, 2]`` pair table
    (collisionData SAB analog, physics_worker.js:444, :501-505, :554-559).

    ``ids``/``rec`` are [R, S] (neighbor ids / pairs to record); pair-once
    dedup must ALREADY be applied by the caller (``ids > i`` for full
    recording; the hooked-side rule for hook-scoped recording). ``row_ids``
    maps rows to global entity indices when the rows are a subset of the
    world (hook-scoped recording slices the hooked classes' ranges);
    ``None`` means row r IS entity r.

    Two-stage compaction: scattering the full [R, S] mask costs per-SOURCE
    index on TPU (hundreds of ms at flocking scale), so each row's pairs
    are first squeezed to its top ``PER_ENTITY`` slots with top_k, and only
    the [R × PER_ENTITY] survivor set feeds the global cumsum+scatter. More
    than PER_ENTITY simultaneous new partners per row drops the excess —
    the reference drops pairs past maxCollisionPairs globally the same way.

    Returns (world, dropped): ``dropped`` counts pairs lost to EITHER the
    per-row top-k prefilter or the global max_pairs cap, surfaced as the
    ``collision_pairs_dropped`` step metric so silent Enter/Stay loss in
    dense piles is observable (VERDICT r1 weak #4)."""
    max_pairs = world.collision_pairs.shape[0]
    pairs, count, dropped = compact_pairs(ids, rec, max_pairs, row_ids)
    world = world.replace(collision_pairs=pairs, collision_pair_count=count)
    return world, dropped


def compact_pairs(
    ids: jnp.ndarray,
    rec: jnp.ndarray,
    max_pairs: int,
    row_ids: "jnp.ndarray | None" = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The compaction core of :func:`record_collision_pairs` (also used by
    the halo step for per-slab recording): top-``PER_ENTITY`` prefilter per
    row, then cumsum-rank scatter into a dense [max_pairs, 2] table (-1
    padded). Returns (pairs, count, dropped)."""
    r, s = ids.shape
    total = jnp.sum(rec, dtype=jnp.int32)

    p = min(PER_ENTITY, s)
    v, sel = jax.lax.top_k(rec.astype(jnp.int32), p)  # [R, p]
    j_top = jnp.take_along_axis(ids, sel, axis=1)
    rec_top = v > 0

    i_rows = (
        jnp.arange(r, dtype=jnp.int32)
        if row_ids is None
        else jnp.asarray(row_ids, jnp.int32)
    )
    flat_rec = rec_top.reshape(-1)
    flat_i = jnp.broadcast_to(i_rows[:, None], (r, p)).reshape(-1)
    flat_j = j_top.reshape(-1)
    rank = jnp.cumsum(flat_rec.astype(jnp.int32)) - 1
    dest = jnp.where(flat_rec & (rank < max_pairs), rank, max_pairs)
    pairs = jnp.full((max_pairs, 2), -1, jnp.int32)
    pairs = pairs.at[dest, 0].set(flat_i, mode="drop")
    pairs = pairs.at[dest, 1].set(flat_j, mode="drop")
    count = jnp.minimum(jnp.sum(flat_rec, dtype=jnp.int32), max_pairs)
    return pairs, count, total - count


def physics_step(
    world: World,
    nbr: "NeighborLists | None",
    cfg: EngineConfig,
    dt_ratio: float,
    solver_geom=None,
    return_overflow: bool = False,
) -> World:
    """Full physics frame (updateVerlet, physics_worker.js:145-233).

    Constraint backend selection (cfg.physics.solver):
      - 'grid' / 'auto': the grid-resident solver (ops/physics_grid.py) — the
        fast path; requires a solver geometry and no collision-event pair
        recording (events need the per-entity overlap mask).
      - 'neighbors': the reference-faithful neighbor-list Jacobi solver —
        also the path used whenever collision events are enabled or no
        geometry was resolved.

    ``return_overflow=True`` additionally returns the grid solver's
    cell-capacity overflow count (entities degraded to boundary-only this
    frame; 0 on the neighbor-list path) so the engine can surface it as the
    ``solver_overflow`` metric.
    """
    world = verlet_move(world, cfg, dt_ratio)
    # traced zero, not jnp.int32(0): fresh concrete constants in a step
    # program's outputs feed jax 0.9's nondeterministic constant-lifting
    # (see engine._zero_metrics note)
    overflow = world.step_count.astype(jnp.int32) * 0
    use_grid = (
        cfg.physics.solver in ("auto", "grid", "pallas")
        and solver_geom is not None
    )
    if use_grid:
        from .physics_grid import grid_constraints

        world, _n_binned, overflow = grid_constraints(world, cfg, solver_geom)
    else:
        if nbr is None:
            raise ValueError(
                "neighbor-list solver requires neighbor lists "
                "(cfg.physics.solver='neighbors')"
            )
        world, _overlap = apply_constraints(world, nbr, cfg)
    world = update_derived(world, cfg)
    # NOTE: collision-pair recording for Enter/Stay/Exit callbacks lives in
    # the engine's step (record_collision_pairs over the spatial payload) —
    # evaluated at frame-start positions, matching the one-frame-stale pairs
    # the reference's logic workers actually consume (the physics worker
    # writes collisionData that logic reads on ITS next frame,
    # logic_worker.js:429-443).
    if return_overflow:
        return world, overflow
    return world
