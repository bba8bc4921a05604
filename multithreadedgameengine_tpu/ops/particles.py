"""Particle pool physics + emission — the particle worker's compute core
(src/workers/particle_worker.js:413-538) and the ParticleEmitter claim loop
(src/core/ParticleEmitter.js:78-173), vectorized over the ``[P]`` pool.

Pool semantics preserved:
 - lifetime in ms, expiry check before movement (:447-452);
 - z-axis: negative is up; gravity integrates vz toward the floor for every
   live particle (:455); in the air (z<0) position integrates, on the floor
   z clamps to 0 and motion stops (:457-473);
 - stayOnTheFloor particles are collected for decal stamping and despawn on
   landing (:475-481);
 - fadeOnTheFloor: alpha ramps down over the configured ms; despawn at 0
   (:484-497);
 - emission claims the FIRST free slots in pool order (ParticleEmitter.js:117)
   — realized with a stable argsort compaction instead of a linear scan.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..components import Particles
from ..config import EngineConfig


@struct.dataclass
class StampBatch:
    """First-S particles that landed with stayOnTheFloor this step, compacted
    for the decal stamping pass (the particlesToStamp list analog,
    particle_worker.js:518-538)."""

    x: jnp.ndarray  # f32[S]
    y: jnp.ndarray
    tint: jnp.ndarray  # uint32[S]
    scale: jnp.ndarray
    texture_id: jnp.ndarray  # int32[S]
    alpha: jnp.ndarray
    valid: jnp.ndarray  # bool[S]


def update_particles(
    p: Particles, cfg: EngineConfig, dt_ratio: float, collect_stamps: bool
) -> Tuple[Particles, StampBatch, jnp.ndarray]:
    """One particle-physics frame. Returns (pool, stamps, active_count)."""
    dt_ms = jnp.float32(dt_ratio * (1000.0 / 60.0))
    dt = jnp.float32(dt_ratio)

    live = p.active
    new_life = p.current_life + dt_ms
    expired = live & (new_life >= p.lifespan)
    alive = live & ~expired

    vz = jnp.where(alive, p.vz + p.gravity * dt, p.vz)
    in_air = p.z < 0
    move = alive & in_air
    x = jnp.where(move, p.x + p.vx * dt, p.x)
    y = jnp.where(move, p.y + p.vy * dt, p.y)
    z = jnp.where(move, p.z + vz * dt, p.z)

    on_floor = alive & ~in_air
    z = jnp.where(on_floor, 0.0, z)
    vx = jnp.where(on_floor, 0.0, p.vx)
    vy = jnp.where(on_floor, 0.0, p.vy)
    vz = jnp.where(on_floor, 0.0, vz)

    # stayOnTheFloor: stamp + despawn on landing
    landed = on_floor & p.stay_on_the_floor
    alive = alive & ~landed

    # fadeOnTheFloor
    fading = on_floor & ~p.stay_on_the_floor & (p.fade_on_the_floor > 0)
    first_touch = fading & (p.time_on_floor == 0)
    initial_alpha = jnp.where(first_touch, p.alpha, p.initial_alpha)
    time_on_floor = jnp.where(fading, p.time_on_floor + dt_ms, p.time_on_floor)
    progress = jnp.minimum(
        time_on_floor / jnp.maximum(p.fade_on_the_floor, 1e-6), 1.0
    )
    alpha = jnp.where(fading, initial_alpha * (1.0 - progress), p.alpha)
    faded_out = fading & (alpha <= 0.0)
    alive = alive & ~faded_out

    pool = p.replace(
        active=alive,
        x=x, y=y, z=z, vx=vx, vy=vy, vz=vz,
        current_life=jnp.where(live, new_life, p.current_life),
        alpha=alpha,
        time_on_floor=time_on_floor,
        initial_alpha=initial_alpha,
    )

    n_stamps = 0
    if collect_stamps:
        n_stamps = 64
    if n_stamps:
        # first-S landed in pool order: stable argsort on the inverted mask
        order = jnp.argsort(~landed, stable=True)[:n_stamps]
        valid = landed[order]
        stamps = StampBatch(
            x=x[order], y=y[order], tint=p.tint[order], scale=p.scale[order],
            texture_id=p.texture_id[order], alpha=p.alpha[order], valid=valid,
        )
    else:
        z0 = jnp.zeros((0,), jnp.float32)
        stamps = StampBatch(
            x=z0, y=z0, tint=jnp.zeros((0,), jnp.uint32), scale=z0,
            texture_id=jnp.zeros((0,), jnp.int32), alpha=z0,
            valid=jnp.zeros((0,), jnp.bool_),
        )
    return pool, stamps, jnp.sum(alive, dtype=jnp.int32)


def apply_tick_emissions(
    p: Particles,
    requests,
    budget: int,
) -> Tuple[Particles, jnp.ndarray]:
    """Claim pool slots for DEVICE-side tick emissions — the ``"emit"`` tick
    return key (the reference's logic workers calling ParticleEmitter.emit
    inline during tick, ParticleEmitter.js:78-173, demos/predators/
    predator.js:400-444).

    ``requests``: normalized blocks from behavior.run_logic_phase — each a
    dict with ``fields`` ([n_cls, cap] per emit field) and ``valid``
    ([n_cls, cap] slot mask). All blocks flatten and compact (cumsum rank)
    into one dense [budget] batch; requests beyond ``budget`` drop, exactly
    like host emissions beyond the free-slot count. Emission order follows
    class registration order then entity index then slot — deterministic.

    Returns (pool, spawned)."""
    if not requests:
        return p, jnp.int32(0)
    valid = jnp.concatenate([r["valid"].reshape(-1) for r in requests])
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid & (rank < budget), rank, budget)
    batch: Dict[str, jnp.ndarray] = {}
    field_names = requests[0]["fields"].keys()
    for key in field_names:
        vals = jnp.concatenate([r["fields"][key].reshape(-1) for r in requests])
        base = jnp.zeros((budget,), vals.dtype)
        batch[key] = base.at[dest].set(vals, mode="drop")
    total = jnp.minimum(jnp.sum(valid, dtype=jnp.int32), budget)
    return apply_emission(p, batch, total)


def apply_emission(
    p: Particles, batch: Dict[str, jnp.ndarray], n: jnp.ndarray = None
) -> Tuple[Particles, jnp.ndarray]:
    """Claim the first free pool slots (in index order) for a batch of B
    pre-resolved particles (ParticleEmitter.js:117-169: linear first-fit scan
    → cumsum ranking). Excess particles beyond the free count are dropped,
    matching the reference's exhausted-scan behavior. ``n`` (traced) limits
    to the first n batch rows so callers can pad B to a bucket size and
    reuse the compiled program."""
    b = batch["x"].shape[0]
    if b == 0:
        return p, jnp.int32(0)
    limit = jnp.int32(b) if n is None else jnp.minimum(jnp.int32(b), n)
    inactive = ~p.active
    rank = jnp.cumsum(inactive.astype(jnp.int32)) - 1
    take = inactive & (rank < limit)
    sel = jnp.clip(rank, 0, b - 1)

    def fill(cur, key, fill_val=None):
        vals = batch.get(key)
        if vals is None:
            if fill_val is None:
                return cur
            vals = jnp.full((b,), fill_val, cur.dtype)
        return jnp.where(take, jnp.asarray(vals, cur.dtype)[sel], cur)

    p = p.replace(
        active=p.active | take,
        x=fill(p.x, "x"),
        y=fill(p.y, "y"),
        z=fill(p.z, "z"),
        vx=fill(p.vx, "vx"),
        vy=fill(p.vy, "vy"),
        vz=fill(p.vz, "vz"),
        lifespan=fill(p.lifespan, "lifespan"),
        current_life=fill(p.current_life, "current_life", 0.0),
        gravity=fill(p.gravity, "gravity"),
        scale=fill(p.scale, "scale"),
        alpha=fill(p.alpha, "alpha"),
        tint=fill(p.tint, "tint"),
        base_tint=fill(p.base_tint, "tint"),
        texture_id=fill(p.texture_id, "texture_id"),
        fade_on_the_floor=fill(p.fade_on_the_floor, "fade_on_the_floor", 0.0),
        time_on_floor=fill(p.time_on_floor, "time_on_floor", 0.0),
        initial_alpha=fill(p.initial_alpha, "initial_alpha", 0.0),
        stay_on_the_floor=fill(p.stay_on_the_floor, "stay_on_the_floor", False),
        is_on_screen=fill(p.is_on_screen, "is_on_screen", True),
    )
    spawned = jnp.minimum(jnp.sum(inactive, dtype=jnp.int32), limit)
    return p, spawned
