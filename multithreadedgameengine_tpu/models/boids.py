"""Boid flocking — behavioral port of demos/predators/boid.js.

The reference's per-entity neighbor loop (boid.js:137-240: one pass computing
cohesion/separation/alignment with a subclass ``processNeighbor`` hook) maps
to masked vector reductions over the entity's neighbor-slot arrays; the
template-method hook becomes :func:`flocking_forces` returning a
:class:`FlockAux` with the per-slot intermediates so subclasses (Prey flee,
Predator hunt) run their own reductions over the same pass — exactly the
"accumulate during the loop" pattern, without the loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ..behavior import EntityClass, TickCtx
from ..components import (
    Collider,
    RigidBody,
    ShadowCaster,
    SpriteRenderer,
    define_component,
)

# demos/predators/Flocking.js:353-363 — custom user component, auto-pooled
Flocking = define_component(
    "Flocking",
    dict(
        protected_range="f32",
        centering_factor="f32",
        avoid_factor="f32",
        matching_factor="f32",
        turn_factor="f32",
        margin="f32",
    ),
)

MOUSE_ENTITY_TYPE = 0  # Mouse registers first (gameEngine.js:278-281)
MOUSE_ENTITY_INDEX = 0


@dataclass
class FlockAux:
    """Per-slot intermediates shared with subclass hooks (the
    ``neighborContext`` analog, boid.js:169-217)."""

    hook_mask: Any  # bool[S] — neighbors passed to processNeighbor (non-mouse,
    #                 outside protected range; boid.js:192-196 `continue` skips)
    neighbor_type: Any  # int32[S]
    dx: Any  # f32[S] neighbor.x - my.x
    dy: Any
    d2: Any  # f32[S] precomputed squared distance (from the spatial pass)


def flocking_forces(ctx: TickCtx) -> tuple:
    """applyFlockingBehaviors (boid.js:137-240): returns (ax, ay, aux) —
    the cohesion + alignment + separation acceleration contributions.
    Per-neighbor reads go through payload channels (see Boid.neighbor_fields)
    — free slices of the neighbor table rather than random gathers."""
    fl = lambda name: ctx.field(f"flocking.{name}")
    live = ctx.neighbor_mask

    ntype = ctx.neighbor_col("transform.entity_type").astype(jnp.int32)
    not_mouse = live & (ntype != MOUSE_ENTITY_TYPE)  # boid.js:180 skip mouse

    nx = ctx.neighbor_col("transform.x")
    ny = ctx.neighbor_col("transform.y")
    nvx = ctx.neighbor_col("rigid_body.vx")
    nvy = ctx.neighbor_col("rigid_body.vy")
    dx = nx - ctx.x
    dy = ny - ctx.y
    d2 = ctx.neighbor_d2  # spatial worker's precomputed d² (boid.js:185)

    prot2 = fl("protected_range") ** 2
    sep = not_mouse & (d2 < prot2) & (d2 > 0)
    # separation accumulators (all types; boid.js:192-196)
    inv_d2 = jnp.where(sep, 1.0 / jnp.where(d2 > 0, d2, 1.0), 0.0)
    separate_x = jnp.sum(jnp.where(sep, -dx * inv_d2, 0.0))
    separate_y = jnp.sum(jnp.where(sep, -dy * inv_d2, 0.0))

    # the `continue` in the separation branch excludes those neighbors from
    # cohesion/alignment AND from the subclass hook
    rest = not_mouse & ~sep
    same = rest & (ntype == ctx.entity_type)
    same_n = jnp.sum(same)

    center_x = jnp.sum(jnp.where(same, nx, 0.0))
    center_y = jnp.sum(jnp.where(same, ny, 0.0))
    avg_vx = jnp.sum(jnp.where(same, nvx, 0.0))
    avg_vy = jnp.sum(jnp.where(same, nvy, 0.0))

    dt = ctx.dt_ratio
    inv_n = jnp.where(same_n > 0, 1.0 / jnp.maximum(same_n, 1), 0.0)
    has_same = same_n > 0
    # cohesion (boid.js:221-226)
    ax = jnp.where(
        has_same, (center_x * inv_n - ctx.x) * fl("centering_factor") * dt, 0.0
    )
    ay = jnp.where(
        has_same, (center_y * inv_n - ctx.y) * fl("centering_factor") * dt, 0.0
    )
    # alignment (boid.js:228-231)
    ax += jnp.where(
        has_same, (avg_vx * inv_n - ctx.vx) * fl("matching_factor") * dt, 0.0
    )
    ay += jnp.where(
        has_same, (avg_vy * inv_n - ctx.vy) * fl("matching_factor") * dt, 0.0
    )
    # separation (boid.js:234-236)
    ax += separate_x * fl("avoid_factor") * dt
    ay += separate_y * fl("avoid_factor") * dt

    return ax, ay, FlockAux(hook_mask=rest, neighbor_type=ntype, dx=dx, dy=dy, d2=d2)


def avoid_mouse_force(ctx: TickCtx) -> tuple:
    """avoidMouse (boid.js:281-316): repel from the mouse when a button is
    down and the mouse (entity 0) appears in this boid's neighbor list, using
    the spatial pass's precomputed d²."""
    slot = ctx.neighbor_mask & (ctx.neighbor_ids == MOUSE_ENTITY_INDEX)
    present = jnp.any(slot)
    d2 = jnp.sum(jnp.where(slot, ctx.neighbor_d2, 0.0))
    engaged = ctx.mouse_down & (ctx.inputs.mouse_x != 0) & present & (d2 > 0)

    w = ctx.world
    dx = w.transform.x[MOUSE_ENTITY_INDEX] - ctx.x
    dy = w.transform.y[MOUSE_ENTITY_INDEX] - ctx.y
    strength = 1000.0
    safe_d2 = jnp.where(d2 > 0, d2, 1.0)
    ax = jnp.where(engaged, -(dx / safe_d2) * strength * ctx.dt_ratio, 0.0)
    ay = jnp.where(engaged, -(dy / safe_d2) * strength * ctx.dt_ratio, 0.0)
    return ax, ay


def keep_within_bounds_force(ctx: TickCtx) -> tuple:
    """keepWithinBounds (boid.js:322-341)."""
    margin = ctx.field("flocking.margin")
    turn = ctx.field("flocking.turn_factor") * ctx.dt_ratio
    ww = ctx.config.world_width
    wh = ctx.config.world_height
    ax = jnp.where(ctx.x < margin, turn, 0.0) - jnp.where(ctx.x > ww - margin, turn, 0.0)
    ay = jnp.where(ctx.y < margin, turn, 0.0) - jnp.where(ctx.y > wh - margin, turn, 0.0)
    return ax, ay


class Boid(EntityClass):
    """boid.js — base flocking entity."""

    components = [RigidBody, Collider, SpriteRenderer, Flocking, ShadowCaster]
    # per-neighbor fields the flocking pass reads: ride the neighbor table as
    # payload channels (x/y are always channels 1-2)
    neighbor_fields = (
        "transform.x", "transform.y",
        "rigid_body.vx", "rigid_body.vy", "transform.entity_type",
    )

    @classmethod
    def setup(cls, ctx):
        """boid.js:41-73 (per-type constants; radius 10, visualRange 100)."""
        return {
            "rigid_body.max_vel": 10.0,
            "rigid_body.max_acc": 0.2,
            "rigid_body.min_speed": 0.0,
            "rigid_body.friction": 0.01,
            "collider.radius": 10.0,
            "collider.visual_range": 100.0,
            "sprite.scale_x": 1.0,
            "sprite.scale_y": 1.0,
            "sprite.anchor_x": 0.5,
            "sprite.anchor_y": 0.5,
            "flocking.protected_range": 20.0,  # radius * 2
            "flocking.centering_factor": 0.001,
            "flocking.avoid_factor": 0.3,
            "flocking.matching_factor": 0.1,
            "flocking.turn_factor": 0.01,
            "flocking.margin": 20.0,
            "shadow.shadow_radius": 10.0,
        }

    @classmethod
    def on_spawned(cls, ctx, spawn_config):
        """boid.js:83-101: position defaults to rng() * world extent."""
        cfg = ctx.config
        out = {
            "x": spawn_config.get("x", ctx.rng() * cfg.world_width),
            "y": spawn_config.get("y", ctx.rng() * cfg.world_height),
            "rotation": 0.0,
            "vx": spawn_config.get("vx", 0.0),
            "vy": spawn_config.get("vy", 0.0),
            "rigid_body.ax": 0.0,
            "rigid_body.ay": 0.0,
        }
        if ctx.sprites is not None and "bunny" in ctx.sprites.textures:
            # setSprite("bunny"): static texture — spritesheet_id 0 with the
            # texture id carried in animation_state (registry convention)
            out["sprite.spritesheet_id"] = 0
            out["sprite.animation_state"] = ctx.sprites.texture_id("bunny")
        return out

    @staticmethod
    def tick(ctx: TickCtx):
        """boid.js:116-125."""
        fx, fy, _aux = flocking_forces(ctx)
        mx, my = avoid_mouse_force(ctx)
        bx, by = keep_within_bounds_force(ctx)
        return {
            "rigid_body.ax": ctx.ax + fx + mx + bx,
            "rigid_body.ay": ctx.ay + fy + my + by,
        }
