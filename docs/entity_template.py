"""Canonical entity-class template — the analog of docs/ENTITY_TEMPLATE.js.

The reference's authoring pattern is "2 static lines + lifecycle hooks"
(docs/DEV_EXPERIENCE_GUIDE.md): declare components, then override setup /
onSpawned / tick / collision / screen hooks. The TPU port keeps the same
lifecycle, split by where the code runs:

    host (Python, between steps)  : setup, on_spawned, on_despawned,
                                    on_collision_enter/stay/exit,
                                    on_screen_enter/exit
    device (JAX, inside the step) : tick

Copy this file to start a new entity type.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from multithreadedgameengine_tpu import (
    Collider,
    EntityClass,
    RigidBody,
    SpriteRenderer,
    define_component,
)

# Custom per-entity state: a plain {field: dtype} schema, auto-pooled like
# every component (the analog of subclassing Component with ARRAY_SCHEMA).
MyBehavior = define_component("MyBehavior", dict(aggression="f32", energy="f32"))


class MyEntity(EntityClass):
    # 1) components this entity uses (Transform is always included)
    components = [RigidBody, Collider, SpriteRenderer, MyBehavior]

    # 2) set False if tick() never reads ctx.neighbor_* — lets the engine
    #    skip building neighbor lists entirely (big win for physics-only types)
    uses_neighbors = True

    # ------------------------------------------------------------------
    # HOST lifecycle
    # ------------------------------------------------------------------
    @classmethod
    def setup(cls, ctx):
        """Once per slot at engine.init(). Return {'component.field': value}
        where value is a scalar or a [count] array. ctx.rng is the engine's
        seeded mulberry32 stream; ctx.config is the EngineConfig; ctx.sprites
        the SpriteRegistry."""
        return {
            "rigid_body.max_vel": 10.0,
            "collider.radius": 10.0,
            "collider.visual_range": 100.0,
            "my_behavior.aggression": 0.5,
        }

    @classmethod
    def on_spawned(cls, ctx, spawn_config):
        """Every spawn, after the engine's component resets and the caller's
        spawn_config. Aliases work: 'x', 'y', 'vx', 'vy', 'rotation'."""
        return {
            "x": spawn_config.get("x", ctx.rng() * ctx.config.world_width),
            "y": spawn_config.get("y", ctx.rng() * ctx.config.world_height),
            "my_behavior.energy": 1.0,
        }

    @classmethod
    def on_despawned(cls, index):
        pass

    # collision events need EngineConfig(logic=dict(collision_events=True));
    # ctx carries cached positions/types + the particle emitter
    @staticmethod
    def on_collision_enter(ctx, me, other):
        pass

    # OPTIONAL vectorized variant: when `<hook>_batch` is defined it is
    # preferred over the scalar hook — ONE call per frame per kind with
    # (me, other) int arrays holding every pair row whose `me` side is this
    # class (both orientations, table order). Use ctx.x.take(ids) /
    # ctx.entity_type.take(ids) for vector reads and emitter.emit_batch for
    # vectorized particle bursts — at 15k-entity scenes the per-pair Python
    # loop costs ~2 ms/frame, the batch path microseconds (see
    # models/predators.py Predator.on_collision_stay_batch).
    # @staticmethod
    # def on_collision_enter_batch(ctx, me, other):
    #     ...

    # screen events need logic=dict(screen_events=True)
    @staticmethod
    def on_screen_enter(index):
        pass

    # ------------------------------------------------------------------
    # DEVICE tick — pure JAX, vmapped per entity over this class's slots
    # ------------------------------------------------------------------
    @staticmethod
    def tick(ctx):
        """Read per-entity state via ctx (ctx.x, ctx.vx, ctx.field(path)),
        neighbors via ctx.neighbor_ids / ctx.neighbor_d2 / ctx.neighbor_mask
        and gathers like ctx.gather('transform.x'); inputs via ctx.mouse_*,
        ctx.key('w'). Return {'component.field': new_value} self-writes
        (masked to active entities automatically), and optionally
        {'despawn': bool} to despawn in-step."""
        # example: accelerate toward the mouse while a button is held
        dx = ctx.mouse_x - ctx.x
        dy = ctx.mouse_y - ctx.y
        pull = ctx.mouse_down
        return {
            "rigid_body.ax": jnp.where(pull, dx * 0.001, ctx.ax),
            "rigid_body.ay": jnp.where(pull, dy * 0.001, ctx.ay),
        }


if __name__ == "__main__":
    from multithreadedgameengine_tpu import Engine

    eng = Engine(world_width=800, world_height=600, seed=7)
    eng.register_entity_class(MyEntity, 100)
    eng.init()
    for _ in range(50):
        eng.spawn("MyEntity")
    eng.step(60)
    print(eng.stats())
