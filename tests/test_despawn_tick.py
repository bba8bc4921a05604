"""In-step (device) despawn: ticks returning {'despawn': True} clear every
component active flag (gameObject.js:668-691) and the host reconciles pools."""

import jax
import jax.numpy as jnp
import numpy as np

from multithreadedgameengine_tpu import (
    Collider,
    Engine,
    EntityClass,
    RigidBody,
    make_config,
)


class Decaying(EntityClass):
    """Despawns itself when it drifts past x > 500 (device-side decision)."""

    components = [RigidBody, Collider]
    uses_neighbors = False

    @classmethod
    def setup(cls, ctx):
        return {"rigid_body.max_vel": 50.0}

    @classmethod
    def on_spawned(cls, ctx, cfg):
        return {"x": cfg.get("x", 0.0), "y": cfg.get("y", 100.0),
                "vx": cfg.get("vx", 0.0)}

    @staticmethod
    def tick(ctx):
        return {"despawn": ctx.x > 500.0}


def make_engine():
    eng = Engine(make_config(world_width=2000.0, world_height=400.0,
                             physics=dict(max_collision_pairs=1)))
    eng.register_entity_class(Decaying, 8)
    eng.init()
    return eng


def test_device_despawn_and_reconcile():
    eng = make_engine()
    a = eng.spawn("Decaying", x=490.0, vx=20.0)  # crosses 500 next step
    b = eng.spawn("Decaying", x=100.0, vx=0.0)  # stays
    eng.step(2)
    w = jax.device_get(eng.world)
    assert not w.transform.active[a]
    assert not w.rigid_body.active[a]
    assert not w.collider.active[a]
    assert w.transform.active[b]
    # host pool is stale until reconciled
    assert eng.get_pool_stats("Decaying")["active"] == 2
    reclaimed = eng.reconcile_pools()
    assert reclaimed == 1
    assert eng.get_pool_stats("Decaying")["active"] == 1
    # the reclaimed slot can be respawned
    c = eng.spawn("Decaying", x=100.0)
    assert c == a
    eng.step(1)
    assert bool(jax.device_get(eng.world.transform.active)[c])


def test_despawned_entity_stops_moving_and_colliding():
    eng = make_engine()
    a = eng.spawn("Decaying", x=600.0, vx=5.0)  # despawns on first step
    eng.step(1)
    x1 = float(jax.device_get(eng.world.transform.x)[a])
    eng.step(3)
    x2 = float(jax.device_get(eng.world.transform.x)[a])
    assert x1 == x2  # inactive: physics skips it
