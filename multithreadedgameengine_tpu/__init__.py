"""multithreadedgameengine_tpu — a TPU-native entity-simulation framework with
the capabilities of brotochola/MultithreadedGameEngine ("WeedJS").

The reference runs spatial hashing, game logic, Verlet physics, particles and
rendering as free-running Web Workers over SharedArrayBuffers; here the same
four-stage inner loop is one device-resident JAX program over a SoA pytree.
See SURVEY.md for the layer map and the architecture translation.

Public surface (the WEED namespace analog, reference src/index.js):

    from multithreadedgameengine_tpu import (
        Engine, EntityClass, make_config,
        Transform, RigidBody, Collider, SpriteRenderer, LightEmitter,
        ShadowCaster, define_component,
    )
"""

from .behavior import EntityClass, TickCtx, read_field, write_field
from .components import (
    Collider,
    LightEmitter,
    MouseComponent,
    Particles,
    RigidBody,
    ShadowCaster,
    SpriteRenderer,
    Transform,
    define_component,
)
from .config import (
    EngineConfig,
    LightingConfig,
    LogicConfig,
    ParticleConfig,
    PhysicsConfig,
    RendererConfig,
    SpatialConfig,
    make_config,
)
from .engine import Engine, FramePlan, Mouse
from .inputs import InputController, InputState
from .rng import Mulberry32
from .state import World, make_world

__version__ = "0.1.0"

__all__ = [
    "Engine",
    "FramePlan",
    "EntityClass",
    "TickCtx",
    "Mouse",
    "World",
    "make_world",
    "make_config",
    "EngineConfig",
    "SpatialConfig",
    "PhysicsConfig",
    "LogicConfig",
    "ParticleConfig",
    "LightingConfig",
    "RendererConfig",
    "Transform",
    "RigidBody",
    "Collider",
    "SpriteRenderer",
    "MouseComponent",
    "LightEmitter",
    "ShadowCaster",
    "Particles",
    "define_component",
    "InputController",
    "InputState",
    "Mulberry32",
    "read_field",
    "write_field",
]
