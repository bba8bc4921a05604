"""Component schemas — the SoA state of the world.

Each component is a ``flax.struct.dataclass`` whose fields are dense device
arrays of shape ``[N]`` (one slot per entity — the reference's dense
allocation, where ``entityIndex == componentIndex`` for every component;
src/core/gameObject.js:104-127, gameEngine.js:570-595).

Schemas mirror the reference's ``ARRAY_SCHEMA`` declarations field-for-field:

- Transform       → src/components/Transform.js:8-17
- RigidBody       → src/components/RigidBody.js:9-47
- Collider        → src/components/Collider.js:8-46
- SpriteRenderer  → src/components/SpriteRenderer.js:8-41
- MouseComponent  → src/components/MouseComponent.js:9-17
- LightEmitter    → src/components/LightEmitter.js:4-9
- ShadowCaster    → src/components/ShadowCaster.js:12-25
- ParticleComponent (separate pool) → src/components/ParticleComponent.js:9-51

dtype policy for TPU: float32 for all continuous state; int32 for ids/counters
(narrower ints buy nothing inside XLA compute and complicate layouts); bool_
for flags. The reference's u8/u16 packing was a SharedArrayBuffer bandwidth
concern that does not apply to HBM-resident pytrees.

Custom (user) components are built at runtime with :func:`define_component`,
the analog of subclassing ``Component`` with a custom ``ARRAY_SCHEMA``
(src/core/Component.js:9-11; demo example demos/predators/Flocking.js:353-363).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# name -> (dtype, default) — defaults used when (re)initializing a slot on spawn
FieldSpec = Tuple[jnp.dtype, float]


class ComponentMeta(type):
    """Keeps a registry of all component types by name (the analog of the
    reference's componentPools keying by class name, gameEngine.js:130-136)."""

    registry: Dict[str, type] = {}

    def __new__(mcls, name, bases, ns):
        cls = super().__new__(mcls, name, bases, ns)
        if ns.get("SCHEMA"):
            ComponentMeta.registry[name] = cls
        return cls


def _zeros(n: int, dtype) -> jnp.ndarray:
    return jnp.zeros((n,), dtype=dtype)


@struct.dataclass
class Transform:
    """Transform.js:8-17 — active, entityType, x, y, rotation."""

    active: jnp.ndarray  # bool[N]
    entity_type: jnp.ndarray  # int32[N]
    x: jnp.ndarray  # f32[N]
    y: jnp.ndarray  # f32[N]
    rotation: jnp.ndarray  # f32[N]

    @staticmethod
    def zeros(n: int) -> "Transform":
        return Transform(
            active=_zeros(n, jnp.bool_),
            entity_type=_zeros(n, jnp.int32),
            x=_zeros(n, jnp.float32),
            y=_zeros(n, jnp.float32),
            rotation=_zeros(n, jnp.float32),
        )


@struct.dataclass
class RigidBody:
    """RigidBody.js:9-47. All schema fields carried, including the
    game-logic-only knobs (mass/inertia/drag/…) the reference physics worker
    never reads (SURVEY.md §2.2) — they are user-visible state."""

    active: jnp.ndarray  # bool[N]
    static: jnp.ndarray  # bool[N]
    vx: jnp.ndarray
    vy: jnp.ndarray
    ax: jnp.ndarray
    ay: jnp.ndarray
    px: jnp.ndarray  # Verlet previous position
    py: jnp.ndarray
    angular_velocity: jnp.ndarray
    angular_accel: jnp.ndarray
    mass: jnp.ndarray
    inv_mass: jnp.ndarray
    inertia: jnp.ndarray
    inv_inertia: jnp.ndarray
    drag: jnp.ndarray
    angular_drag: jnp.ndarray
    max_vel: jnp.ndarray
    max_acc: jnp.ndarray
    min_speed: jnp.ndarray
    friction: jnp.ndarray
    velocity_angle: jnp.ndarray
    speed: jnp.ndarray
    collision_count: jnp.ndarray  # int32[N]

    @staticmethod
    def zeros(n: int) -> "RigidBody":
        f = lambda: _zeros(n, jnp.float32)
        return RigidBody(
            active=_zeros(n, jnp.bool_),
            static=_zeros(n, jnp.bool_),
            vx=f(), vy=f(), ax=f(), ay=f(), px=f(), py=f(),
            angular_velocity=f(), angular_accel=f(),
            mass=f(), inv_mass=f(), inertia=f(), inv_inertia=f(),
            drag=f(), angular_drag=f(),
            max_vel=f(), max_acc=f(), min_speed=f(), friction=f(),
            velocity_angle=f(), speed=f(),
            collision_count=_zeros(n, jnp.int32),
        )


@struct.dataclass
class Collider:
    """Collider.js:8-46. Only circle shapes participate in physics, exactly as
    in the reference (box/poly/layer/mask are declared-but-dormant state)."""

    active: jnp.ndarray  # bool[N]
    shape_type: jnp.ndarray  # int32[N]: 0=circle, 1=box, 2=poly
    offset_x: jnp.ndarray
    offset_y: jnp.ndarray
    radius: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    is_trigger: jnp.ndarray  # bool[N]
    restitution: jnp.ndarray
    collision_layer: jnp.ndarray  # int32[N]
    collision_mask: jnp.ndarray  # int32[N]
    aabb_min_x: jnp.ndarray
    aabb_min_y: jnp.ndarray
    aabb_max_x: jnp.ndarray
    aabb_max_y: jnp.ndarray
    visual_range: jnp.ndarray

    @staticmethod
    def zeros(n: int) -> "Collider":
        f = lambda: _zeros(n, jnp.float32)
        return Collider(
            active=_zeros(n, jnp.bool_),
            shape_type=_zeros(n, jnp.int32),
            offset_x=f(), offset_y=f(), radius=f(), width=f(), height=f(),
            is_trigger=_zeros(n, jnp.bool_),
            restitution=f(),
            collision_layer=_zeros(n, jnp.int32),
            collision_mask=_zeros(n, jnp.int32),
            aabb_min_x=f(), aabb_min_y=f(), aabb_max_x=f(), aabb_max_y=f(),
            visual_range=f(),
        )


@struct.dataclass
class SpriteRenderer:
    """SpriteRenderer.js:8-41 — render state written by logic, read by the
    extraction path; renderDirty drives dirty-compacted host transfer."""

    active: jnp.ndarray  # bool[N]
    animation_state: jnp.ndarray  # int32[N]
    animation_frame: jnp.ndarray  # int32[N]
    # fractional frame accumulator — the renderer's per-entity accumulator
    # array (pixi_worker.js:963-984) promoted into the schema so frame
    # advancement can run on-device
    animation_accum: jnp.ndarray  # f32[N]
    animation_speed: jnp.ndarray  # f32[N]
    is_animated: jnp.ndarray  # bool[N]
    spritesheet_id: jnp.ndarray  # int32[N]
    tint: jnp.ndarray  # uint32[N]
    base_tint: jnp.ndarray  # uint32[N]
    alpha: jnp.ndarray
    scale_x: jnp.ndarray
    scale_y: jnp.ndarray
    anchor_x: jnp.ndarray
    anchor_y: jnp.ndarray
    z_offset: jnp.ndarray
    blend_mode: jnp.ndarray  # int32[N]
    render_visible: jnp.ndarray  # bool[N]
    is_on_screen: jnp.ndarray  # bool[N]
    render_dirty: jnp.ndarray  # bool[N]
    screen_x: jnp.ndarray
    screen_y: jnp.ndarray

    @staticmethod
    def zeros(n: int) -> "SpriteRenderer":
        f = lambda: _zeros(n, jnp.float32)
        b = lambda: _zeros(n, jnp.bool_)
        i = lambda: _zeros(n, jnp.int32)
        return SpriteRenderer(
            active=b(), animation_state=i(), animation_frame=i(),
            animation_accum=f(),
            animation_speed=f(), is_animated=b(), spritesheet_id=i(),
            tint=_zeros(n, jnp.uint32), base_tint=_zeros(n, jnp.uint32),
            alpha=f(), scale_x=f(), scale_y=f(), anchor_x=f(), anchor_y=f(),
            z_offset=f(), blend_mode=i(), render_visible=b(),
            is_on_screen=b(), render_dirty=b(), screen_x=f(), screen_y=f(),
        )


@struct.dataclass
class MouseComponent:
    """MouseComponent.js:9-17 — mouse is entity index 0 (Mouse.js:30-104)."""

    button0_down: jnp.ndarray  # bool[N]
    button1_down: jnp.ndarray
    button2_down: jnp.ndarray
    is_present: jnp.ndarray

    @staticmethod
    def zeros(n: int) -> "MouseComponent":
        b = lambda: _zeros(n, jnp.bool_)
        return MouseComponent(
            button0_down=b(), button1_down=b(), button2_down=b(), is_present=b()
        )


@struct.dataclass
class LightEmitter:
    """LightEmitter.js:4-9."""

    active: jnp.ndarray  # bool[N]
    light_color: jnp.ndarray  # uint32[N]
    light_intensity: jnp.ndarray
    height: jnp.ndarray

    @staticmethod
    def zeros(n: int) -> "LightEmitter":
        return LightEmitter(
            active=_zeros(n, jnp.bool_),
            light_color=_zeros(n, jnp.uint32),
            light_intensity=_zeros(n, jnp.float32),
            height=_zeros(n, jnp.float32),
        )


@struct.dataclass
class ShadowCaster:
    """ShadowCaster.js:12-25 — entity-marker half of the dual-use schema:
    per-entity shadow parameters (the shadow-*sprite* output half is
    :class:`ShadowSprites`, filled by the lighting op)."""

    active: jnp.ndarray  # bool[N]
    shadow_radius: jnp.ndarray
    height: jnp.ndarray  # caster height — longer shadows for taller entities

    @staticmethod
    def zeros(n: int) -> "ShadowCaster":
        return ShadowCaster(
            active=_zeros(n, jnp.bool_),
            shadow_radius=_zeros(n, jnp.float32),
            height=_zeros(n, jnp.float32),
        )


@struct.dataclass
class ShadowSprites:
    """Shadow-sprite output buffer (the shadowSpriteData SAB analog,
    gameEngine.js:618-633): ``[max_shadow_casting_lights ×
    max_shadows_per_light]`` slots, written by the lighting op each step and
    consumed by the renderer (pixi_worker.js:1578-1611)."""

    active: jnp.ndarray  # bool[LM]
    x: jnp.ndarray  # f32[LM]
    y: jnp.ndarray
    rotation: jnp.ndarray
    scale_x: jnp.ndarray
    scale_y: jnp.ndarray
    alpha: jnp.ndarray
    radius: jnp.ndarray

    @staticmethod
    def zeros(n: int) -> "ShadowSprites":
        f = lambda: _zeros(n, jnp.float32)
        return ShadowSprites(
            active=_zeros(n, jnp.bool_),
            x=f(), y=f(), rotation=f(), scale_x=f(), scale_y=f(),
            alpha=f(), radius=f(),
        )


@struct.dataclass
class Particles:
    """The separate particle pool — ParticleComponent.js:9-51. Shape
    ``[max_particles]``, NOT entity-indexed (gameEngine.js:597-615)."""

    active: jnp.ndarray  # bool[P]
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    lifespan: jnp.ndarray  # f32[P] ms
    current_life: jnp.ndarray  # f32[P] ms
    gravity: jnp.ndarray
    scale: jnp.ndarray
    alpha: jnp.ndarray
    tint: jnp.ndarray  # uint32[P]
    base_tint: jnp.ndarray  # uint32[P]
    texture_id: jnp.ndarray  # int32[P]
    fade_on_the_floor: jnp.ndarray  # f32[P] ms fade duration
    time_on_floor: jnp.ndarray  # f32[P] ms
    initial_alpha: jnp.ndarray
    stay_on_the_floor: jnp.ndarray  # bool[P]
    is_on_screen: jnp.ndarray  # bool[P]

    @staticmethod
    def zeros(p: int) -> "Particles":
        f = lambda: _zeros(p, jnp.float32)
        return Particles(
            active=_zeros(p, jnp.bool_),
            x=f(), y=f(), z=f(), vx=f(), vy=f(), vz=f(),
            lifespan=f(), current_life=f(), gravity=f(), scale=f(), alpha=f(),
            tint=_zeros(p, jnp.uint32), base_tint=_zeros(p, jnp.uint32),
            texture_id=_zeros(p, jnp.int32),
            fade_on_the_floor=f(), time_on_floor=f(), initial_alpha=f(),
            stay_on_the_floor=_zeros(p, jnp.bool_),
            is_on_screen=_zeros(p, jnp.bool_),
        )


# ---------------------------------------------------------------------------
# User-defined components (the analog of subclassing Component with a custom
# ARRAY_SCHEMA — Component.js:9-11, Flocking.js:353-363).
# ---------------------------------------------------------------------------

_DTYPES = {
    "f32": jnp.float32,
    "i32": jnp.int32,
    "u32": jnp.uint32,
    "bool": jnp.bool_,
}


def define_component(name: str, schema: Dict[str, str]):
    """Create a custom SoA component type from a {field: dtype} schema.

    ``dtype`` is one of 'f32' | 'i32' | 'u32' | 'bool'. Returns a
    flax.struct.dataclass with a ``zeros(n)`` constructor, usable in an entity
    class's ``components`` list exactly like the built-ins.

    Example (the predators demo's Flocking component)::

        Flocking = define_component("Flocking", dict(
            protected_range="f32", centering_factor="f32", avoid_factor="f32",
            matching_factor="f32", turn_factor="f32", margin="f32"))
    """
    for f_name, d in schema.items():
        if d not in _DTYPES:
            raise ValueError(f"{name}.{f_name}: unknown dtype {d!r}")

    # build a plain annotated class and let flax.struct create the frozen
    # dataclass + pytree registration (mirrors the decorator form)
    cls = type(name, (), {"__annotations__": {f: jnp.ndarray for f in schema}})
    cls = struct.dataclass(cls)

    dtypes = {f_name: _DTYPES[d] for f_name, d in schema.items()}

    def zeros(n: int):
        return cls(**{f_name: _zeros(n, dt) for f_name, dt in dtypes.items()})

    cls.zeros = staticmethod(zeros)
    cls.SCHEMA = dict(schema)
    cls.__doc__ = f"User component {name} ({schema})"
    return cls


# Built-in components always present in a World (dense allocation).
BUILTIN_COMPONENTS = {
    "transform": Transform,
    "rigid_body": RigidBody,
    "collider": Collider,
    "sprite": SpriteRenderer,
    "mouse": MouseComponent,
    "light": LightEmitter,
    "shadow": ShadowCaster,
}
