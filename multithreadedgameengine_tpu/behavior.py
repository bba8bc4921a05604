"""Entity classes and the batched logic phase — the GameObject/tick() analog.

The reference's L2 entity layer (src/core/gameObject.js) is an OO façade over
SoA arrays: users subclass GameObject, declare ``static components = [...]``,
and implement lifecycle hooks (:597-783). Its logic workers then run
``tick(dtRatio)`` per entity over an atomic job queue (logic_worker.js:320-370).

TPU-native translation:
 - an :class:`EntityClass` declares components plus three hooks:
     * ``setup(ctx)``       — host, once at init, vectorized over the class's
                              slot range (gameObject.js setup(), run once per
                              instance at worker start);
     * ``on_spawned(ctx, spawn_config)`` — host, per spawn, may consume the
                              seeded RNG (gameObject.js:943);
     * ``tick(ctx)``        — DEVICE code: a pure JAX function of a per-entity
                              :class:`TickCtx`, vmapped over the class's slot
                              range and fused into the jitted step. Replaces
                              the job-queue data parallelism with SPMD batching
                              (SURVEY.md §2.5).
 - ``tick`` returns a dict of ``"component.field" -> value`` self-writes (the
   analog of ``this.rigidBody.ax = ...``), plus the optional special keys
   ``"despawn"`` (bool — despawn self, gameObject.js:668-691) and
   ``"emit"`` (device-side particle emission request — a dict of emit fields,
   see EMIT_FIELDS; the analog of a tick calling ParticleEmitter.emit inline,
   ParticleEmitter.js:78-173. Scalars emit identical particles; [emit_cap]
   rows give per-particle variation; "count" bounds how many spawn, clipped
   to the class's ``emit_cap``).

Field addressing uses World attribute paths: ``rigid_body.ax``, ``sprite.tint``,
``flocking.turn_factor`` (custom components are mounted under their snake-case
name in ``world.custom``).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .components import (
    Collider,
    LightEmitter,
    MouseComponent,
    RigidBody,
    ShadowCaster,
    SpriteRenderer,
    Transform,
)
from .config import EngineConfig
from .inputs import InputState, key_index
from .ops.spatial import NeighborLists
from .state import World


def snake_case(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


# World attribute name for each built-in component class
BUILTIN_PATHS = {
    Transform: "transform",
    RigidBody: "rigid_body",
    Collider: "collider",
    SpriteRenderer: "sprite",
    MouseComponent: "mouse",
    LightEmitter: "light",
    ShadowCaster: "shadow",
}

# Ergonomic aliases (gameObject.js:226-295 this.x/.vx accessors)
FIELD_ALIASES = {
    "x": "transform.x",
    "y": "transform.y",
    "rotation": "transform.rotation",
    "vx": "rigid_body.vx",
    "vy": "rigid_body.vy",
    "ax": "rigid_body.ax",
    "ay": "rigid_body.ay",
    "radius": "collider.radius",
    "visual_range": "collider.visual_range",
    "tint": "sprite.tint",
    "alpha": "sprite.alpha",
}


def resolve_field(world: World, path: str) -> Tuple[Any, str, str]:
    """Resolve 'component.field' (or an alias) to (component_obj, comp_attr,
    field). Custom components resolve through world.custom."""
    path = FIELD_ALIASES.get(path, path)
    comp_name, _, field = path.partition(".")
    if not field:
        raise KeyError(f"field path {path!r} must be 'component.field'")
    if hasattr(world, comp_name):
        comp = getattr(world, comp_name)
    elif comp_name in world.custom:
        comp = world.custom[comp_name]
    else:
        raise KeyError(f"unknown component {comp_name!r} in path {path!r}")
    if not hasattr(comp, field):
        raise KeyError(f"component {comp_name!r} has no field {field!r}")
    return comp, comp_name, field


def read_field(world: World, path: str) -> jnp.ndarray:
    comp, _, field = resolve_field(world, path)
    return getattr(comp, field)


def write_field(world: World, path: str, value: jnp.ndarray) -> World:
    comp, comp_name, field = resolve_field(world, path)
    new_comp = comp.replace(**{field: value})
    if hasattr(world, comp_name):
        return world.replace(**{comp_name: new_comp})
    custom = dict(world.custom)
    custom[comp_name] = new_comp
    return world.replace(custom=custom)


class EntityClass:
    """Base entity class. Subclass, declare ``components``, override hooks.

    Registration (engine.register_entity_class) assigns ``entity_type`` ids in
    registration order and walks base classes exactly like the reference's
    parent-chain auto-registration (gameEngine.js:389-457): parent classes get
    a 0-count registration so their type ids exist and component unions
    include inherited components (utils.js:199-221 collectComponents).
    """

    components: Sequence[Any] = ()

    #: whether this class's tick reads its neighbor lists. Classes that don't
    #: (e.g. the balls demo) let the engine skip building per-entity neighbor
    #: lists entirely when the grid physics solver is active.
    uses_neighbors: bool = True

    #: world field paths the tick reads PER NEIGHBOR (e.g. boids read
    #: neighbors' x/y/vx/vy/entityType). Declared fields ride the neighbor
    #: table as payload channels, making ctx.neighbor_col(path) a free slice
    #: instead of a random gather — the decisive optimization for
    #: flocking-scale neighbor counts. Undeclared paths still work through
    #: ctx.gather (slow path).
    neighbor_fields: Sequence[str] = ()

    #: max particles one tick of this class may emit per frame via the
    #: ``"emit"`` return key (static — sizes the device expansion buffer).
    #: The reference has no cap (ParticleEmitter.js linear scan); a static
    #: per-tick bound is the price of fixed shapes.
    emit_cap: int = 1

    # populated by the engine at registration
    entity_type: int = -1
    start_index: int = 0
    count: int = 0

    # ---- host-side lifecycle hooks ----
    @classmethod
    def setup(cls, ctx: "SetupCtx") -> Optional[Dict[str, Any]]:
        """Once at init, vectorized over the class range. Return
        {'component.field': scalar-or-[count]-array} defaults."""
        return None

    @classmethod
    def on_spawned(cls, ctx: "SpawnCtx", spawn_config: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """Per spawn (host). Return {'component.field': scalar} writes."""
        return None

    #: Optional VECTORIZED spawn hook: ``on_spawned_batch(ctx: BatchSpawnCtx,
    #: spawn_arrays: {key: [n] array}) -> {path: [n] array}``. When defined,
    #: ``Engine.spawn_batch`` calls it once for the whole batch instead of
    #: ``on_spawned`` per entity — the churn-rate fast path. Implementations
    #: must consume the seeded RNG stream in the same per-entity draw order
    #: as ``on_spawned`` (use ``ctx.rng.draw(k)``) so both paths produce
    #: bit-identical worlds.
    on_spawned_batch = None

    @classmethod
    def on_despawned(cls, index: int) -> None:
        """Per despawn (host)."""

    # ---- host-side collision callbacks (Enter/Stay/Exit; logic_worker.js:417-526) ----
    on_collision_enter: Optional[Callable[[int, int], None]] = None
    on_collision_stay: Optional[Callable[[int, int], None]] = None
    on_collision_exit: Optional[Callable[[int, int], None]] = None

    # ---- host-side onScreen callbacks (logic_worker.js:534-554) ----
    # fired when the entity's culling visibility transitions; requires
    # logic.screen_events. Signature: hook(entity_index).
    on_screen_enter: Optional[Callable[[int], None]] = None
    on_screen_exit: Optional[Callable[[int], None]] = None

    # ---- device-side hook ----
    tick: Optional[Callable[["TickCtx"], Optional[Dict[str, Any]]]] = None

    @classmethod
    def collect_components(cls) -> List[Any]:
        """Union of ``components`` up the class hierarchy, Transform always
        included (utils.js:199-221)."""
        seen: List[Any] = []
        for klass in cls.__mro__:
            if klass is EntityClass:
                break
            for comp in getattr(klass, "components", ()):
                if comp not in seen:
                    seen.append(comp)
        if Transform not in seen:
            seen.append(Transform)
        return seen


class SetupCtx:
    """Host context for EntityClass.setup."""

    def __init__(self, config: EngineConfig, start: int, count: int, rng, sprites=None):
        self.config = config
        self.start = start
        self.count = count
        self.rng = rng  # shared Mulberry32 stream
        self.sprites = sprites  # SpriteRegistry

    def indices(self) -> np.ndarray:
        return np.arange(self.start, self.start + self.count)


class SpawnCtx:
    """Host context for EntityClass.on_spawned."""

    def __init__(self, config: EngineConfig, index: int, rng, sprites=None):
        self.config = config
        self.index = index
        self.rng = rng
        self.sprites = sprites  # SpriteRegistry


class BatchSpawnCtx:
    """Host context for EntityClass.on_spawned_batch: one call covering
    ``indices`` (ascending claim order). ``rng`` is the engine's shared
    Mulberry32 stream — use ``rng.draw(k)`` so the batch consumes exactly
    the draws ``len(indices)`` sequential on_spawned calls would."""

    def __init__(self, config: EngineConfig, indices, rng, sprites=None):
        self.config = config
        self.indices = indices  # np.int32[n], claim order
        self.rng = rng
        self.sprites = sprites


class TickCtx:
    """Per-entity device view handed to ``tick`` inside vmap.

    ``i``, the neighbor arrays and ``self_view`` are per-entity (batched by
    vmap); ``world`` and ``inputs`` are closed-over unbatched pytrees, so
    reads like ``ctx.world.transform.x[j]`` are gathers — the exact analog of
    the reference's direct SoA array reads in hot loops (boid.js:137-240).

    ``self_view`` is the class's contiguous slot range PRE-SLICED per
    component ({comp_name: component rows}) and fed through vmap, so every
    self-field read (``ctx.x``, ``ctx.field(...)``) lowers to a cheap static
    slice of the world instead of an [count]-index gather — at 1M entities
    the gathers were the single most expensive phase of the whole step
    (~76 ms for the 4 fields the balls tick touches; slices are free).
    Unread fields are sliced at trace time only and dead-code-eliminated.
    """

    __slots__ = ("i", "world", "neighbor_ids", "neighbor_d2", "neighbor_count",
                 "inputs", "dt_ratio", "config", "neighbor_payload",
                 "payload_channels", "self_view", "gather_fn")

    def __init__(self, i, world: World, neighbor_ids, neighbor_d2,
                 neighbor_count, inputs: InputState, dt_ratio, config: EngineConfig,
                 neighbor_payload=None, payload_channels=None, self_view=None,
                 gather_fn=None):
        self.i = i
        self.world = world
        self.neighbor_ids = neighbor_ids  # int32[K], -1 padded
        self.neighbor_d2 = neighbor_d2  # f32[K]
        self.neighbor_count = neighbor_count  # int32
        self.inputs = inputs
        self.dt_ratio = dt_ratio
        self.config = config
        self.neighbor_payload = neighbor_payload  # f32[K, F] or None
        self.payload_channels = payload_channels or {}
        self.self_view = self_view  # {comp_name: batched component} or None
        # optional path -> GLOBAL-index array resolver: under the halo step
        # neighbor ids are global while ctx.world holds local routed rows,
        # so gathers route through an all_gathered field instead
        self.gather_fn = gather_fn

    # -- self accessors (this.x / this.vx ... gameObject.js:226-295) --
    def _self_field(self, comp_name: str, field: str) -> jnp.ndarray:
        if self.self_view is not None:
            comp = self.self_view.get(comp_name)
            if comp is not None:
                return getattr(comp, field)
        if hasattr(self.world, comp_name):
            comp = getattr(self.world, comp_name)
        else:
            comp = self.world.custom[comp_name]
        return getattr(comp, field)[self.i]

    def field(self, path: str) -> jnp.ndarray:
        path = FIELD_ALIASES.get(path, path)
        comp_name, _, field = path.partition(".")
        if not field:
            raise KeyError(f"field path {path!r} must be 'component.field'")
        return self._self_field(comp_name, field)

    @property
    def x(self): return self._self_field("transform", "x")
    @property
    def y(self): return self._self_field("transform", "y")
    @property
    def rotation(self): return self._self_field("transform", "rotation")
    @property
    def entity_type(self): return self._self_field("transform", "entity_type")
    @property
    def vx(self): return self._self_field("rigid_body", "vx")
    @property
    def vy(self): return self._self_field("rigid_body", "vy")
    @property
    def ax(self): return self._self_field("rigid_body", "ax")
    @property
    def ay(self): return self._self_field("rigid_body", "ay")
    @property
    def speed(self): return self._self_field("rigid_body", "speed")
    @property
    def velocity_angle(self): return self._self_field("rigid_body", "velocity_angle")

    # -- neighbors (this.neighbors / updateNeighbors, gameObject.js:700-729) --
    @property
    def neighbor_mask(self) -> jnp.ndarray:
        # slot-form lists: a slot is live iff it holds a real id (see
        # NeighborLists layout note in ops/spatial.py)
        return self.neighbor_ids >= 0

    @property
    def neighbor_ids_safe(self) -> jnp.ndarray:
        return jnp.maximum(self.neighbor_ids, 0)

    def gather(self, path_or_array) -> jnp.ndarray:
        """Gather a world field (or raw [N] array) at the neighbor indices.
        SLOW PATH (random gather) — declare the path in the class's
        ``neighbor_fields`` to get it as a free payload channel instead.
        Under the halo step undeclared paths resolve through one all_gather
        of the field per step (``gather_fn``); raw arrays are local-index
        and cannot (declare the field instead)."""
        if self.gather_fn is not None:
            if not isinstance(path_or_array, str):
                raise ValueError(
                    "ctx.gather(raw_array) cannot run under the halo step "
                    "(rows are slab-local while neighbor ids are global); "
                    "pass the field path or declare it in neighbor_fields"
                )
            arr = self.gather_fn(path_or_array)
        else:
            arr = (
                read_field(self.world, path_or_array)
                if isinstance(path_or_array, str)
                else path_or_array
            )
        return arr[self.neighbor_ids_safe]

    def neighbor_col(self, path: str) -> jnp.ndarray:
        """Per-neighbor values of a world field: a payload-channel slice when
        the field was declared in ``neighbor_fields`` (or is x/y), else a
        gather fallback."""
        path = FIELD_ALIASES.get(path, path)
        ch = self.payload_channels.get(path)
        if ch is not None and self.neighbor_payload is not None:
            return self.neighbor_payload[:, ch]
        return self.gather(path)

    # -- input shortcuts (Mouse statics / Keyboard proxy) --
    @property
    def mouse_x(self): return self.inputs.mouse_x
    @property
    def mouse_y(self): return self.inputs.mouse_y
    @property
    def mouse_down(self): return self.inputs.mouse_buttons[0]

    def key(self, name: str) -> jnp.ndarray:
        return self.inputs.keys[key_index(name)]


class NotLayoutSafe(Exception):
    """Raised by :class:`ForceTickCtx` when a tick touches state that does
    not exist in the solver's position layout (neighbors, arbitrary
    components, the world) — the class then disqualifies from
    physics.position_residency and the scatter-per-frame path runs."""


#: self-field paths a layout-evaluated tick may read (present in the
#: resident layout or constant-zero at tick time: the Verlet zeroes ax/ay
#: every frame, physics_worker.js:240-316)
_LAYOUT_READABLE = {
    "transform.x", "transform.y", "rigid_body.ax", "rigid_body.ay",
}
#: paths a layout-evaluated tick may write (forces consumed by the Verlet)
LAYOUT_WRITABLE = {"rigid_body.ax", "rigid_body.ay"}


class ForceTickCtx:
    """Minimal TickCtx stand-in for evaluating a tick in SOLVER LAYOUT space
    (physics.position_residency): exposes exactly the state that exists
    per layout slot — position, zeroed accelerations, the input snapshot,
    config — and raises :class:`NotLayoutSafe` on anything else. Used both
    to PROBE a tick for layout-safety at build time (under jax.eval_shape)
    and to evaluate qualified ticks over layout slots inside the step."""

    __slots__ = ("i", "_x", "_y", "inputs", "dt_ratio", "config")

    def __init__(self, i, x, y, inputs: InputState, dt_ratio, config: EngineConfig):
        self.i = i  # global entity id (decoded from the layout meta)
        self._x = x
        self._y = y
        self.inputs = inputs
        self.dt_ratio = dt_ratio
        self.config = config

    def field(self, path: str) -> jnp.ndarray:
        path = FIELD_ALIASES.get(path, path)
        if path == "transform.x":
            return self._x
        if path == "transform.y":
            return self._y
        if path in ("rigid_body.ax", "rigid_body.ay"):
            return jnp.float32(0.0)
        raise NotLayoutSafe(path)

    @property
    def x(self): return self._x
    @property
    def y(self): return self._y
    @property
    def ax(self): return jnp.float32(0.0)
    @property
    def ay(self): return jnp.float32(0.0)

    def __getattr__(self, name):  # any other accessor disqualifies
        raise NotLayoutSafe(name)

    @property
    def mouse_x(self): return self.inputs.mouse_x
    @property
    def mouse_y(self): return self.inputs.mouse_y
    @property
    def mouse_down(self): return self.inputs.mouse_buttons[0]

    def key(self, name: str) -> jnp.ndarray:
        return self.inputs.keys[key_index(name)]


def probe_layout_safe(klass: type, cfg: EngineConfig) -> bool:
    """Decide at build time whether a class's tick can evaluate in solver
    layout space: reads only what :class:`ForceTickCtx` exposes AND writes
    only rigid_body.ax/ay (no despawn/emit/sprite side effects). Probed
    abstractly (jax.eval_shape) so no device work runs."""
    tick = getattr(klass, "tick", None)
    if tick is None:
        return True  # nothing to evaluate — contributes zero force
    if getattr(klass, "uses_neighbors", True):
        return False
    tick_fn = tick.__func__ if isinstance(tick, (staticmethod, classmethod)) else tick

    def run():
        ctx = ForceTickCtx(
            jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0),
            InputState.default(), jnp.float32(cfg.dt_ratio), cfg,
        )
        out = tick_fn(ctx)
        return out if out is not None else {}

    try:
        out = jax.eval_shape(run)
    except NotLayoutSafe:
        return False
    except Exception:
        return False  # any trace failure under the minimal ctx → unsafe
    keys = {FIELD_ALIASES.get(k, k) for k in out}
    return keys <= LAYOUT_WRITABLE


def eval_layout_forces(
    force_specs: Sequence[Tuple[Callable, int, int]],
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    gid: jnp.ndarray,
    inputs: InputState,
    cfg: EngineConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate layout-safe tick forces directly over solver-layout slots.
    ``force_specs``: (tick_fn, start, count) per qualified ticking class —
    each tick is vmapped over every slot and merged under its class's
    gid-range mask (empty slots carry gid 0 / moving=0 and never consume
    the result). Bit-exact with the entity-order evaluation: same function,
    same per-entity scalars."""
    shape = gx.shape
    ax = jnp.zeros(shape, jnp.float32)
    ay = jnp.zeros(shape, jnp.float32)
    if not force_specs:
        return ax, ay
    fx, fy, fid = gx.ravel(), gy.ravel(), gid.ravel()
    axf, ayf = ax.ravel(), ay.ravel()
    for tick_fn, start, count in force_specs:
        def one(i, xi, yi):
            ctx = ForceTickCtx(
                i, xi, yi, inputs, jnp.float32(cfg.dt_ratio), cfg
            )
            out = tick_fn(ctx) or {}
            norm = {FIELD_ALIASES.get(k, k): v for k, v in out.items()}
            return (
                jnp.asarray(norm.get("rigid_body.ax", 0.0), jnp.float32),
                jnp.asarray(norm.get("rigid_body.ay", 0.0), jnp.float32),
            )

        oax, oay = jax.vmap(one)(fid, fx, fy)
        m = (fid >= start) & (fid < start + count)
        axf = jnp.where(m, oax, axf)
        ayf = jnp.where(m, oay, ayf)
    return axf.reshape(shape), ayf.reshape(shape)


#: emit-request field -> (dtype, default). x/y default to the emitting
#: entity's (pre-tick) position; the rest mirror the host emit() defaults
#: (ParticleEmitter.js:29-77).
EMIT_FIELDS: Dict[str, Tuple[Any, float]] = {
    "x": (jnp.float32, None),
    "y": (jnp.float32, None),
    "z": (jnp.float32, 0.0),
    "vx": (jnp.float32, 0.0),
    "vy": (jnp.float32, 0.0),
    "vz": (jnp.float32, 0.0),
    "lifespan": (jnp.float32, 1000.0),
    "gravity": (jnp.float32, 0.15),
    "scale": (jnp.float32, 1.0),
    "alpha": (jnp.float32, 1.0),
    "tint": (jnp.uint32, 0xFFFFFF),
    "texture_id": (jnp.int32, 0),
    "fade_on_the_floor": (jnp.float32, 0.0),
    "stay_on_the_floor": (jnp.bool_, False),
}


def _normalize_emit_request(
    out_emit: Dict[str, jnp.ndarray],
    klass: type,
    start: int,
    count: int,
    world: World,
    active_slice: jnp.ndarray,
) -> Dict[str, Any]:
    """Shape a vmapped ``"emit"`` tick output into a dense request block:
    every field broadcast to [count, emit_cap] (a tick may return scalars —
    all emitted particles share the value — or [emit_cap] rows for
    per-particle variation), plus the per-slot validity mask
    ``slot k live iff k < clip(count_i, 0, cap) and entity is active``."""
    cap = max(1, int(getattr(klass, "emit_cap", 1)))
    n_req = out_emit.get("count")
    if n_req is None:
        n_req = jnp.ones((count,), jnp.int32)
    n_req = jnp.clip(jnp.asarray(n_req, jnp.int32), 0, cap)
    valid = (
        (jnp.arange(cap, dtype=jnp.int32)[None, :] < n_req[:, None])
        & active_slice[:, None]
    )
    fields: Dict[str, jnp.ndarray] = {}
    for key, (dtype, default) in EMIT_FIELDS.items():
        v = out_emit.get(key)
        if v is None:
            if default is None:  # x / y -> pre-tick entity position
                v = read_field(world, f"transform.{key}")[start : start + count]
            else:
                v = jnp.full((count,), default, dtype)
        v = jnp.asarray(v, dtype)
        if v.ndim == 1:
            v = v[:, None]
        fields[key] = jnp.broadcast_to(v, (count, cap))
    unknown = set(out_emit) - set(EMIT_FIELDS) - {"count"}
    if unknown:
        raise KeyError(
            f"{klass.__name__}.tick 'emit' request has unknown fields "
            f"{sorted(unknown)}; allowed: count, {sorted(EMIT_FIELDS)}"
        )
    return {"fields": fields, "valid": valid}


#: World attributes that hold per-entity component rows (custom components
#: are appended dynamically in :func:`_entity_view`).
ENTITY_COMPONENT_ATTRS = (
    "transform", "rigid_body", "collider", "sprite", "mouse", "light", "shadow",
)


def _entity_view(world: World, start: int, count: int) -> Dict[str, Any]:
    """Slice every entity component's rows [start, start+count) into a flat
    {comp_name: component} dict for TickCtx.self_view. ``start``/``count``
    are static, so each field is a fusible slice; fields the tick never
    reads are dead-code-eliminated at trace time."""
    n = world.transform.x.shape[0]

    def cut(comp):
        if start == 0 and count == n:
            return comp
        return jax.tree_util.tree_map(lambda a: a[start:start + count], comp)

    view = {name: cut(getattr(world, name)) for name in ENTITY_COMPONENT_ATTRS}
    for name, comp in world.custom.items():
        view[name] = cut(comp)
    return view


def run_logic_phase(
    world: World,
    nbr: NeighborLists,
    inputs: InputState,
    cfg: EngineConfig,
    type_ranges: Sequence[Tuple[type, int, int]],
    payload_channels: Optional[Dict[str, int]] = None,
) -> Tuple[World, List[Dict[str, Any]]]:
    """Run each registered class's tick over its slot range, masked by
    ``active`` (logic workers only tick active entities,
    logic_worker.js:337-369). ``type_ranges``: (EntityClass, start, count).

    All writes are accumulated and applied after every class has read the
    pre-tick world — matching the reference's intent that ticks read
    last-frame state (stale-read pipeline, SURVEY.md §1).

    Returns (world, emissions): ``emissions`` collects the classes'
    ``"emit"`` tick outputs as normalized request blocks for
    ops/particles.apply_tick_emissions — the device analog of logic workers
    calling ParticleEmitter.emit inline (ParticleEmitter.js:78-173).
    """
    writes: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    emissions: List[Dict[str, Any]] = []
    despawn_mask_total = None

    for klass, start, count in type_ranges:
        tick = getattr(klass, "tick", None)
        if tick is None or count == 0:
            continue
        tick_fn = tick.__func__ if isinstance(tick, (staticmethod, classmethod)) else tick

        idx = jnp.arange(start, start + count, dtype=jnp.int32)
        if isinstance(nbr, dict):
            # per-class pre-sliced lists (ops/spatial.neighbor_lists_by_class
            # — each class's candidate width matches ITS scan radius);
            # classes without lists tick against empty tables
            nbr_c = nbr.get(klass.__name__)
            if nbr_c is None:
                ids = jnp.full((count, 1), -1, jnp.int32)
                d2 = jnp.zeros((count, 1), jnp.float32)
                cnt = jnp.zeros((count,), jnp.int32)
                has_payload = False
            else:
                ids, d2, cnt = nbr_c.ids, nbr_c.d2, nbr_c.count
                has_payload = nbr_c.payload.data.shape[-1] > 0
            payload = (
                nbr_c.payload.data
                if has_payload
                else jnp.zeros((count, ids.shape[1], 0), jnp.float32)
            )
        else:
            ids = nbr.ids[start : start + count]
            d2 = nbr.d2[start : start + count]
            cnt = nbr.count[start : start + count]
            has_payload = nbr.payload.data.shape[-1] > 0
            payload = (
                nbr.payload.data[start : start + count]
                if has_payload else jnp.zeros((count, ids.shape[1], 0), jnp.float32)
            )

        view = _entity_view(world, start, count)

        def one(i, ids_row, d2_row, cnt_i, payload_row, view_row):
            ctx = TickCtx(i, world, ids_row, d2_row, cnt_i, inputs,
                          jnp.float32(cfg.dt_ratio), cfg,
                          neighbor_payload=payload_row if has_payload else None,
                          payload_channels=payload_channels,
                          self_view=view_row)
            out = tick_fn(ctx)
            return out if out is not None else {}

        outs = jax.vmap(one)(idx, ids, d2, cnt, payload, view)  # dict of [count] arrays
        active_slice = jax.lax.dynamic_slice_in_dim(
            world.transform.active, start, count, 0
        )

        # contiguous range writes lower to dynamic_update_slice, not scatter
        for path, value in outs.items():
            if path == "despawn":
                dm = jnp.zeros_like(world.transform.active)
                dm = dm.at[start : start + count].set(value & active_slice)
                despawn_mask_total = dm if despawn_mask_total is None else (despawn_mask_total | dm)
                continue
            if path == "emit":
                emissions.append(_normalize_emit_request(
                    value, klass, start, count, world, active_slice
                ))
                continue
            arr = read_field(world, path)
            value = jnp.asarray(value, arr.dtype)
            mask, vals = writes.get(path, (None, None))
            if mask is None:
                mask = jnp.zeros(arr.shape[0], jnp.bool_)
                vals = jnp.zeros_like(arr)
            mask = mask.at[start : start + count].set(active_slice)
            vals = vals.at[start : start + count].set(
                jnp.where(active_slice, value, vals[start : start + count])
            )
            writes[path] = (mask, vals)

    for path, (mask, vals) in writes.items():
        arr = read_field(world, path)
        world = write_field(world, path, jnp.where(mask, vals, arr))

    if despawn_mask_total is not None:
        world = apply_despawn_mask(world, despawn_mask_total)
    return world, emissions


def run_logic_phase_masked(
    world: World,
    nbr: NeighborLists,
    inputs: InputState,
    cfg: EngineConfig,
    type_specs: Sequence[Tuple[type, int]],
    payload_channels: Optional[Dict[str, int]] = None,
    gather_fn=None,
) -> World:
    """Variant of :func:`run_logic_phase` for ROWS IN ARBITRARY ORDER — the
    resident-row form used by the spatial-domain shard_map path
    (parallel/halo.py), where a device's rows are whatever entities currently
    live in its world slab and class slot-ranges don't exist.

    ``type_specs``: (EntityClass, entity_type_id) pairs. Every class's tick
    is vmapped over ALL rows and merged under the ``entity_type == id &&
    active`` mask (cost × number of ticking classes — the price of
    order-free rows; typical scenes have 1-2 ticking classes).

    Per-neighbor reads: declared ``neighbor_fields`` payload channels are
    the fast path. ``ctx.gather`` of an undeclared path works too when the
    caller supplies ``gather_fn`` (the halo step passes one that all_gathers
    the HOME field across slabs — correct but one collective per gathered
    path per step); without it, neighbor ids must index ``world`` directly
    (single-device layout).

    Returns (world, emissions) like run_logic_phase. Single-device emission
    order is class-registration order then entity index then slot; class
    slot ranges ascend with registration order, so sorting gathered
    requests by (global id, slot) reproduces it exactly — the halo step
    relies on this after all_gathering per-slab requests."""
    writes: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    emissions: List[Dict[str, Any]] = []
    despawn_mask_total = None
    n = world.transform.x.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    has_payload = nbr.payload.data.shape[-1] > 0

    for klass, type_id in type_specs:
        tick = getattr(klass, "tick", None)
        if tick is None:
            continue
        tick_fn = tick.__func__ if isinstance(tick, (staticmethod, classmethod)) else tick

        view = _entity_view(world, 0, n)

        def one(i, ids_row, d2_row, cnt_i, payload_row, view_row):
            ctx = TickCtx(i, world, ids_row, d2_row, cnt_i, inputs,
                          jnp.float32(cfg.dt_ratio), cfg,
                          neighbor_payload=payload_row if has_payload else None,
                          payload_channels=payload_channels,
                          self_view=view_row, gather_fn=gather_fn)
            out = tick_fn(ctx)
            return out if out is not None else {}

        outs = jax.vmap(one)(
            idx, nbr.ids, nbr.d2, nbr.count, nbr.payload.data, view
        )
        mask_cls = world.transform.active & (
            world.transform.entity_type == jnp.int32(type_id)
        )

        for path, value in outs.items():
            if path == "despawn":
                dm = value & mask_cls
                despawn_mask_total = dm if despawn_mask_total is None else (despawn_mask_total | dm)
                continue
            if path == "emit":
                emissions.append(_normalize_emit_request(
                    value, klass, 0, n, world, mask_cls
                ))
                continue
            arr = read_field(world, path)
            value = jnp.asarray(value, arr.dtype)
            mask, vals = writes.get(path, (None, None))
            if mask is None:
                mask = jnp.zeros(n, jnp.bool_)
                vals = jnp.zeros_like(arr)
            mask = mask | mask_cls
            vals = jnp.where(mask_cls, value, vals)
            writes[path] = (mask, vals)

    for path, (mask, vals) in writes.items():
        arr = read_field(world, path)
        world = write_field(world, path, jnp.where(mask, vals, arr))

    if despawn_mask_total is not None:
        world = apply_despawn_mask(world, despawn_mask_total)
    return world, emissions


def apply_despawn_mask(world: World, mask: jnp.ndarray) -> World:
    """In-step despawn: clear every per-component active flag
    (gameObject.js:668-691 clears Transform + per-component active). The host
    reconciles free lists from the step's despawn events."""
    t = world.transform
    off = lambda a: jnp.where(mask, False, a)
    return world.replace(
        transform=t.replace(active=off(t.active)),
        rigid_body=world.rigid_body.replace(active=off(world.rigid_body.active)),
        collider=world.collider.replace(active=off(world.collider.active)),
        sprite=world.sprite.replace(active=off(world.sprite.active)),
        light=world.light.replace(active=off(world.light.active)),
        shadow=world.shadow.replace(active=off(world.shadow.active)),
    )
