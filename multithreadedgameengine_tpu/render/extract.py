"""On-device render-state extraction.

The reference renderer reads the whole SoA state every frame over shared
memory (pixi_worker.js:807-960: always-sync position/rotation/scale, dirty-
gated visuals, manual animation frame advance, optional Y-sort). Over PCIe
that discipline becomes: cull + sort + compact ON DEVICE, transfer one dense
packet of only the visible entities (SURVEY.md §7.2 "host↔device bandwidth
for rendering ... transfer only visible+changed records").

 - :func:`advance_animation` — per-entity frame accumulator advance with
   wrap-around at the animation's frame count (pixi_worker.js:963-984).
 - :func:`extract_render_packet` — visible-entity compaction, optionally
   Y-sorted (the renderer's pooled sort-by-y re-add, :937-960); the packet's
   arrays are ``[max_visible]`` with a ``count``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ..config import EngineConfig
from ..state import World


@struct.dataclass
class RenderPacket:
    """Dense visible-entity records, the device→host frame payload."""

    count: jnp.ndarray  # int32
    index: jnp.ndarray  # int32[V] entity index (-1 pad)
    x: jnp.ndarray  # f32[V] world position
    y: jnp.ndarray
    screen_x: jnp.ndarray  # f32[V] screen position (culling pass output)
    screen_y: jnp.ndarray
    rotation: jnp.ndarray
    scale_x: jnp.ndarray
    scale_y: jnp.ndarray
    anchor_x: jnp.ndarray
    anchor_y: jnp.ndarray
    tint: jnp.ndarray  # uint32[V]
    alpha: jnp.ndarray
    spritesheet_id: jnp.ndarray  # int32[V]
    animation_state: jnp.ndarray  # int32[V]
    animation_frame: jnp.ndarray  # int32[V]
    z_offset: jnp.ndarray


def advance_animation(
    world: World, frame_counts: jnp.ndarray, dt_ratio: float
) -> World:
    """Advance animation frames for animated, visible sprites.

    ``frame_counts``: int32[max_sheets+1, max_anims] per-(sheet, animation)
    frame counts from the SpriteRegistry. The reference's renderer advances a
    float accumulator by animationSpeed per render frame and wraps by the
    animation's frame count (pixi_worker.js:963-984)."""
    s = world.sprite
    run = s.active & s.is_animated & world.transform.active
    # frame_counts arrives as NUMPY (deterministic jaxpr constant — see
    # Engine._frame_counts); convert inside the trace before tracer indexing
    frame_counts = jnp.asarray(frame_counts)
    n_sheets, n_anims = frame_counts.shape
    sheet = jnp.clip(s.spritesheet_id, 0, n_sheets - 1)
    anim = jnp.clip(s.animation_state, 0, n_anims - 1)
    fcount = jnp.maximum(frame_counts[sheet, anim], 1).astype(jnp.float32)
    accum = jnp.where(run, s.animation_accum + s.animation_speed * dt_ratio, s.animation_accum)
    accum = jnp.where(accum >= fcount, accum - fcount * jnp.floor(accum / fcount), accum)
    frame = jnp.minimum(jnp.floor(accum), fcount - 1).astype(jnp.int32)
    return world.replace(
        sprite=s.replace(
            animation_accum=accum,
            animation_frame=jnp.where(run, frame, s.animation_frame),
        )
    )


def extract_render_packet(
    world: World, cfg: EngineConfig, max_visible: int
) -> RenderPacket:
    """Compact visible entities into a dense packet; Y-sorted when
    cfg.renderer.y_sorting (depth order, pixi_worker.js:937-960)."""
    t, s = world.transform, world.sprite
    n = t.x.shape[0]
    visible = t.active & s.active & s.render_visible & s.is_on_screen
    if cfg.renderer.y_sorting:
        # sort key: invisible → +inf so they sink to the tail; visible by y
        key = jnp.where(visible, t.y, jnp.inf)
        order = jnp.argsort(key, stable=True)[:max_visible]
    else:
        order = jnp.argsort(~visible, stable=True)[:max_visible]
    valid = visible[order]
    idx = jnp.where(valid, order.astype(jnp.int32), -1)
    g = lambda arr: arr[order]
    return RenderPacket(
        count=jnp.sum(visible, dtype=jnp.int32).clip(max=max_visible),
        index=idx,
        x=g(t.x), y=g(t.y),
        screen_x=g(s.screen_x), screen_y=g(s.screen_y),
        rotation=g(t.rotation),
        scale_x=g(s.scale_x), scale_y=g(s.scale_y),
        anchor_x=g(s.anchor_x), anchor_y=g(s.anchor_y),
        tint=g(s.tint), alpha=g(s.alpha),
        spritesheet_id=g(s.spritesheet_id),
        animation_state=g(s.animation_state),
        animation_frame=g(s.animation_frame),
        z_offset=g(s.z_offset),
    )
