"""Lighting data extraction: shadow sprites, light uniforms, entity lighting.

Ports of the reference's lighting pipeline pieces that run OFF the renderer:

 - :func:`shadow_sprites` — the particle worker's updateShadowSprites
   (particle_worker.js:861-1004): for each of the first
   ``max_shadow_casting_lights`` active on-screen lights (entity-index
   order), walk its neighbor list and emit up to ``max_shadows_per_light``
   shadow sprites for on-screen shadow casters — position at the caster's
   feet offset away from the light, length growing with distance and caster
   height, alpha = intensity / (2·d²).
 - :func:`light_uniforms` — the per-light x/y/intensity/rgb uniform arrays
   the renderer's fullscreen shader consumes (pixi_worker.js:1256-1312),
   capped at ``max_lights``.
 - :func:`entity_light_levels` — per-entity brightness from neighbor lights
   using the spatial pass's precomputed d² (utils.js:439-470
   calculateLightFromNeighbors; present-but-disabled CPU path in the
   reference, particle_worker.js:673-854).

The renderer-side GLSL (intensity/(intensity+d²) fullscreen pass,
pixi_worker.js:1206-1249) stays a host-renderer concern (render/).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..components import ShadowSprites
from ..config import EngineConfig
from ..state import World
from ..utils import light_attenuation
from .spatial import NeighborLists


@struct.dataclass
class LightUniforms:
    """First-``max_lights`` active on-screen lights for the shader pass."""

    count: jnp.ndarray  # int32 scalar
    x: jnp.ndarray  # f32[max_lights]
    y: jnp.ndarray
    intensity: jnp.ndarray
    color: jnp.ndarray  # uint32[max_lights]
    height: jnp.ndarray


def shadow_sprites(world: World, nbr: NeighborLists, cfg: EngineConfig) -> ShadowSprites:
    lc = cfg.lighting
    L = lc.max_shadow_casting_lights
    t, li, sp = world.transform, world.light, world.sprite

    # first L eligible lights in entity-index order (:906-916);
    # worlds smaller than L pad with inactive slots at the end
    light_ok = li.active & t.active & sp.is_on_screen & (li.light_intensity > 0)
    l_take = min(L, light_ok.shape[0])
    sel = jnp.argsort(~light_ok, stable=True)[:l_take]
    return _shadow_rows(
        world, cfg, sel, light_ok[sel], nbr.ids[sel], nbr.d2[sel]
    )


def shadow_sprites_by_class(world: World, light_specs, cfg: EngineConfig) -> ShadowSprites:
    """:func:`shadow_sprites` over PER-CLASS neighbor lists: ``light_specs``
    is a list of ``(start, count, NeighborLists)`` for the classes that
    declare LightEmitter, in slot-range order (ranges ascend with
    registration, so concatenating preserves global entity-index order —
    the reference's first-L selection order). Candidate widths pad to the
    widest class."""
    lc = cfg.lighting
    L = lc.max_shadow_casting_lights
    t, li, sp = world.transform, world.light, world.sprite
    if not light_specs:
        from ..components import ShadowSprites as _SS

        return _SS.zeros(L * lc.max_shadows_per_light)

    s_max = max(n.ids.shape[1] for _s, _c, n in light_specs)

    def padw(a, fill):
        return jnp.pad(a, ((0, 0), (0, s_max - a.shape[1])),
                       constant_values=fill)

    g = jnp.concatenate([
        jnp.arange(s, s + c, dtype=jnp.int32) for s, c, _n in light_specs
    ])
    ids = jnp.concatenate([padw(n.ids, -1) for _s, _c, n in light_specs])
    d2 = jnp.concatenate([padw(n.d2, 0.0) for _s, _c, n in light_specs])
    light_ok = (
        li.active & t.active & sp.is_on_screen & (li.light_intensity > 0)
    )[g]
    l_take = min(L, int(g.shape[0]))
    order_loc = jnp.argsort(~light_ok, stable=True)[:l_take]
    return _shadow_rows(
        world, cfg, g[order_loc], light_ok[order_loc],
        ids[order_loc], d2[order_loc],
    )


def _shadow_rows(
    world: World,
    cfg: EngineConfig,
    order: jnp.ndarray,
    l_valid: jnp.ndarray,
    ids: jnp.ndarray,
    d2: jnp.ndarray,
) -> ShadowSprites:
    """Shared shadow-sprite math for the selected lights: ``order`` =
    [l_take] global entity indices, ``ids``/``d2`` their neighbor rows."""
    lc = cfg.lighting
    L, M = lc.max_shadow_casting_lights, lc.max_shadows_per_light
    t, li, sh, sp = world.transform, world.light, world.shadow, world.sprite
    l_take = order.shape[0]
    lx = t.x[order][:, None]
    ly = t.y[order][:, None]
    l_int = li.light_intensity[order][:, None]
    j = jnp.maximum(ids, 0)

    dist = jnp.sqrt(d2)
    caster_ok = (
        l_valid[:, None]
        & (ids >= 0)
        & sh.active[j]
        & t.active[j]
        & sp.is_on_screen[j]
        & (dist >= 1.0)  # division-by-zero guard consumes no slot (:955)
    )
    rank = jnp.cumsum(caster_ok.astype(jnp.int32), axis=1)
    keep = caster_ok & (rank <= M)

    cx = t.x[j]
    cy = t.y[j]
    c_rad = jnp.where(sh.shadow_radius[j] > 0, sh.shadow_radius[j], 10.0)  # || 10 (:945)
    c_h = jnp.where(sh.height[j] > 0, sh.height[j], c_rad)  # || radius (:946)

    dx = cx - lx
    dy = cy - ly
    inv_dist = 1.0 / jnp.maximum(dist, 1e-6)
    dir_x = dx * inv_dist
    dir_y = dy * inv_dist
    pos_x = cx - dir_x * c_rad  # at the caster's feet, away from the light (:962-964)
    pos_y = cy - dir_y * c_rad
    dist_ratio = jnp.minimum(dist * (1.0 / 256.0), 1.0)
    height_factor = c_h * 0.025
    length_scale = (0.3 + dist_ratio * 0.9) * height_factor
    width_scale = c_rad * 0.0714
    alpha = l_int / jnp.maximum(d2 * 2.0, 1e-6)
    rotation = jnp.arctan2(dy, dx) - jnp.float32(jnp.pi / 2)

    # compact each light's kept shadows to its M slots (stable sort keeps
    # neighbor-scan order, like the sequential shadowIdx++ fill)
    ord2 = jnp.argsort(~keep, axis=1, stable=True)[:, :M]
    c2 = ord2.shape[1]  # may be < M when the world has fewer neighbor slots

    def gather(a):
        g = jnp.take_along_axis(a, ord2, axis=1)
        return jnp.pad(g, ((0, L - l_take), (0, M - c2))).reshape(-1)

    kept = gather(keep)
    return ShadowSprites(
        active=kept,
        x=gather(pos_x), y=gather(pos_y), rotation=gather(rotation),
        scale_x=gather(width_scale), scale_y=gather(length_scale),
        alpha=gather(alpha), radius=gather(c_rad),
    )


def light_uniforms(world: World, cfg: EngineConfig) -> LightUniforms:
    """pixi_worker.js:1256-1312 — uniform arrays for the lighting shader,
    first max_lights active lights (on- or off-screen: the shader handles
    falloff; the reference filters by light-emitter index ranges only)."""
    t, li = world.transform, world.light
    ml = cfg.lighting.max_lights
    ok = li.active & t.active & (li.light_intensity > 0)
    order = jnp.argsort(~ok, stable=True)[:ml]
    valid = ok[order]
    zero = jnp.float32(0.0)
    return LightUniforms(
        count=jnp.sum(valid, dtype=jnp.int32),
        x=jnp.where(valid, t.x[order], zero),
        y=jnp.where(valid, t.y[order], zero),
        intensity=jnp.where(valid, li.light_intensity[order], zero),
        color=jnp.where(valid, li.light_color[order], jnp.uint32(0)),
        height=jnp.where(valid, li.height[order], zero),
    )


def entity_light_levels(
    world: World, nbr: NeighborLists, cfg: EngineConfig
) -> jnp.ndarray:
    """Per-entity brightness from neighbor lights + ambient, clamped to 1.5
    (calculateLightFromNeighbors, utils.js:439-470). Returns f32[N]."""
    t, li = world.transform, world.light
    j = jnp.maximum(nbr.ids, 0)
    lit = (nbr.ids >= 0) & li.active[j] & (li.light_intensity[j] > 0)
    contrib = jnp.where(
        lit, light_attenuation(li.light_intensity[j], nbr.d2), 0.0
    )
    total = cfg.lighting.lighting_ambient + jnp.sum(contrib, axis=1)
    return jnp.minimum(total, 1.5)
