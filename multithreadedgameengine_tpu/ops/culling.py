"""Screen-space culling: world→screen transform + viewport test with margin.

Exact port of the particle worker's entity/particle visibility math
(particle_worker.js:1012-1056 entities, :506-517 particles; camera bounds
:377-403): ``screen = world·zoom − camera·zoom``, visible iff within the
canvas extended by a 15% margin (config.renderer.cull_margin).

In the reference this runs on the particle worker "to balance load"
(spatial_worker.js:293); here it is a cheap fused elementwise pass that runs
every step regardless of whether a particle pool exists — entities keep
``is_on_screen``/``screen_x``/``screen_y`` current for the render-extraction
path and the onScreenEnter/Exit transitions (logic_worker.js:534-554).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import EngineConfig
from ..inputs import InputState
from ..state import World


def camera_bounds(cfg: EngineConfig, inputs: InputState):
    zoom = inputs.camera_zoom
    off_x = inputs.camera_x * zoom
    off_y = inputs.camera_y * zoom
    mx = cfg.canvas_width * cfg.renderer.cull_margin
    my = cfg.canvas_height * cfg.renderer.cull_margin
    return zoom, off_x, off_y, (-mx, cfg.canvas_width + mx, -my, cfg.canvas_height + my)


def update_entity_visibility(world: World, cfg: EngineConfig, inputs: InputState) -> World:
    """particle_worker.js:1012-1056."""
    t, s = world.transform, world.sprite
    zoom, off_x, off_y, (min_x, max_x, min_y, max_y) = camera_bounds(cfg, inputs)
    sx = t.x * zoom - off_x
    sy = t.y * zoom - off_y
    on = (sx > min_x) & (sx < max_x) & (sy > min_y) & (sy < max_y)
    return world.replace(
        sprite=s.replace(
            screen_x=jnp.where(t.active, sx, s.screen_x),
            screen_y=jnp.where(t.active, sy, s.screen_y),
            is_on_screen=jnp.where(t.active, on, s.is_on_screen),
        )
    )


def update_particle_visibility(world: World, cfg: EngineConfig, inputs: InputState) -> World:
    """particle_worker.js:506-517."""
    p = world.particles
    if p.x.shape[0] == 0:
        return world
    zoom, off_x, off_y, (min_x, max_x, min_y, max_y) = camera_bounds(cfg, inputs)
    sx = p.x * zoom - off_x
    sy = p.y * zoom - off_y
    on = (sx > min_x) & (sx < max_x) & (sy > min_y) & (sy < max_y)
    return world.replace(
        particles=p.replace(is_on_screen=jnp.where(p.active, on, p.is_on_screen))
    )
