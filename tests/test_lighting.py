"""Lighting extraction tests: shadow sprites (particle_worker.js:861-1004),
light uniforms (pixi_worker.js:1256-1312), entity light levels
(utils.js:439-470)."""

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu.models.predators import make_predators_engine
from multithreadedgameengine_tpu.ops.lighting import (
    entity_light_levels,
    light_uniforms,
)
from multithreadedgameengine_tpu.ops.spatial import neighbor_lists


def lit_engine(**over):
    eng = make_predators_engine(
        n_prey=10, n_predators=0, n_lights=3, spawn=False,
        lighting=dict(enabled=True, shadows_enabled=True,
                      max_shadow_casting_lights=4, max_shadows_per_light=3,
                      max_lights=8),
        **over,
    )
    return eng


class TestShadowSprites:
    def test_shadows_cast_away_from_light(self):
        eng = lit_engine()
        li = eng.spawn("TallLight", x=1000.0, y=1000.0)
        pr = eng.spawn("Prey", x=1060.0, y=1000.0)  # 60 east of the light
        eng.input.camera_x = 900.0
        eng.input.camera_y = 900.0
        eng.step(2)
        w = jax.device_get(eng.world)
        ss = w.shadow_sprites
        assert ss.active.sum() == 1
        k = int(np.argmax(ss.active))
        # shadow anchors at the caster's feet nudged back toward the light:
        # pos = caster - dir*radius (particle_worker.js:962-964); the sprite
        # then *points* away via rotation
        prey_x = float(w.transform.x[pr])
        radius = float(w.shadow.shadow_radius[pr])
        assert ss.x[k] == pytest.approx(prey_x - radius, abs=2.0)
        # rotation = atan2(dy,dx) - pi/2 with dx>0, dy~0 -> ~ -pi/2
        assert ss.rotation[k] == pytest.approx(-np.pi / 2, abs=0.15)
        assert ss.alpha[k] > 0
        assert ss.scale_y[k] > 0 and ss.scale_x[k] > 0

    def test_per_light_and_global_caps(self):
        eng = lit_engine()
        eng.spawn("TallLight", x=1000.0, y=1000.0)
        for k in range(8):  # 8 casters around one light; cap is 3 per light
            a = 2 * np.pi * k / 8
            eng.spawn("Prey", x=1000.0 + 80 * np.cos(a), y=1000.0 + 80 * np.sin(a))
        eng.input.camera_x = 900.0
        eng.input.camera_y = 900.0
        eng.step(2)
        ss = jax.device_get(eng.world.shadow_sprites)
        assert ss.active.sum() == 3  # max_shadows_per_light

    def test_offscreen_light_casts_nothing(self):
        eng = lit_engine()
        eng.spawn("TallLight", x=4000.0, y=1900.0)
        eng.spawn("Prey", x=4060.0, y=1900.0)
        eng.input.camera_x = 0.0
        eng.input.camera_y = 0.0
        eng.step(2)
        ss = jax.device_get(eng.world.shadow_sprites)
        assert ss.active.sum() == 0

    def test_coincident_caster_skipped(self):
        """dist < 1 guard (particle_worker.js:955)."""
        eng = lit_engine()
        eng.spawn("TallLight", x=1000.0, y=1000.0)
        eng.spawn("Prey", x=1000.3, y=1000.0)
        eng.input.camera_x = 900.0
        eng.input.camera_y = 900.0
        eng.step(1)
        ss = jax.device_get(eng.world.shadow_sprites)
        assert ss.active.sum() == 0


class TestLightUniforms:
    def test_uniform_extraction(self):
        eng = lit_engine()
        a = eng.spawn("TallLight", x=100.0, y=200.0)
        b = eng.spawn("TallLight", x=300.0, y=400.0)
        eng.step(1)
        u = jax.device_get(light_uniforms(eng.world, eng.config))
        assert int(u.count) == 2
        assert set(np.asarray(u.x)[:2].tolist()) == {100.0, 300.0}
        assert (np.asarray(u.intensity)[:2] == 20000.0).all()
        assert (np.asarray(u.height)[:2] == 110.0).all()

    def test_capped_at_max_lights(self):
        eng = make_predators_engine(
            n_prey=0, n_predators=0, n_lights=12, spawn=False,
            lighting=dict(enabled=True, max_lights=5),
        )
        for k in range(12):
            eng.spawn("TallLight", x=100.0 * (k + 1), y=500.0)
        eng.step(1)
        u = jax.device_get(light_uniforms(eng.world, eng.config))
        assert int(u.count) == 5


class TestEntityLightLevels:
    def test_brightness_from_nearby_light(self):
        eng = lit_engine()
        eng.spawn("TallLight", x=1000.0, y=1000.0)
        near = eng.spawn("Prey", x=1050.0, y=1000.0)
        far = eng.spawn("Prey", x=1600.0, y=1000.0)  # outside its visual range
        eng.step(1)
        cfg = eng.config
        w = eng.world
        nbr = neighbor_lists(
            w.transform.x, w.transform.y, w.transform.active,
            w.collider.visual_range, cfg,
        )
        levels = np.asarray(jax.device_get(entity_light_levels(w, nbr, cfg)))
        ambient = cfg.lighting.lighting_ambient
        # attenuation at d=50: 20000/(20000+2500) ≈ 0.889, plus ambient
        assert levels[near] == pytest.approx(ambient + 20000 / 22500, abs=0.01)
        assert levels[far] == pytest.approx(ambient, abs=1e-3)
