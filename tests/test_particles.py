"""Particle pool, emitter, decal stamping, and screen-culling tests
(particle_worker.js / ParticleEmitter.js semantics)."""

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu.models.predators import make_predators_engine


def particle_engine(max_particles=256, decals=False, **over):
    eng = make_predators_engine(
        n_prey=4, n_predators=1, n_lights=0, spawn=False,
        particle=dict(
            max_particles=max_particles, decals=decals,
            decals_tile_size=256, decals_resolution=0.5,
        ),
        **over,
    )
    return eng


class TestEmitter:
    def test_emit_claims_first_free_slots(self):
        eng = particle_engine()
        queued = eng.emitter.emit(count=5, x=100.0, y=100.0, z=-10.0,
                                  vx=1.0, vy=0.0, lifespan=5000.0, gravity=0.0)
        assert queued == 5
        eng.step(1)
        p = jax.device_get(eng.world.particles)
        assert p.active[:5].all() and not p.active[5:].any()
        # moved one frame: x += vx (dt_ratio=1), z unchanged by zero gravity
        np.testing.assert_allclose(p.x[:5], 101.0, atol=1e-5)
        assert (p.z[:5] < 0).all()

    def test_polar_mode_velocity(self):
        eng = particle_engine()
        eng.emitter.emit(count=1, x=0.0, y=0.0, z=-50.0,
                         angle_xy=90.0, speed=2.0, lifespan=9000.0, gravity=0.0)
        eng.step(1)
        p = jax.device_get(eng.world.particles)
        # 90 degrees = straight down (+y) in the reference convention
        np.testing.assert_allclose(p.vy[0], 2.0, atol=1e-5)
        np.testing.assert_allclose(p.vx[0], 0.0, atol=1e-5)

    def test_ranges_and_tint_interpolation(self):
        eng = particle_engine()
        eng.emitter.emit(count=50, x=(10.0, 20.0), y=0.0, z=-10.0,
                         lifespan=(500.0, 900.0), scale=(0.1, 0.2),
                         tint={"min": 0xAAAAAA, "max": 0xFFFFFF},
                         gravity=0.0)
        eng.step(1)
        p = jax.device_get(eng.world.particles)
        assert (p.x[:50] >= 10.0).all() and (p.x[:50] <= 21.0).all()
        assert (p.lifespan[:50] >= 500.0).all() and (p.lifespan[:50] <= 900.0).all()
        channels = (p.tint[:50] >> 16) & 0xFF
        assert (channels >= 0xAA).all()

    def test_pool_exhaustion_drops_excess(self):
        eng = particle_engine(max_particles=16)
        eng.emitter.emit(count=40, x=0.0, y=0.0, z=-10.0, lifespan=9000.0)
        eng.step(1)
        p = jax.device_get(eng.world.particles)
        assert p.active.sum() == 16


class TestParticlePhysics:
    def test_lifetime_expiry(self):
        eng = particle_engine()
        # dt_ms per step = 1000/60 ≈ 16.67; lifespan 40ms -> dead on step 3
        eng.emitter.emit(count=1, x=0.0, y=0.0, z=-100.0, lifespan=40.0, gravity=0.0)
        eng.step(2)
        assert jax.device_get(eng.world.particles).active[0]
        eng.step(1)
        assert not jax.device_get(eng.world.particles).active[0]

    def test_gravity_pulls_to_floor_and_stops(self):
        eng = particle_engine()
        eng.emitter.emit(count=1, x=0.0, y=0.0, z=-5.0, vz=0.0,
                         lifespan=60000.0, gravity=0.5)
        for _ in range(12):
            eng.step(1)
        p = jax.device_get(eng.world.particles)
        assert p.active[0]
        assert p.z[0] == 0.0  # landed and clamped
        assert p.vx[0] == 0.0 and p.vz[0] == 0.0

    def test_fade_on_the_floor(self):
        eng = particle_engine()
        eng.emitter.emit(count=1, x=0.0, y=0.0, z=-1.0, vz=2.0,
                         lifespan=60000.0, gravity=0.0, alpha=1.0,
                         fade_on_the_floor=100.0)
        eng.step(2)  # lands
        a1 = float(jax.device_get(eng.world.particles).alpha[0])
        eng.step(2)
        p = jax.device_get(eng.world.particles)
        a2 = float(p.alpha[0])
        assert a2 < a1 <= 1.0
        eng.step(5)  # 100ms fade elapses (~6 steps of 16.7ms)
        assert not jax.device_get(eng.world.particles).active[0]

    def test_stay_on_floor_despawns_and_stamps(self):
        eng = particle_engine(decals=True)
        eng.emitter.emit(count=3, x=500.0, y=400.0, z=-1.0, vz=5.0,
                         lifespan=60000.0, gravity=0.0, texture="blood",
                         stay_on_the_floor=True, scale=1.0, tint=0xFF0000)
        eng.step(3)
        w = jax.device_get(eng.world)
        assert not w.particles.active[:3].any()  # despawned on landing
        canvas = np.asarray(w.decal_canvas)
        assert canvas[..., 3].max() > 0  # something was stamped
        # stamped red: red channel >> blue channel where alpha present
        ys, xs = np.where(canvas[..., 3] > 128)
        assert len(ys) > 0
        assert canvas[ys, xs, 0].mean() > canvas[ys, xs, 2].mean() + 50
        dirty = np.asarray(w.decal_dirty)
        assert dirty.any()
        # stamp near world (500, 400) * resolution 0.5 => canvas (200, 250)
        assert abs(ys.mean() - 200) < 20 and abs(xs.mean() - 250) < 20


class TestCulling:
    def test_entity_visibility_and_screen_coords(self):
        eng = particle_engine()
        i = eng.spawn("Prey", x=100.0, y=100.0)
        j = eng.spawn("Prey", x=4900.0, y=1900.0)
        # camera at origin corner, zoom 1
        eng.input.camera_x = 0.0
        eng.input.camera_y = 0.0
        eng.input.camera_zoom = 1.0
        eng.step(1)
        s = jax.device_get(eng.world.sprite)
        assert s.is_on_screen[i]
        assert not s.is_on_screen[j]
        assert abs(float(s.screen_x[i]) - 100.0) < 2.5  # moved slightly by tick
        # margin: 15% beyond canvas still counts as visible
        k = eng.spawn("Prey", x=eng.config.canvas_width + 0.1 * eng.config.canvas_width, y=100.0)
        eng.step(1)
        s = jax.device_get(eng.world.sprite)
        assert s.is_on_screen[k]

    def test_particle_visibility(self):
        eng = particle_engine()
        eng.input.camera_x = 0.0
        eng.input.camera_y = 0.0
        eng.emitter.emit(count=1, x=50.0, y=50.0, z=-10.0, lifespan=9000.0, gravity=0.0)
        eng.emitter.emit(count=1, x=4500.0, y=1900.0, z=-10.0, lifespan=9000.0, gravity=0.0)
        eng.step(1)
        p = jax.device_get(eng.world.particles)
        assert p.is_on_screen[0]
        assert not p.is_on_screen[1]
