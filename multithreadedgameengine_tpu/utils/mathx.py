"""Vectorized math utilities — the device-side port of src/core/utils.js.

Every function is jnp-traceable and elementwise (usable both per-entity inside
vmapped ticks and on whole arrays). Host-side helpers (randomRange/randomColor)
live on the Mulberry32 stream in rng.py.
"""

from __future__ import annotations

import jax.numpy as jnp

# direction indices for the 4-way animation facing
DIR_UP, DIR_RIGHT, DIR_DOWN, DIR_LEFT = 0, 1, 2, 3
DIRECTION_NAMES = ("up", "right", "down", "left")


def clamp(value, lo, hi):
    """utils.js:28-30."""
    return jnp.clip(value, lo, hi)


def clamp01(value):
    """utils.js:16-19."""
    return jnp.clip(value, 0.0, 1.0)


def lerp(a, b, t):
    """utils.js:39-41."""
    return a + (b - a) * t


def distance_sq_2d(x1, y1, x2, y2):
    """utils.js:103-107."""
    dx = x2 - x1
    dy = y2 - y1
    return dx * dx + dy * dy


def direction_from_angle(angle):
    """4-way facing from a velocityAngle (which already carries the +π/2
    sprite-rotation offset) — utils.js:308-331. Returns DIR_* ints:
    [315°,45°)→up, [45°,135°)→right, [135°,225°)→down, else left."""
    two_pi = 2.0 * jnp.pi
    norm = jnp.where(angle < 0, angle + two_pi, angle)
    q = jnp.pi / 4.0
    return jnp.where(
        (norm < q) | (norm >= 7 * q),
        DIR_UP,
        jnp.where(norm < 3 * q, DIR_RIGHT, jnp.where(norm < 5 * q, DIR_DOWN, DIR_LEFT)),
    ).astype(jnp.int32)


def light_attenuation(intensity, distance_sq):
    """Capped inverse-square falloff ``intensity / (intensity + d²)``
    (utils.js:378-380) — max 1.0 at d=0, 50% brightness at d=sqrt(intensity)."""
    return intensity / (intensity + distance_sq)


def pack_rgb(r, g, b):
    return (
        (jnp.asarray(r, jnp.uint32) << 16)
        | (jnp.asarray(g, jnp.uint32) << 8)
        | jnp.asarray(b, jnp.uint32)
    )


def unpack_rgb(color):
    c = jnp.asarray(color, jnp.uint32)
    return (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF


def brightness_to_tint(brightness):
    """utils.js:479-483."""
    v = jnp.round(clamp01(brightness) * 255.0).astype(jnp.uint32)
    return (v << 16) | (v << 8) | v


def brightness_to_colored_tint(brightness, base_color=0xFFFFFF):
    """utils.js:493-507 — multiply a base color by a clamped brightness."""
    b = clamp01(brightness)
    r, g, bl = unpack_rgb(base_color)
    return pack_rgb(
        jnp.round(r * b).astype(jnp.uint32),
        jnp.round(g * b).astype(jnp.uint32),
        jnp.round(bl * b).astype(jnp.uint32),
    )


def rgb_to_bgr(color):
    """utils.js:566-571."""
    r, g, b = unpack_rgb(color)
    return (b << 16) | (g << 8) | r
