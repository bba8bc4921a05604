"""Decal tilemap: permanent stamps blitted into a world-sized RGBA canvas.

The reference's blood-decal system (particle_worker.js:550-671) divides the
world into tiles of ``decals_tile_size`` world units rendered at
``decals_resolution``; landed particles blit a tinted, scaled,
nearest-neighbor-sampled texture into the tile RGBA SAB with alpha-over
blending and set a per-tile dirty flag the renderer consumes
(pixi_worker.js:1067-1107).

TPU shape: one device-resident uint8 canvas ``[H_px, W_px, 4]`` covering the
whole world at decal resolution (tiles remain the *dirty-tracking* unit, not
separate buffers). Each stamp is a fixed-size patch updated with
dynamic_slice / dynamic_update_slice inside a fori_loop over the per-step
stamp batch — stamps are rare (a few per frame), so a small serial loop of
dense patch ops beats any scatter formulation.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from .particles import StampBatch

# patch edge in canvas pixels; stamps scale the SOURCE sampling inside it
PATCH = 32
# decal source textures are normalized to this resolution
TEX_SIZE = 16


def canvas_shape(cfg: EngineConfig) -> Tuple[int, int]:
    res = cfg.particle.decals_resolution
    h = max(1, math.ceil(cfg.world_height * res))
    w = max(1, math.ceil(cfg.world_width * res))
    return h, w


def tile_grid_shape(cfg: EngineConfig) -> Tuple[int, int]:
    ts = cfg.particle.decals_tile_size
    ty = max(1, math.ceil(cfg.world_height / ts))
    tx = max(1, math.ceil(cfg.world_width / ts))
    return ty, tx


def default_decal_textures(n_textures: int) -> jnp.ndarray:
    """Procedural stand-ins for atlas decal textures: a radial splat with
    soft falloff (the renderer round swaps in real atlas frames). Texture 0
    is reserved/empty like the reference's missing-texture guard
    (particle_worker.js:563-566)."""
    yy, xx = np.mgrid[0:TEX_SIZE, 0:TEX_SIZE]
    cx = (TEX_SIZE - 1) / 2
    d = np.hypot(xx - cx, yy - cx) / (TEX_SIZE / 2)
    alpha = np.clip(1.0 - d, 0.0, 1.0) ** 1.5
    rgb = np.ones((TEX_SIZE, TEX_SIZE, 3), np.float32)
    tex = np.concatenate([rgb, alpha[..., None].astype(np.float32)], axis=-1)
    bank = np.zeros((max(n_textures, 1) + 1, TEX_SIZE, TEX_SIZE, 4), np.float32)
    bank[1:] = tex[None]
    # numpy on purpose: this is closed over by the fused step — device-array
    # closure constants are lifted to hidden executable params
    # nondeterministically (see Engine._frame_counts)
    return bank


def stamp_decals(
    canvas: jnp.ndarray,  # uint8[H, W, 4]
    dirty: jnp.ndarray,  # bool[tiles_y, tiles_x]
    stamps: StampBatch,
    textures: jnp.ndarray,  # f32[T, TEX, TEX, 4]
    cfg: EngineConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blit each valid stamp with tint multiply + alpha-over blending
    (stampParticleToTile, particle_worker.js:550-671) and mark dirty tiles."""
    if stamps.x.shape[0] == 0 or canvas.shape[0] <= 1:
        return canvas, dirty
    textures = jnp.asarray(textures)  # numpy closure const -> traced constant
    res = cfg.particle.decals_resolution
    h, w = canvas.shape[:2]
    ty, tx = dirty.shape
    tile_px = cfg.particle.decals_tile_size * res
    n_tex = textures.shape[0]

    # patch-local pixel coordinates
    pu = jnp.arange(PATCH, dtype=jnp.float32)
    pv = jnp.arange(PATCH, dtype=jnp.float32)
    pvv, puu = jnp.meshgrid(pv, pu, indexing="ij")  # [PATCH, PATCH] (y, x)

    def do_stamp(k, carry):
        canvas, dirty = carry
        valid = stamps.valid[k]
        # stamp size in canvas px (reference: texW * scale * resolution)
        size = jnp.maximum(stamps.scale[k] * TEX_SIZE * res, 1.0)
        cx = stamps.x[k] * res
        cy = stamps.y[k] * res
        x0 = jnp.clip((cx - PATCH / 2).astype(jnp.int32), 0, w - PATCH)
        y0 = jnp.clip((cy - PATCH / 2).astype(jnp.int32), 0, h - PATCH)

        # source sampling: nearest-neighbor, stamp centered in the patch
        fx = (puu + x0.astype(jnp.float32) - (cx - size / 2)) / size
        fy = (pvv + y0.astype(jnp.float32) - (cy - size / 2)) / size
        inside = (fx >= 0) & (fx < 1) & (fy >= 0) & (fy < 1)
        sx = jnp.clip((fx * TEX_SIZE).astype(jnp.int32), 0, TEX_SIZE - 1)
        sy = jnp.clip((fy * TEX_SIZE).astype(jnp.int32), 0, TEX_SIZE - 1)
        tex = textures[jnp.clip(stamps.texture_id[k], 0, n_tex - 1)]
        src = tex[sy, sx]  # [PATCH, PATCH, 4]

        # tint multiply (RGB 0-255 extracted from the packed uint32)
        tint = stamps.tint[k]
        tr = ((tint >> 16) & 0xFF).astype(jnp.float32) / 255.0
        tg = ((tint >> 8) & 0xFF).astype(jnp.float32) / 255.0
        tb = (tint & 0xFF).astype(jnp.float32) / 255.0
        src_rgb = src[..., :3] * jnp.stack([tr, tg, tb])
        src_a = src[..., 3] * stamps.alpha[k] * inside * valid

        old = jax.lax.dynamic_slice(canvas, (y0, x0, 0), (PATCH, PATCH, 4))
        old_f = old.astype(jnp.float32) / 255.0
        out_a = src_a + old_f[..., 3] * (1.0 - src_a)
        safe_a = jnp.maximum(out_a, 1e-6)
        out_rgb = (
            src_rgb * src_a[..., None]
            + old_f[..., :3] * old_f[..., 3:4] * (1.0 - src_a[..., None])
        ) / safe_a[..., None]
        new = jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)
        new8 = jnp.clip(jnp.round(new * 255.0), 0, 255).astype(jnp.uint8)
        canvas = jax.lax.dynamic_update_slice(canvas, new8, (y0, x0, 0))

        # dirty tiles touched by the patch corners
        t0x = jnp.clip((x0 / tile_px).astype(jnp.int32), 0, tx - 1)
        t1x = jnp.clip(((x0 + PATCH - 1) / tile_px).astype(jnp.int32), 0, tx - 1)
        t0y = jnp.clip((y0 / tile_px).astype(jnp.int32), 0, ty - 1)
        t1y = jnp.clip(((y0 + PATCH - 1) / tile_px).astype(jnp.int32), 0, ty - 1)
        for dy in (0, 1):
            for dx in (0, 1):
                tyi = jnp.where(dy == 0, t0y, t1y)
                txi = jnp.where(dx == 0, t0x, t1x)
                dirty = dirty.at[tyi, txi].set(
                    dirty[tyi, txi] | valid, mode="drop"
                )
        return canvas, dirty

    return jax.lax.fori_loop(0, stamps.x.shape[0], do_stamp, (canvas, dirty))
