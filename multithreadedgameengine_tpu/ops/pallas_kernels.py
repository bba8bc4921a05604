"""Pallas TPU kernel for the collision pair pass.

One Jacobi separation pass over the padded solver grid (the hot inner loop of
ops/physics_grid.py, itself the TPU mapping of resolveCollisionsVerlet,
physics_worker.js:405-568), as a hand-scheduled kernel:

 - inputs live in HBM in slot-major layout ``[cap, rows, cols]`` (columns in
   the 128-lane dimension for full VPU occupancy) and stream through VMEM in
   row tiles — one aligned async DMA per field per tile;
 - the 3×3 neighborhood is realized with ``pltpu.roll`` shifts (Mosaic's
   aligned-slice rules forbid ±1 sublane/lane slicing); rolled wraparound
   only ever lands in the empty border cells, which the occupancy masks kill;
 - the per-slot neighbor loop is fully unrolled (capacity is a small static),
   and every intermediate lives in VMEM/registers — no HBM round-trips
   between the ~9·cap loop bodies.

Selected via ``physics.solver = "pallas"`` (grid solver otherwise identical);
runs in interpret mode off-TPU so tests exercise the same code path.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .physics import _pair_hash_angle
from .spatial import GridGeom

HALO = 8  # row halo per side; sublane tiling demands 8-aligned DMA slices


def _roll2(x, dr: int, dc: int):
    """Shift so out[..., r, c] = x[..., r+dr, c+dc] (wrap — callers mask).
    pltpu.roll only takes non-negative shifts; negatives wrap by dim size."""
    out = x
    if dr:
        out = pltpu.roll(out, (-dr) % x.shape[1], 1)
    if dc:
        out = pltpu.roll(out, (-dc) % x.shape[2], 2)
    return out


def _pair_kernel(
    salt_ref,  # SMEM (1,) uint32
    x_ref, y_ref, r_ref, p_ref, g_ref,  # ANY (HBM), slot-major [cap, Rp, Cp]
    dx_out, dy_out, cnt_out,  # VMEM blocks [1, cap, TR, Cp]
    xt_ref, yt_ref, rt_ref, pt_ref, gt_ref,  # scratch [cap, TR+2H, Cp] (DMA)
    xr_ref, yr_ref, rr_ref, pr_ref, gr_ref,  # scratch: rolled per offset
    sems,
    *, tr: int, cap: int, strength: float, interpret: bool,
):
    i = pl.program_id(0)
    row0 = i * tr  # aligned: tr % 8 == 0

    copies = [
        pltpu.make_async_copy(src.at[:, pl.ds(row0, tr + 2 * HALO)], dst, sems.at[k])
        for k, (src, dst) in enumerate([
            (x_ref, xt_ref), (y_ref, yt_ref), (r_ref, rt_ref),
            (p_ref, pt_ref), (g_ref, gt_ref),
        ])
    ]
    for cp_ in copies:
        cp_.start()
    for cp_ in copies:
        cp_.wait()

    ctr = slice(HALO, HALO + tr)
    xs = xt_ref[:, ctr, :]  # [cap, TR, Cp] self slots (borders masked)
    ys = yt_ref[:, ctr, :]
    rs = rt_ref[:, ctr, :]
    pk_i = pt_ref[:, ctr, :]
    id_i = gt_ref[:, ctr, :]
    ok_i = (pk_i & 1) == 1
    trig_i = (pk_i & 2) != 0
    st_i = (pk_i & 4) != 0
    salt = salt_ref[0]

    acc = (
        jnp.zeros(xs.shape, jnp.float32),
        jnp.zeros(xs.shape, jnp.float32),
        jnp.zeros(xs.shape, jnp.int32),
    )

    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            # roll the whole halo tile once per offset into reusable scratch
            xr_ref[...] = _roll2(xt_ref[...], dr, dc)
            yr_ref[...] = _roll2(yt_ref[...], dr, dc)
            rr_ref[...] = _roll2(rt_ref[...], dr, dc)
            pr_ref[...] = _roll2(pt_ref[...], dr, dc)
            gr_ref[...] = _roll2(gt_ref[...], dr, dc)

            def j_body(j, inner):
                acc_x, acc_y, acc_c = inner
                sl = (pl.ds(j, 1), ctr, slice(None))
                xb = xr_ref[sl]
                yb = yr_ref[sl]
                rb_ = rr_ref[sl]
                pkb = pr_ref[sl]
                idb = gr_ref[sl]

                ok = ok_i & ((pkb & 1) == 1) & (id_i != idb)
                dx = xs - xb
                dy = ys - yb
                d2 = dx * dx + dy * dy
                min_d = rs + rb_
                overlap = ok & (d2 < min_d * min_d)

                trig = trig_i | ((pkb & 2) != 0)
                st_j = (pkb & 4) != 0
                share = jnp.where(trig | st_i, 0.0, jnp.where(st_j, 1.0, 0.5))
                dist = jnp.sqrt(d2)
                inv_dist = jnp.where(dist > 0, 1.0 / jnp.maximum(dist, 1e-30), 0.0)
                corr = (min_d - dist) * strength * share

                zero = d2 == 0
                ang = _pair_hash_angle(id_i, idb, salt)
                sign = jnp.where(id_i < idb, 1.0, -1.0)
                zshare = jnp.where(
                    trig | st_i, 0.0, jnp.where(st_j, 2.0, 1.0)
                ) * sign * jnp.float32(0.001)
                push_x = jnp.where(zero, jnp.cos(ang) * zshare, dx * inv_dist * corr)
                push_y = jnp.where(zero, jnp.sin(ang) * zshare, dy * inv_dist * corr)
                ov = overlap.astype(jnp.float32)
                return (
                    acc_x + push_x * ov,
                    acc_y + push_y * ov,
                    acc_c + overlap.astype(jnp.int32),
                )

            acc = jax.lax.fori_loop(0, cap, j_body, acc)

    dx_out[0], dy_out[0], cnt_out[0] = acc


@functools.partial(
    jax.jit,
    static_argnames=("geom", "strength", "tile_rows", "interpret"),
)
def pair_pass_pallas(
    x_grid: jnp.ndarray,  # f32[R+2, C+2, cap]
    y_grid: jnp.ndarray,
    attrs: jnp.ndarray,  # f32[R+2, C+2, cap, 3] (radius, flags, gid)
    salt: jnp.ndarray,  # uint32 scalar
    geom: GridGeom,
    strength: float,
    tile_rows: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pair pass. Returns (disp_x, disp_y, count), each [R+2, C+2, cap]
    (center rows/cols populated, borders zero)."""
    rows, cols, cap = geom.rows, geom.cols, geom.capacity
    tr = tile_rows
    n_tiles = math.ceil(rows / tr)
    # lane dim padded to the 128 tiling (Mosaic DMA alignment); extra columns
    # are empty cells
    cp = math.ceil((cols + 2) / 128) * 128

    # slot-major layout [cap, rows_buf, Cp]; the grid's own 1-row border is
    # replaced by HALO-row borders so every tile's DMA window is 8-aligned
    xt = jnp.transpose(x_grid, (2, 0, 1))[:, 1:-1, :]
    yt = jnp.transpose(y_grid, (2, 0, 1))[:, 1:-1, :]
    rt = jnp.transpose(attrs[..., 0], (2, 0, 1))[:, 1:-1, :]
    pt = jnp.transpose(attrs[..., 1], (2, 0, 1)).astype(jnp.int32)[:, 1:-1, :]
    gt = jnp.transpose(attrs[..., 2], (2, 0, 1)).astype(jnp.int32)[:, 1:-1, :]
    rows_buf = n_tiles * tr + 2 * HALO
    pad = ((0, 0), (HALO, rows_buf - HALO - rows), (0, cp - (cols + 2)))
    xt = jnp.pad(xt, pad)
    yt = jnp.pad(yt, pad)
    rt = jnp.pad(rt, pad)
    pt = jnp.pad(pt, pad)
    gt = jnp.pad(gt, pad, constant_values=-1)  # empty slots: gid -1

    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, cap, tr, cp), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, cap, tr, cp), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, cap, tr, cp), jnp.int32),
    ]
    kernel = functools.partial(
        _pair_kernel, tr=tr, cap=cap, strength=strength, interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        out_specs=[
            pl.BlockSpec((1, cap, tr, cp), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, cap, tr, cp), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, cap, tr, cp), lambda i, *_: (i, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # DMA dst x
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # y
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # radius
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.int32),  # flags
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.int32),  # gid
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # rolled x
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # rolled y
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # rolled radius
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.int32),  # rolled flags
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.int32),  # rolled gid
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    salt_arr = jnp.asarray(salt, jnp.uint32).reshape(1)
    dx_t, dy_t, cnt_t = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # 10 halo-tile scratch buffers exceed the 16M default scoped
            # budget; v5e has 128M physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(salt_arr, xt, yt, rt, pt, gt)

    def untile(t, dtype):
        # [n_tiles, cap, TR, Cp] -> [rows, cols+2, cap] -> padded grid shape
        full = jnp.transpose(t, (0, 2, 3, 1)).reshape(n_tiles * tr, cp, cap)
        full = full[:rows, : cols + 2]
        out = jnp.zeros((rows + 2, cols + 2, cap), dtype)
        return out.at[1:-1, :, :].set(full)

    return (
        untile(dx_t, jnp.float32),
        untile(dy_t, jnp.float32),
        untile(cnt_t, jnp.int32),
    )
