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

from .physics import _pair_hash_dir
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
                inv_dist = jnp.where(d2 > 0, jax.lax.rsqrt(d2), 0.0)
                dist = d2 * inv_dist
                corr = (min_d - dist) * strength * share

                zero = d2 == 0
                ux, uy = _pair_hash_dir(id_i, idb, salt)
                sign = jnp.where(id_i < idb, 1.0, -1.0)
                zshare = jnp.where(
                    trig | st_i, 0.0, jnp.where(st_j, 2.0, 1.0)
                ) * sign * jnp.float32(0.001)
                push_x = jnp.where(zero, ux * zshare, dx * inv_dist * corr)
                push_y = jnp.where(zero, uy * zshare, dy * inv_dist * corr)
                ov = overlap.astype(jnp.float32)
                return (
                    acc_x + push_x * ov,
                    acc_y + push_y * ov,
                    acc_c + overlap.astype(jnp.int32),
                )

            acc = jax.lax.fori_loop(0, cap, j_body, acc)

    dx_out[0], dy_out[0], cnt_out[0] = acc


def _resident_kernel(
    salt_ref,  # SMEM (1,) uint32
    x_ref, y_ref, r_ref, m_ref,  # ANY (HBM), slot-major [cap, rows_buf, Cp]
    newx_out, newy_out, cnt_out,  # VMEM blocks [cap, TR, Cp]
    xt_ref, yt_ref, rt_ref, mt_ref,  # scratch [cap, TR+2H, Cp] (DMA dst)
    xr_ref, yr_ref, rr_ref, mr_ref,  # scratch: rolled per offset
    ax_ref, ay_ref, ac_ref,  # scratch accumulators [cap, TR, Cp]
    sems,
    *, tr: int, cap: int, strength: float,
):
    _resident_body(
        salt_ref, x_ref, y_ref, r_ref, m_ref,
        newx_out, newy_out, cnt_out,
        xt_ref, yt_ref, rt_ref, mt_ref,
        xr_ref, yr_ref, rr_ref, mr_ref,
        ax_ref, ay_ref, ac_ref,
        sems, tr=tr, cap=cap, strength=strength,
    )


def _resident_kernel_sym(
    salt_ref,
    x_ref, y_ref, r_ref, m_ref,
    newx_out, newy_out, cnt_out, sx_out, sy_out, sc_out,
    xt_ref, yt_ref, rt_ref, mt_ref,
    ax_ref, ay_ref, ac_ref, sx_ref, sy_ref, sc_ref,
    occ_ctr_ref, occ_halo_ref, bx_ref, by_ref, bc_ref,
    oki_ref, ai_ref, bi_ref,
    sems,
    *, tr: int, cap: int, strength: float, clamp_bounds=None,
):
    _resident_body_pred(
        salt_ref, x_ref, y_ref, r_ref, m_ref,
        newx_out, newy_out, cnt_out, sx_out, sy_out, sc_out,
        xt_ref, yt_ref, rt_ref, mt_ref,
        ax_ref, ay_ref, ac_ref, sx_ref, sy_ref, sc_ref,
        occ_ctr_ref, occ_halo_ref, bx_ref, by_ref, bc_ref,
        oki_ref, ai_ref, bi_ref,
        sems, tr=tr, cap=cap, strength=strength,
        clamp_bounds=clamp_bounds,
    )


def _resident_body_pred(
    salt_ref,  # SMEM (1,) uint32
    x_ref, y_ref, r_ref, m_ref,  # ANY (HBM), slot-major [cap, rows_buf, Cp]
    newx_out, newy_out, cnt_out,  # VMEM blocks [cap, TR, Cp]
    sx_out, sy_out, sc_out,  # spill row [1, cap, 8, Cp]
    xt_ref, yt_ref, rt_ref, mt_ref,  # scratch [cap, TR+2H, Cp] (DMA dst)
    ax_ref, ay_ref, ac_ref,  # scratch accumulators [cap, TR, Cp]
    sx_ref, sy_ref, sc_ref,  # spill accumulators [cap, 8, Cp]
    occ_ctr_ref, occ_halo_ref,  # SMEM (cap,) per-plane occupancy flags
    bx_ref, by_ref, bc_ref,  # scratch back-sums [TR, Cp]
    oki_ref, ai_ref, bi_ref,  # scratch decoded i-side planes [cap, TR, Cp]
    sems,
    *, tr: int, cap: int, strength: float, clamp_bounds=None,
):
    """Occupancy-PREDICATED Newton-symmetric pair pass — the production
    resident kernel (``symmetric=True``).

    ``clamp_bounds=(world_w, world_h)`` folds the world-boundary POSITION
    clamp (the `jnp.clip(x, r, extent - r)` half of physics_worker.js:344-376)
    into the kernel: the tile copies are clamped in VMEM right after the DMA,
    so every read — i-side, j-side halo windows, and the `newx = x + acc`
    base — sees post-clamp positions, exactly as when the XLA `_boundary`
    pass ran over the full layout before the kernel. The full-layout HBM
    read-modify-write that pass cost (~1.6 ms/substep at the 1M geometry)
    reduces to a few VPU ops on data already resident; the px/py bounce
    half stays outside (ops/physics_grid._resident_substeps applies it to
    the world-border bands only).

    Same pair math and same accumulation targets as `_resident_body`'s
    symmetric path, restructured so pair-block volume tracks OCCUPANCY
    instead of capacity²: the (offset, j) x all-i-planes block op becomes an
    (offset, j, i) scalar loop whose body is one [TR, Cp] plane-pair, with
    per-plane skip flags precomputed once per tile into SMEM —
    ``occ_ctr[i]`` (any collider in the i-plane's CENTER rows: the i side
    masks to center, so an empty center plane contributes nothing) and
    ``occ_halo[j]`` (any collider anywhere in the j-plane's halo tile: the
    rolled j window is a row/lane permutation of it). Cells fill slots
    rank-ascending, so at the 1M benchmark's measured occupancy (mean 1.9,
    ~7 of 12 planes live per tile — benchmarks/probe_tile_occupancy.py) the
    processed volume drops to (7/12)^2 of the dense enumeration, and a
    skipped plane's contribution is EXACTLY zero (push * overlap == 0
    elementwise), so predication does not perturb the values.

    Numerics vs `_resident_body(symmetric=True)`: per-pair values and each
    acc plane's (offset, j) addition order are identical; only the i-sum
    feeding the j-side back-accumulation becomes a sequential loop-carried
    sum (was one XLA reduce), so positions may differ by float rounding —
    within the same ~1e-5 envelope as symmetric-vs-two-sided, with int32
    contact counts still exact (tests/test_pallas.py)."""
    i_t = pl.program_id(0)
    row0 = i_t * tr  # aligned: tr % 8 == 0

    copies = [
        pltpu.make_async_copy(src.at[:, pl.ds(row0, tr + 2 * HALO)], dst, sems.at[k])
        for k, (src, dst) in enumerate([
            (x_ref, xt_ref), (y_ref, yt_ref), (r_ref, rt_ref), (m_ref, mt_ref),
        ])
    ]
    for cp_ in copies:
        cp_.start()
    for cp_ in copies:
        cp_.wait()

    if clamp_bounds is not None:
        # boundary position clamp on the VMEM-resident tile (see docstring);
        # where(moving) mirrors _boundary exactly: static/inactive/empty
        # slots keep their stored value bit-for-bit
        # plain Python floats: they inline as MLIR literals (a jnp scalar
        # here would be a captured constant, which pallas_call rejects)
        ww, wh = float(clamp_bounds[0]), float(clamp_bounds[1])
        mvt = ((mt_ref[...] >> 24) & 8) != 0
        rt = rt_ref[...]
        xt = xt_ref[...]
        xt_ref[...] = jnp.where(mvt, jnp.clip(xt, rt, ww - rt), xt)
        yt = yt_ref[...]
        yt_ref[...] = jnp.where(mvt, jnp.clip(yt, rt, wh - rt), yt)

    ctr = slice(HALO, HALO + tr)
    any_self = jnp.any(((mt_ref[:, ctr, :] >> 24) & 1) == 1)

    @pl.when(jnp.logical_not(any_self))
    def _():
        newx_out[...] = xt_ref[:, ctr, :]
        newy_out[...] = yt_ref[:, ctr, :]
        cnt_out[...] = jnp.zeros(newx_out.shape, jnp.int32)
        sx_out[...] = jnp.zeros(sx_out.shape, jnp.float32)
        sy_out[...] = jnp.zeros(sy_out.shape, jnp.float32)
        sc_out[...] = jnp.zeros(sc_out.shape, jnp.int32)

    @pl.when(any_self)
    def _():
        salt = salt_ref[0]

        def occ_body(k, _):
            mk = mt_ref[pl.ds(k, 1), :, :]
            occ_halo_ref[k] = jnp.any(((mk >> 24) & 1) == 1).astype(jnp.int32)
            mkc = mt_ref[pl.ds(k, 1), ctr, :]
            occ_k = jnp.any(((mkc >> 24) & 1) == 1)
            occ_ctr_ref[k] = occ_k.astype(jnp.int32)

            # hoisted i-side decodes (round 5): the pair body used to decode
            # ok/trigger/static from meta per (offset, j, i) iteration —
            # ~5*occupied² decodes per tile; once per plane here instead.
            # The share selects factorize: share(i,j) = A_i*B_j and
            # share_j(i,j) = A_j*B_i with A = (1-trig)(1-static) and
            # B = (1-trig)(0.5+0.5*static) — one multiply per side replaces
            # the or+2-select chain (verified against the select form by the
            # symmetric-vs-two-sided suite, tests/test_pallas.py).
            @pl.when(occ_k)
            def _():
                pk = mkc >> 24
                ksl = (pl.ds(k, 1), slice(None), slice(None))
                oki_ref[ksl] = (pk & 1).astype(jnp.int32)
                tq = ((pk >> 1) & 1).astype(jnp.float32)
                sq = ((pk >> 2) & 1).astype(jnp.float32)
                nt = 1.0 - tq
                ai_ref[ksl] = nt * (1.0 - sq)
                bi_ref[ksl] = nt * (0.5 + 0.5 * sq)

            return 0

        jax.lax.fori_loop(0, cap, occ_body, 0)

        ax_ref[...] = jnp.zeros(ax_ref.shape, jnp.float32)
        ay_ref[...] = jnp.zeros(ay_ref.shape, jnp.float32)
        ac_ref[...] = jnp.zeros(ac_ref.shape, jnp.int32)
        sx_ref[...] = jnp.zeros(sx_ref.shape, jnp.float32)
        sy_ref[...] = jnp.zeros(sy_ref.shape, jnp.float32)
        sc_ref[...] = jnp.zeros(sc_ref.shape, jnp.int32)

        # rolls happen ON DEMAND per occupied j-plane (roll a [1, TR+2H, Cp]
        # value by the offset's full (dr, dc)) instead of rolling every
        # field's whole [cap, ...] buffer per offset: at ~7/12 occupied
        # planes that is 0.58x the roll volume, and the 4 rolled scratch
        # buffers disappear from the kernel's VMEM footprint
        for dr, dc in ((0, 0), (0, 1), (1, 0), (1, 1), (1, -1)):
            # Newton's third law applies WITHIN the (0,0) cell too: i loops
            # from j+1 and the reciprocal lands on plane j via the roll-free
            # back path (_acc_back with dr=dc=0), halving same-cell trips —
            # the most common pair kind at the 1M benchmark's occupancy.
            back = True
            same_cell = dr == 0 and dc == 0

            def j_body(j, _, dr=dr, dc=dc, back=back, same_cell=same_cell):
                # (0,0) reads center rows only — the tighter center flag
                occ_j = occ_ctr_ref[j] if same_cell else occ_halo_ref[j]

                @pl.when(occ_j != 0)
                def _():
                    psl = (pl.ds(j, 1), slice(None), slice(None))
                    if dr or dc:
                        mjs = _roll2(mt_ref[psl], dr, dc)[:, ctr, :]
                        xb = _roll2(xt_ref[psl], dr, dc)[:, ctr, :]
                        yb = _roll2(yt_ref[psl], dr, dc)[:, ctr, :]
                        rb_ = _roll2(rt_ref[psl], dr, dc)[:, ctr, :]
                    else:
                        sl = (pl.ds(j, 1), ctr, slice(None))
                        mjs = mt_ref[sl]
                        xb = xt_ref[sl]
                        yb = yt_ref[sl]
                        rb_ = rt_ref[sl]
                    pkb = mjs >> 24
                    okb = (pkb & 1) == 1
                    # j-side share factors (see occ_body: share = A_i*B_j,
                    # share_j = A_j*B_i), decoded once per (offset, j)
                    tqb = ((pkb >> 1) & 1).astype(jnp.float32)
                    sqb = ((pkb >> 2) & 1).astype(jnp.float32)
                    ntb = 1.0 - tqb
                    a_j = ntb * (1.0 - sqb)
                    b_j = ntb * (0.5 + 0.5 * sqb)
                    if back:
                        bx_ref[...] = jnp.zeros(bx_ref.shape, jnp.float32)
                        by_ref[...] = jnp.zeros(by_ref.shape, jnp.float32)
                        bc_ref[...] = jnp.zeros(bc_ref.shape, jnp.int32)

                    def i_body(ii, _):
                        @pl.when(occ_ctr_ref[ii] != 0)
                        def _():
                            isl = (pl.ds(ii, 1), ctr, slice(None))
                            # decoded planes are center-only [cap, TR, Cp]
                            asl = (pl.ds(ii, 1), slice(None), slice(None))
                            xs = xt_ref[isl]
                            ys = yt_ref[isl]
                            rs = rt_ref[isl]

                            # gid uniqueness makes the old (id_i != idb)
                            # term provably true: a gid occupies exactly one
                            # slot (unique-index scatter), and every
                            # (offset, j, i) pairing reads two DISTINCT
                            # slots (same-cell runs i > j; shifted offsets
                            # read a different cell) — dropped from the hot
                            # path, ids now decode only in the rare
                            # coincident-pair branch below
                            ok = (oki_ref[asl] != 0) & okb
                            dx = xs - xb
                            dy = ys - yb
                            d2 = dx * dx + dy * dy
                            min_d = rs + rb_
                            overlap = ok & (d2 < min_d * min_d)

                            inv_dist = jnp.where(d2 > 0, jax.lax.rsqrt(d2), 0.0)
                            dist = d2 * inv_dist
                            # shared push base: (depth*strength/dist) once,
                            # then one multiply per side's share — replaces
                            # the per-side corr/corr_j chains
                            base = (min_d - dist) * strength * inv_dist
                            ov = overlap.astype(jnp.float32)
                            pxc = dx * (base * ov)
                            pyc = dy * (base * ov)
                            share = ai_ref[asl] * b_j
                            if back:
                                share_j = a_j * bi_ref[asl]
                            zero = d2 == 0
                            any_zero = jnp.any(zero & ok)

                            @pl.when(jnp.logical_not(any_zero))
                            def _():
                                ax_ref[asl] += pxc * share
                                ay_ref[asl] += pyc * share
                                if back:
                                    bx_ref[...] += (-(pxc * share_j))[0]
                                    by_ref[...] += (-(pyc * share_j))[0]
                                    bc_ref[...] += overlap.astype(jnp.int32)[0]

                            @pl.when(any_zero)
                            def _():
                                m_i = mt_ref[isl]
                                id_i = m_i & jnp.int32(0xFFFFFF)
                                idb = mjs & jnp.int32(0xFFFFFF)
                                ux, uy = _pair_hash_dir(id_i, idb, salt)
                                sign = jnp.where(id_i < idb, 1.0, -1.0)
                                # zmag = 2*A_i*B_j (0 trig/static-i; 2 if
                                # j static; else 1 — same table as before)
                                zshare = (2.0 * share) * sign * jnp.float32(0.001)
                                push_x = jnp.where(zero, ux * zshare * ov, pxc * share)
                                push_y = jnp.where(zero, uy * zshare * ov, pyc * share)
                                ax_ref[asl] += push_x
                                ay_ref[asl] += push_y
                                if back:
                                    zshare_j = (2.0 * share_j) * (-sign) * jnp.float32(0.001)
                                    bxv = jnp.where(
                                        zero, ux * zshare_j * ov, -(pxc * share_j)
                                    )
                                    byv = jnp.where(
                                        zero, uy * zshare_j * ov, -(pyc * share_j)
                                    )
                                    bx_ref[...] += bxv[0]
                                    by_ref[...] += byv[0]
                                    bc_ref[...] += overlap.astype(jnp.int32)[0]

                            ac_ref[asl] += overlap.astype(jnp.int32)

                        return 0

                    jax.lax.fori_loop(
                        j + 1 if same_cell else 0, cap, i_body, 0
                    )
                    if back:
                        _acc_back(
                            bx_ref[...], by_ref[...], bc_ref[...],
                            j, dr, dc,
                            ax_ref, ay_ref, ac_ref,
                            sx_ref, sy_ref, sc_ref,
                        )

                return 0

            jax.lax.fori_loop(0, cap, j_body, 0)

        newx_out[...] = xt_ref[:, ctr, :] + ax_ref[...]
        newy_out[...] = yt_ref[:, ctr, :] + ay_ref[...]
        cnt_out[...] = ac_ref[...]
        sx_out[0] = sx_ref[...]
        sy_out[0] = sy_ref[...]
        sc_out[0] = sc_ref[...]


def _resident_body(
    salt_ref,  # SMEM (1,) uint32
    x_ref, y_ref, r_ref, m_ref,  # ANY (HBM), slot-major [cap, rows_buf, Cp]
    newx_out, newy_out, cnt_out,  # VMEM blocks [cap, TR, Cp]
    xt_ref, yt_ref, rt_ref, mt_ref,  # scratch [cap, TR+2H, Cp] (DMA dst)
    xr_ref, yr_ref, rr_ref, mr_ref,  # scratch: rolled per offset
    ax_ref, ay_ref, ac_ref,  # scratch accumulators [cap, TR, Cp]
    sems,
    *, tr: int, cap: int, strength: float,
):
    """One Jacobi pair pass over resident slot-major fields.

    Differences vs the legacy `_pair_kernel` (kept for the halo path):
     - inputs stay in the slot-major layout the frame's binning scatters
       directly into — no grid↔slot-major transposes anywhere;
     - attributes ride ONE packed int32 (gid | flags<<24; empty slot = 0) —
       4 DMA'd fields instead of 5;
     - occupancy-aware: a tile with no colliders writes passthrough outputs
       and skips all pair work; within an active tile, each (offset, j) slot
       column is skipped unless some candidate occupies it (cells fill slots
       rank-ascending, so sparse regions only pay for their occupied ranks);
     - outputs are the UPDATED center positions (xs + Jacobi displacement),
       written straight into the resident row range.

    This is the TWO-SIDED 9-offset enumeration whose accumulation order is
    bit-identical to the XLA grid solver — the numerics reference the tests
    pin the production kernel against. The production symmetric kernel is
    `_resident_body_pred` (Newton-reciprocal + occupancy predication).
    """
    i = pl.program_id(0)
    row0 = i * tr  # aligned: tr % 8 == 0

    copies = [
        pltpu.make_async_copy(src.at[:, pl.ds(row0, tr + 2 * HALO)], dst, sems.at[k])
        for k, (src, dst) in enumerate([
            (x_ref, xt_ref), (y_ref, yt_ref), (r_ref, rt_ref), (m_ref, mt_ref),
        ])
    ]
    for cp_ in copies:
        cp_.start()
    for cp_ in copies:
        cp_.wait()

    ctr = slice(HALO, HALO + tr)
    m_ctr = mt_ref[:, ctr, :]
    xs = xt_ref[:, ctr, :]
    ys = yt_ref[:, ctr, :]
    any_self = jnp.any(((m_ctr >> 24) & 1) == 1)

    @pl.when(jnp.logical_not(any_self))
    def _():
        newx_out[...] = xs
        newy_out[...] = ys
        cnt_out[...] = jnp.zeros(xs.shape, jnp.int32)

    @pl.when(any_self)
    def _():
        rs = rt_ref[:, ctr, :]
        pk_i = m_ctr >> 24
        id_i = m_ctr & jnp.int32(0xFFFFFF)
        ok_i = (pk_i & 1) == 1
        trig_i = (pk_i & 2) != 0
        st_i = (pk_i & 4) != 0
        salt = salt_ref[0]

        ax_ref[...] = jnp.zeros(xs.shape, jnp.float32)
        ay_ref[...] = jnp.zeros(xs.shape, jnp.float32)
        ac_ref[...] = jnp.zeros(xs.shape, jnp.int32)

        offsets = tuple(
            ((dr, dc), None if (dr == 0 and dc == 0) else "base", dr, dc)
            for dr in (-1, 0, 1) for dc in (-1, 0, 1)
        )
        for (dr, dc), src, sdr, sdc in offsets:
            if src == "base":
                xr_ref[...] = _roll2(xt_ref[...], sdr, sdc)
                yr_ref[...] = _roll2(yt_ref[...], sdr, sdc)
                rr_ref[...] = _roll2(rt_ref[...], sdr, sdc)
                mr_ref[...] = _roll2(mt_ref[...], sdr, sdc)
                xj, yj, rj, mj = xr_ref, yr_ref, rr_ref, mr_ref
            elif src == "prev":
                xr_ref[...] = _roll2(xr_ref[...], sdr, sdc)
                yr_ref[...] = _roll2(yr_ref[...], sdr, sdc)
                rr_ref[...] = _roll2(rr_ref[...], sdr, sdc)
                mr_ref[...] = _roll2(mr_ref[...], sdr, sdc)
                xj, yj, rj, mj = xr_ref, yr_ref, rr_ref, mr_ref
            else:
                # (0,0) needs no rolled copy: read the DMA tiles directly
                xj, yj, rj, mj = xt_ref, yt_ref, rt_ref, mt_ref

            def j_body(j, _, xj=xj, yj=yj, rj=rj, mj=mj, dr=dr, dc=dc):
                sl = (pl.ds(j, 1), ctr, slice(None))
                mjs = mj[sl]
                use = jnp.any(((mjs >> 24) & 1) == 1)

                @pl.when(use)
                def _():
                    xb = xj[sl]
                    yb = yj[sl]
                    rb_ = rj[sl]
                    pkb = mjs >> 24
                    idb = mjs & jnp.int32(0xFFFFFF)

                    ok = ok_i & ((pkb & 1) == 1) & (id_i != idb)
                    dx = xs - xb
                    dy = ys - yb
                    d2 = dx * dx + dy * dy
                    min_d = rs + rb_
                    overlap = ok & (d2 < min_d * min_d)

                    trig = trig_i | ((pkb & 2) != 0)
                    st_j = (pkb & 4) != 0
                    share = jnp.where(
                        trig | st_i, 0.0, jnp.where(st_j, 1.0, 0.5)
                    )
                    inv_dist = jnp.where(d2 > 0, jax.lax.rsqrt(d2), 0.0)
                    dist = d2 * inv_dist
                    corr = (min_d - dist) * strength * share
                    ov = overlap.astype(jnp.float32)
                    zero = d2 == 0
                    any_zero = jnp.any(zero & ok)

                    # common case: no exactly-coincident pair in the block
                    # — the jitter hash (+rsqrt) never evaluates; at d2==0
                    # inv_dist is exact 0 so the normal push is exact 0
                    @pl.when(jnp.logical_not(any_zero))
                    def _():
                        ax_ref[...] += dx * inv_dist * corr * ov
                        ay_ref[...] += dy * inv_dist * corr * ov

                    @pl.when(any_zero)
                    def _():
                        ux, uy = _pair_hash_dir(id_i, idb, salt)
                        sign = jnp.where(id_i < idb, 1.0, -1.0)
                        zmag = jnp.where(
                            trig | st_i, 0.0, jnp.where(st_j, 2.0, 1.0)
                        )
                        zshare = zmag * sign * jnp.float32(0.001)
                        push_x = jnp.where(zero, ux * zshare, dx * inv_dist * corr)
                        push_y = jnp.where(zero, uy * zshare, dy * inv_dist * corr)
                        ax_ref[...] += push_x * ov
                        ay_ref[...] += push_y * ov

                    ac_ref[...] += overlap.astype(jnp.int32)

                return 0

            jax.lax.fori_loop(0, cap, j_body, 0)

        newx_out[...] = xs + ax_ref[...]
        newy_out[...] = ys + ay_ref[...]
        cnt_out[...] = ac_ref[...]


def _acc_back(bx, by, bc, j, dr: int, dc: int,
              ax_ref, ay_ref, ac_ref, sx_ref, sy_ref, sc_ref):
    """Accumulate the j-side (reciprocal) contribution of one (offset, j)
    iteration. ``bx/by/bc`` are [TR, Cp] sums over i-planes, aligned to the
    i rows; the j entities sit at (r+dr, c+dc), so roll forward by (dr, dc).
    With dr=+1 the last center row's contribution belongs to the next tile's
    row 0 — it goes to the spill accumulators instead (row 0 of [cap,8,Cp]).
    dr=dc=0 is the same-cell Newton case (predicated kernel, i>j): a direct
    roll-free, spill-free add into plane j."""
    if dc:
        bx = pltpu.roll(bx, dc % bx.shape[1], 1)
        by = pltpu.roll(by, dc % by.shape[1], 1)
        bc = pltpu.roll(bc, dc % bc.shape[1], 1)
    jsl = (pl.ds(j, 1), slice(None), slice(None))
    if dr:
        # roll rows by +1: out[r] = b[r-1]; out[0] wraps = b[tr-1] = spill
        bx = pltpu.roll(bx, 1, 0)
        by = pltpu.roll(by, 1, 0)
        bc = pltpu.roll(bc, 1, 0)
        row_is0 = jax.lax.broadcasted_iota(jnp.int32, bx.shape, 0) == 0
        spill_sl = (pl.ds(j, 1), pl.ds(0, 1), slice(None))
        sx_ref[spill_sl] += jnp.where(row_is0, bx, 0.0)[:1][None]
        sy_ref[spill_sl] += jnp.where(row_is0, by, 0.0)[:1][None]
        sc_ref[spill_sl] += jnp.where(row_is0, bc, 0)[:1][None]
        bx = jnp.where(row_is0, 0.0, bx)
        by = jnp.where(row_is0, 0.0, by)
        bc = jnp.where(row_is0, 0, bc)
    ax_ref[jsl] += bx[None]
    ay_ref[jsl] += by[None]
    ac_ref[jsl] += bc[None]


@functools.partial(
    jax.jit,
    static_argnames=(
        "strength", "tile_rows", "interpret", "symmetric", "clamp_bounds",
    ),
)
def pair_pass_resident(
    x: jnp.ndarray,  # f32[cap, rows_buf, Cp] slot-major (HALO row pad, col pad)
    y: jnp.ndarray,
    radius: jnp.ndarray,
    meta: jnp.ndarray,  # int32[cap, rows_buf, Cp]: gid | flags<<24, empty = 0
    salt: jnp.ndarray,  # uint32 scalar
    strength: float,
    tile_rows: int = 16,
    interpret: bool = False,
    symmetric: bool = True,
    clamp_bounds=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One resident pair pass. Returns (new_x, new_y, count) for the center
    rows [HALO, rows_buf - HALO) — each [cap, rows_buf - 2*HALO, Cp].

    ``symmetric=True`` runs the Newton-reciprocal kernel (5 offsets, each
    pair resolved once from its forward side — see _resident_body); the
    per-tile spill rows it emits are overlap-added into the next tile here.
    ``symmetric=False`` keeps the two-sided 9-offset enumeration whose
    accumulation order is bit-identical to the XLA grid solver.

    ``clamp_bounds=(world_w, world_h)``: fold the boundary position clamp
    into the kernel's VMEM tiles (symmetric kernel only — the banded
    boundary path, _resident_body_pred docs)."""
    cap, rows_buf, cp = x.shape
    tr = tile_rows
    center_rows = rows_buf - 2 * HALO
    assert center_rows % tr == 0 and tr % 8 == 0
    assert clamp_bounds is None or symmetric, (
        "clamp folding is implemented in the symmetric kernel only"
    )
    n_tiles = center_rows // tr

    out_shape = [
        jax.ShapeDtypeStruct((cap, center_rows, cp), jnp.float32),
        jax.ShapeDtypeStruct((cap, center_rows, cp), jnp.float32),
        jax.ShapeDtypeStruct((cap, center_rows, cp), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((cap, tr, cp), lambda i, *_: (0, i, 0)),
        pl.BlockSpec((cap, tr, cp), lambda i, *_: (0, i, 0)),
        pl.BlockSpec((cap, tr, cp), lambda i, *_: (0, i, 0)),
    ]
    scratch = [
        pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # DMA x
        pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # y
        pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # radius
        pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.int32),  # meta
    ]
    if not symmetric:
        # the two-sided kernel rolls whole buffers per offset; the
        # predicated symmetric kernel rolls per-plane values on demand
        scratch += [
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # rolled x
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # rolled y
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.float32),  # rolled radius
            pltpu.VMEM((cap, tr + 2 * HALO, cp), jnp.int32),  # rolled meta
        ]
    scratch += [
        pltpu.VMEM((cap, tr, cp), jnp.float32),  # acc dx
        pltpu.VMEM((cap, tr, cp), jnp.float32),  # acc dy
        pltpu.VMEM((cap, tr, cp), jnp.int32),  # acc count
    ]
    if symmetric:
        kernel = functools.partial(
            _resident_kernel_sym, tr=tr, cap=cap, strength=strength,
            clamp_bounds=clamp_bounds,
        )
        out_shape += [
            jax.ShapeDtypeStruct((n_tiles, cap, 8, cp), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, cap, 8, cp), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, cap, 8, cp), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec((1, cap, 8, cp), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, cap, 8, cp), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, cap, 8, cp), lambda i, *_: (i, 0, 0, 0)),
        ]
        scratch += [
            pltpu.VMEM((cap, 8, cp), jnp.float32),  # spill dx
            pltpu.VMEM((cap, 8, cp), jnp.float32),  # spill dy
            pltpu.VMEM((cap, 8, cp), jnp.int32),  # spill count
            pltpu.SMEM((cap,), jnp.int32),  # occ_ctr (per-plane i-side flag)
            pltpu.SMEM((cap,), jnp.int32),  # occ_halo (per-plane j-side flag)
            pltpu.VMEM((tr, cp), jnp.float32),  # back-sum dx
            pltpu.VMEM((tr, cp), jnp.float32),  # back-sum dy
            pltpu.VMEM((tr, cp), jnp.int32),  # back-sum count
            pltpu.VMEM((cap, tr, cp), jnp.int32),  # decoded ok_i planes
            pltpu.VMEM((cap, tr, cp), jnp.float32),  # share factor A_i
            pltpu.VMEM((cap, tr, cp), jnp.float32),  # share factor B_i
        ]
    else:
        kernel = functools.partial(
            _resident_kernel, tr=tr, cap=cap, strength=strength,
        )
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    salt_arr = jnp.asarray(salt, jnp.uint32).reshape(1)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(salt_arr, x, y, radius, meta)
    if not symmetric:
        return out
    nx, ny, cnt, sx, sy, sc = out

    # overlap-add: tile k's spill row (its j-side contributions to center
    # row (k+1)*tr, i.e. the next tile's row 0) — shift the spill blocks
    # down one tile and add at each tile's row 0. The LAST tile's spill
    # lands in the bottom HALO padding (empty cells, identically zero).
    def combine(main, spill):
        # touch ONLY the n_tiles-1 boundary rows (an indexed add over
        # [cap, n_tiles-1, Cp]) instead of materializing a full-layout
        # zero tensor per field per substep
        main_r = main.reshape(cap, n_tiles, tr, cp)
        main_r = main_r.at[:, 1:, 0, :].add(
            jnp.transpose(spill[:-1, :, 0, :], (1, 0, 2))
        )
        return main_r.reshape(cap, center_rows, cp)

    return (combine(nx, sx), combine(ny, sy), combine(cnt, sc))


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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
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
