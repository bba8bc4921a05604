"""Pallas "expand" kernel probe: can a scalar placement loop beat the XLA
position scatters that dominate the 1M resident-solver frame (~8 ms per
1M-index field scatter; probe_scatter_variants.py shows the XLA-level
alternatives are dead)?

Idea: the slot assignment is rebin-cached, so a flat-SORTED gid order and
per-output-chunk [lo, hi) bounds can be precomputed once per rebin. The
kernel then walks its chunk's entity range with scalar VMEM reads
(gid -> x[gid], y[gid], dst) and scalar stores into the chunk-local output
— one index-load amortized over BOTH position fields. The unknown this
probe answers empirically is Mosaic's scalar VMEM access cost (dynamic
single-element loads/stores may lower to tile read-modify-writes).

RESULT (2026-08-18, jax 0.9 Mosaic): REFUTED at the first hurdle —
Pallas TPU raises "Cannot store scalars to VMEM"; there is no scalar
VMEM store path at all. The alternatives all lose on paper: a masked
row read-modify-write per entity costs more VMEM traffic than the XLA
scatter moves, and SMEM (which does take scalar stores) is far too
small for a chunk and has no vector copy-out. Conclusion: the ~8 ms
1M-index XLA scatter is effectively the hardware floor for random
placement; beating it requires avoiding the scatter architecturally
(layout-resident positions), not a better scatter. Kept as the record
of the experiment.

Correctness is asserted against the XLA scatter before timing.

Usage: python benchmarks/probe_expand_kernel.py [n] [chunk_rows]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _expand_kernel(
    bounds_ref,  # prefetch SMEM [n_chunks + 1] i32
    x_ref, y_ref, order_ref, flat_ref,  # VMEM, full [N] (constant blocks)
    ox_ref, oy_ref,  # VMEM output chunk [8, chunk_lanes]
    *, chunk: int,
):
    t = pl.program_id(0)
    base = t * chunk
    lanes = ox_ref.shape[1]
    ox_ref[...] = jnp.zeros(ox_ref.shape, jnp.float32)
    oy_ref[...] = jnp.zeros(oy_ref.shape, jnp.float32)

    def body(k, _):
        g = order_ref[k]
        d = flat_ref[g] - base
        r = d // lanes
        c = d - r * lanes
        ox_ref[r, c] = x_ref[g]
        oy_ref[r, c] = y_ref[g]
        return 0

    jax.lax.fori_loop(bounds_ref[t], bounds_ref[t + 1], body, 0)


@functools.partial(jax.jit, static_argnames=("total", "chunk", "interpret"))
def expand(x, y, order, flat, bounds, total, chunk, interpret=False):
    n_chunks = total // chunk
    lanes = chunk // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((x.shape[0],), lambda i, *_: (0,)),
            pl.BlockSpec((y.shape[0],), lambda i, *_: (0,)),
            pl.BlockSpec((order.shape[0],), lambda i, *_: (0,)),
            pl.BlockSpec((flat.shape[0],), lambda i, *_: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((8, lanes), lambda i, *_: (i, 0)),
            pl.BlockSpec((8, lanes), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[],
    )
    return pl.pallas_call(
        functools.partial(_expand_kernel, chunk=chunk),
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks * 8, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * 8, lanes), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(bounds, x, y, order, flat)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from multithreadedgameengine_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    interpret = jax.default_backend() != "tpu"

    total = 12 * 556 * 1280  # the 1M ladder layout
    chunk = 128 * 1024  # 128k slots/chunk -> [8, 16384] blocks, 65 chunks
    total = (total // chunk + 1) * chunk
    rng = np.random.default_rng(0)
    flat_np = rng.choice(total, size=n, replace=False).astype(np.int32)
    order_np = np.argsort(flat_np).astype(np.int32)
    flat_sorted = flat_np[order_np]
    bounds_np = np.searchsorted(
        flat_sorted, np.arange(0, total + 1, chunk)
    ).astype(np.int32)
    x_np = rng.standard_normal(n).astype(np.float32)
    y_np = rng.standard_normal(n).astype(np.float32)

    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    order = jnp.asarray(order_np)
    flat = jnp.asarray(flat_np)
    bounds = jnp.asarray(bounds_np)

    gx, gy = expand(x, y, order, flat, bounds, total, chunk, interpret)
    ref = np.zeros((total,), np.float32)
    ref[flat_np] = x_np
    np.testing.assert_array_equal(np.asarray(gx).ravel(), ref)
    ref[:] = 0
    ref[flat_np] = y_np
    np.testing.assert_array_equal(np.asarray(gy).ravel(), ref)
    print("correct", flush=True)

    if interpret:
        print(json.dumps({"note": "CPU interpret: correctness only"}))
        return

    def body(_i, c):
        xx, acc = c
        gx, gy = expand(xx, y, order, flat, bounds, total, chunk)
        return xx + gx[0, 0] * 0, acc + gy[0, 0]

    fn = jax.jit(lambda c: jax.lax.fori_loop(0, 20, body, c))
    out = fn((x, jnp.float32(0)))
    jax.device_get(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn((x, jnp.float32(0)))
        jax.device_get(out[1])
        best = min(best, (time.time() - t0) / 20)
    print(json.dumps({
        "expand_xy_pair_ms": round(best * 1000, 3),
        "vs_two_xla_scatters_ms": 16.4,
    }))


if __name__ == "__main__":
    main()
