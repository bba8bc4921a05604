"""Multi-device execution: entity-sharded SPMD over a jax.sharding.Mesh.

The reference's scaling mechanisms (SURVEY.md §2.5) map as:
 - N logic workers + atomic job queue (logic_worker.js:320-370)  →  data
   parallelism over the entity axis: every [N] world array is sharded
   ``P('entities')`` across the mesh; XLA GSPMD partitions the whole step.
 - SharedArrayBuffer + Atomics data plane (§5.8)  →  XLA collectives over
   ICI inserted by GSPMD where the program needs cross-shard data (the
   neighbor-table build and candidate gathers).

This module is the first rung of the scale ladder (BASELINE.md configs):
entity-sharded GSPMD with a replicated spatial table. The spatial-domain
sharding with explicit ``shard_map`` + ``ppermute`` halo exchange (SURVEY.md
§5.7 — the "context parallelism" of this workload) is the planned next rung
for the 1M-entity config, where a replicated table would dominate memory.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..state import World


def make_mesh(n_devices: int = 0, axis_name: str = "entities") -> Mesh:
    """A 1-D device mesh over the entity axis. ``n_devices=0`` = all."""
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def world_shardings(world: World, mesh: Mesh, axis_name: str = "entities"):
    """PartitionSpec pytree for a World: every array with a leading entity
    axis is sharded; scalars, the PRNG key, the particle pool and the pair
    table are replicated."""
    n = world.n_entities

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n:
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, world)


def shard_world(world: World, mesh: Mesh, axis_name: str = "entities") -> World:
    shardings = world_shardings(world, mesh, axis_name)
    return jax.tree.map(jax.device_put, world, shardings)


def make_sharded_step(step_fn, world: World, mesh: Mesh, axis_name: str = "entities"):
    """jit the (world, inputs) -> (world, metrics) step with entity-axis
    shardings; GSPMD inserts the ICI collectives. The returned callable
    expects a world already placed with :func:`shard_world`.

    Tracing runs inside ``jax.sharding.use_mesh`` so the grid solver's
    spatial-domain sharding constraints (ops/physics_grid.py
    ``_shard_spatial_rows``) resolve: the constraint pass's [rows, cols, cap]
    tensors shard along grid ROWS — world-space slabs per device — and the
    3×3 neighborhood slices become XLA-inserted halo exchanges over ICI
    (SURVEY.md §5.7: the spatial-grid halo exchange of BASELINE config 5)."""
    w_shard = world_shardings(world, mesh, axis_name)
    replicated = NamedSharding(mesh, P())
    jitted = jax.jit(
        step_fn,
        in_shardings=(w_shard, replicated),
        out_shardings=(w_shard, replicated),
        donate_argnums=0,
    )

    def call(world, inputs):
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            return jitted(world, inputs)

    return call
