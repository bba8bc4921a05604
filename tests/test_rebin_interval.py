"""physics.rebin_interval — the grid solver's bin cache (config.py docs).

Between rebins the solver reuses the last binning's (cell, slot) assignment
while positions stay current — the reference's own one-frame-stale candidate
semantics (its physics worker consumes neighbor lists the spatial worker
built on ITS previous frame, physics_worker.js:379-383). These tests pin:

 - wiring: while no entity crosses a solver cell, interval>1 is EXACTLY
   interval=1 (stale bins == fresh bins), via single-step and chunked paths;
 - staleness: an entity spawned between rebins is invisible to the pair pass
   (boundary-only degradation) until the next rebin picks it up;
 - persistence: the cache arrays ride checkpoints.
"""

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu import (
    Collider,
    Engine,
    EntityClass,
    RigidBody,
    SpriteRenderer,
    make_config,
)


class Disc(EntityClass):
    """Fixed-radius circle with no tick — pure solver dynamics."""

    components = [RigidBody, Collider, SpriteRenderer]
    uses_neighbors = False

    @classmethod
    def setup(cls, ctx):
        return {"collider.radius": 10.0, "rigid_body.max_vel": 50.0}


def disc_engine(interval: int, solver: str = "grid") -> Engine:
    cfg = make_config(
        world_width=400.0,
        world_height=300.0,
        spatial=dict(cell_size=50.0, max_neighbors=16),
        physics=dict(
            gravity=(0.0, 0.0),
            sub_step_count=2,
            solver=solver,
            rebin_interval=interval,
            boundary_elasticity=0.0,
        ),
    )
    eng = Engine(cfg)
    eng.register_entity_class(Disc, 8)
    eng.init()
    return eng


def spawn_pair(eng):
    # overlapping pair mid-cell: depth 1.5 at radius 10 separates ~0.75 px /
    # frame / side — several frames of motion without any solver-cell
    # (25 px) crossing, so stale bins stay correct. Returns (left, right)
    # slot indices (the interleave-8 LIFO pool hands out high slots first).
    a = eng.spawn("Disc", x=110.0, y=75.0)
    b = eng.spawn("Disc", x=128.5, y=75.0)
    return a, b


def positions(eng):
    s = eng.snapshot()
    return np.stack([np.asarray(s.transform.x), np.asarray(s.transform.y)], 1)


@pytest.mark.parametrize("solver", ["grid", "pallas"])
def test_interval_matches_fresh_binning_until_crossing(solver):
    eng1 = disc_engine(1, solver)
    eng3 = disc_engine(3, solver)
    a, b = spawn_pair(eng1)
    spawn_pair(eng3)
    for _ in range(6):
        eng1.step(block=True)
        eng3.step(block=True)
        np.testing.assert_array_equal(positions(eng1), positions(eng3))
    # the pair actually moved (the solver ran) …
    assert positions(eng1)[a, 0] < 110.0 and positions(eng1)[b, 0] > 128.5
    # … and the cache was genuinely reused: rebins at steps 0 and 3 only
    assert int(jax.device_get(eng3.world.solver_bin_step)) == 3


def test_chunked_and_single_stepping_share_the_cache():
    a = disc_engine(3)
    b = disc_engine(3)
    spawn_pair(a)
    spawn_pair(b)
    for _ in range(6):
        a.step(block=True)
    b.step(6, block=True)  # one fori_loop dispatch carrying the cache
    np.testing.assert_array_equal(positions(a), positions(b))
    assert int(jax.device_get(b.world.solver_bin_step)) == 3


def test_host_spawn_between_rebins_rebins_next_frame():
    """Host mutations invalidate the bin cache (round 4): an entity spawned
    mid-interval collides from its FIRST frame instead of degrading to
    boundary-only until the next scheduled rebin (and host despawns drop
    their ghost colliders the same way). Scheduled reuse between untouched
    frames is pinned by the stamp asserts in the wiring tests above."""
    eng = disc_engine(5)
    ia = eng.spawn("Disc", x=110.0, y=75.0)
    eng.step(block=True)  # step 0: rebin with A alone
    ib = eng.spawn("Disc", x=118.0, y=75.0)  # deep overlap

    def gap():
        p = positions(eng)
        return float(np.hypot(*(p[ib] - p[ia])))

    g0 = gap()
    eng.step(block=True)  # spawn invalidated the cache: rebin picks B up now
    assert gap() > g0
    assert int(eng.metrics["solver_overflow"]) == 0
    # and the cache resumes: no further mutations -> stamp holds for the
    # rest of the interval
    stamp = int(jax.device_get(eng.world.solver_bin_step))
    eng.step(3, block=True)
    assert int(jax.device_get(eng.world.solver_bin_step)) == stamp


def test_checkpoint_roundtrip_carries_bin_cache(tmp_path):
    from multithreadedgameengine_tpu.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    a = disc_engine(4)
    spawn_pair(a)
    a.step(2, block=True)
    path = str(tmp_path / "rebin.npz")
    save_checkpoint(a, path)

    b = disc_engine(4)
    spawn_pair(b)
    load_checkpoint(b, path)
    assert int(jax.device_get(b.world.solver_bin_step)) == 0
    a.step(3, block=True)
    b.step(3, block=True)
    np.testing.assert_array_equal(positions(a), positions(b))


@pytest.mark.parametrize("prestep", [False, True])
def test_checkpoint_roundtrip_pallas_attr_cache(tmp_path, prestep):
    """The resident solver's attribute-layout cache (solver_grad/solver_meta)
    rides checkpoints: restoring into a fresh engine (leaves not yet
    installed) and into an already-stepped engine (leaves present, restored
    wholesale) both resume on the same trajectory."""
    from multithreadedgameengine_tpu.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    a = disc_engine(4, "pallas")
    spawn_pair(a)
    a.step(2, block=True)
    assert a.world.solver_grad is not None  # cache installed + carried
    path = str(tmp_path / "rebin_pallas.npz")
    save_checkpoint(a, path)

    b = disc_engine(4, "pallas")
    spawn_pair(b)
    if prestep:
        b.step(2, block=True)  # leaves installed; restore overwrites them
    load_checkpoint(b, path)
    a.step(3, block=True)
    b.step(3, block=True)
    np.testing.assert_array_equal(positions(a), positions(b))


def test_checkpoint_saved_before_stepping_loads_into_stepped_engine(tmp_path):
    """A checkpoint written before the first step lacks the lazily-installed
    solver_grad/solver_meta keys; loading it into an engine that HAS stepped
    substitutes zeros, and the restored stamp (-1) forces a fresh rebin
    before any read — trajectories match a from-scratch run."""
    from multithreadedgameengine_tpu.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    a = disc_engine(4, "pallas")
    spawn_pair(a)
    path = str(tmp_path / "prestep_pallas.npz")
    save_checkpoint(a, path)  # never stepped: no solver_grad in the file

    b = disc_engine(4, "pallas")
    spawn_pair(b)
    b.step(2, block=True)
    load_checkpoint(b, path)
    assert int(jax.device_get(b.world.solver_bin_step)) == -1
    a.step(3, block=True)
    b.step(3, block=True)
    np.testing.assert_array_equal(positions(a), positions(b))


def test_runtime_raised_interval_activates_cache():
    """Raising rebin_interval via update_physics_config after construction
    installs the cache fields on the next build and caches for real: with
    no mutations the stamp holds across the interval, and a host spawn
    invalidates it (collides from its first frame, round-4 semantics)."""
    eng = disc_engine(1, "pallas")  # interval 1: no cache fields at init
    a, b = spawn_pair(eng)
    eng.step(block=True)
    assert eng.world.solver_flat is None
    eng.update_physics_config(rebin_interval=4)
    eng.step(block=True)  # rebuild: installs + rebins fresh (stamp -1)
    assert eng.world.solver_flat is not None
    assert eng.world.solver_grad is not None
    stamp = int(jax.device_get(eng.world.solver_bin_step))
    assert stamp >= 0
    eng.step(2, block=True)  # untouched frames reuse the cache
    assert int(jax.device_get(eng.world.solver_bin_step)) == stamp
    # host spawn between rebins: cache invalidated, collides immediately
    c = eng.spawn("Disc", x=110.0, y=75.0)  # overlapping a
    p0 = positions(eng)
    eng.step(block=True)
    assert int(eng.metrics["solver_overflow"]) == 0
    assert positions(eng)[c, 0] != pytest.approx(p0[c, 0])
