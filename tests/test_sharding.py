"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4: the TPU
answer to "multi-node without a cluster"): entity-sharded world + spatially
row-sharded grid solver must reproduce single-device trajectories."""

import jax
import numpy as np
import pytest

from multithreadedgameengine_tpu.models.balls import make_balls_engine
from multithreadedgameengine_tpu.parallel import (
    make_mesh,
    make_sharded_step,
    shard_world,
)


def build_engine():
    eng = make_balls_engine(
        n_balls=255, spawn=False, seed=4,
        world_width=2000.0, world_height=1500.0,
    )
    for _ in range(200):
        eng.spawn("Ball", x=eng.rng() * 2000.0, y=eng.rng() * 1500.0)
    eng._flush_pending()
    eng._build_step()
    return eng


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedStep:
    def test_matches_single_device(self):
        eng1 = build_engine()
        for _ in range(10):
            eng1.step(1)
        ref = eng1.snapshot()

        eng2 = build_engine()
        mesh = make_mesh(8)
        w = shard_world(eng2.world, mesh)
        step = make_sharded_step(eng2.raw_step_fn(), w, mesh)
        inputs = eng2.input.snapshot()
        metrics = None
        for _ in range(10):
            w, metrics = step(w, inputs)
        jax.block_until_ready(w)
        got = jax.device_get(w)
        # collective reduction order differs from the single-device sum:
        # trajectories agree within float tolerance
        np.testing.assert_allclose(
            np.asarray(ref.transform.x), np.asarray(got.transform.x), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(ref.transform.y), np.asarray(got.transform.y), atol=5e-3
        )
        assert int(jax.device_get(metrics["active_count"])) == 201

    def test_graft_dryrun(self):
        import __graft_entry__ as graft

        graft.dryrun_multichip(8)
