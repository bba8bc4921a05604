"""Device-side collision-event diffing (ops/events.py) — property-tested
against numpy set semantics (the reference's Cantor-key Sets,
logic_worker.js:417-526), plus the engine-level dispatch path."""

import jax
import jax.numpy as jnp
import numpy as np

from multithreadedgameengine_tpu.ops.events import diff_pairs


def _np_sets(pairs, n):
    return {(int(a), int(b)) for a, b in pairs}


def _random_pair_table(rng, p, n_entities, count):
    """count unique ascending (a, b) pairs padded to [p, 2] with -1."""
    keys = rng.choice(n_entities * n_entities, size=count, replace=False)
    a, b = keys // n_entities, keys % n_entities
    table = np.full((p, 2), -1, np.int32)
    table[:count, 0] = a
    table[:count, 1] = b
    return table


class TestDiffPairs:
    def test_property_random_tables(self):
        rng = np.random.default_rng(0)
        P, N = 64, 40
        for trial in range(25):
            n_cur = int(rng.integers(0, P + 1))
            n_prev = int(rng.integers(0, P + 1))
            cur = _random_pair_table(rng, P, N, n_cur)
            prev = _random_pair_table(rng, P, N, n_prev)
            enter, ne, stay, ns, exit_, nx = jax.jit(diff_pairs)(
                jnp.asarray(cur), jnp.int32(n_cur),
                jnp.asarray(prev), jnp.int32(n_prev),
            )
            cs = _np_sets(cur[:n_cur], N)
            ps = _np_sets(prev[:n_prev], N)
            ne, ns, nx = int(ne), int(ns), int(nx)
            assert _np_sets(np.asarray(enter)[:ne], N) == cs - ps
            assert _np_sets(np.asarray(stay)[:ns], N) == cs & ps
            assert _np_sets(np.asarray(exit_)[:nx], N) == ps - cs
            # rows sorted ascending by (a, b): reference dispatch order
            for t, k in ((enter, ne), (stay, ns), (exit_, nx)):
                t = np.asarray(t)[:k]
                keys = t[:, 0].astype(np.int64) * N + t[:, 1]
                assert (np.diff(keys) > 0).all()

    def test_first_frame_all_enter(self):
        cur = np.asarray([[1, 2], [3, 4]], np.int32)
        cur = np.vstack([cur, np.full((6, 2), -1, np.int32)])
        prev = np.full((8, 2), -1, np.int32)
        enter, ne, stay, ns, exit_, nx = diff_pairs(
            jnp.asarray(cur), jnp.int32(2), jnp.asarray(prev), jnp.int32(0)
        )
        assert int(ne) == 2 and int(ns) == 0 and int(nx) == 0
        assert np.asarray(enter)[:2].tolist() == [[1, 2], [3, 4]]
