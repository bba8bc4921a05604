"""Tracing / profiling / observability (SURVEY.md §5.1, §5.5).

The reference's instrumentation maps as:
 - per-worker moving-average FPS panels (AbstractWorker.js:66-104,
   gameEngine.js:1326-1381)          → :class:`StepTimer` — a 60-sample
   moving average of host wall-clock per simulated step, reported as
   steps/sec (the whole pipeline is one fused step, so one number replaces
   the per-worker panel);
 - opt-in logic-phase profiler (logic_worker.js:559-608)
                                      → :class:`PhaseProfiler` — per-phase
   device timings measured by running each phase jitted and blocked
   (``profile_phases``), plus jax.profiler trace capture for xprof;
 - init-timeline logging (AbstractWorker.js:106-108, gameEngine.js:1225-1230)
                                      → :class:`TimelineLog`.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, List


class StepTimer:
    """60-frame moving average of per-step wall time (the FPS panel math,
    AbstractWorker.js:66-88)."""

    WINDOW = 60

    def __init__(self):
        self._samples: deque = deque(maxlen=self.WINDOW)
        self.total_steps = 0

    def record(self, seconds_per_step: float, steps: int = 1) -> None:
        self._samples.append(seconds_per_step)
        self.total_steps += steps

    @property
    def steps_per_sec(self) -> float:
        if not self._samples:
            return 0.0
        avg = sum(self._samples) / len(self._samples)
        return 1.0 / avg if avg > 0 else 0.0

    @property
    def ms_per_step(self) -> float:
        if not self._samples:
            return 0.0
        return 1000.0 * sum(self._samples) / len(self._samples)


class TimelineLog:
    """reportLog analog: messages with wall-clock offsets from engine start."""

    def __init__(self):
        self._t0 = time.time()
        self.entries: List[tuple] = []

    def log(self, message: str) -> None:
        self.entries.append((time.time() - self._t0, message))

    def format(self) -> str:
        return "\n".join(f"[{t:8.3f}s] {m}" for t, m in self.entries)


class PhaseProfiler:
    """Per-phase device timing via blocked jitted sub-programs, the analog of
    the logic worker's per-phase timers. Also wraps jax.profiler traces."""

    def __init__(self, engine):
        self._engine = engine
        self.last: Dict[str, float] = {}

    def profile_phases(self, reps: int = 10) -> Dict[str, float]:
        """Times each pipeline phase in isolation (ms). NOTE: phases in the
        fused step overlap/fuse, so the sum is an upper bound on the real
        step time; per-phase ratios locate hot spots."""
        import jax

        eng = self._engine
        eng._require_init()
        if eng._step_fn is None:
            eng._build_step()
        eng._flush_pending()
        cfg = eng.config
        world = eng.world
        inputs = eng.input.snapshot()

        from .behavior import run_logic_phase
        from .ops.physics import update_derived, verlet_move
        from .ops.spatial import neighbor_lists

        type_ranges = tuple(
            (r.cls, r.start_index, r.count)
            for r in eng.classes.values() if r.count > 0
        )

        def sync(out):
            # block_until_ready does not block through the axon tunnel; a
            # tiny device_get of one leaf is the reliable barrier
            leaf = jax.tree_util.tree_leaves(out)[0]
            jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf)

        def timed(name, fn, *args):
            jfn = jax.jit(fn)
            out = jfn(*args)
            sync(out)
            t0 = time.time()
            for _ in range(reps):
                out = jfn(*args)
            sync(out)
            self.last[name] = (time.time() - t0) / reps * 1000.0
            return out

        nbr = timed(
            "spatial",
            lambda w: neighbor_lists(
                w.transform.x, w.transform.y, w.transform.active,
                w.collider.visual_range, cfg,
            ),
            world,
        )
        timed("logic", lambda w: run_logic_phase(w, nbr, inputs, cfg, type_ranges)[0], world)
        timed("verlet_move", lambda w: verlet_move(w, cfg, cfg.dt_ratio), world)
        timed("derived", lambda w: update_derived(w, cfg), world)
        timed("full_step", lambda w: eng._one_step_raw(w, inputs)[0], world)
        return dict(self.last)

    def trace(self, path: str, steps: int = 10) -> str:
        """Capture a jax.profiler trace (xprof-compatible) of ``steps``."""
        import jax

        eng = self._engine
        with jax.profiler.trace(path):
            eng.step(steps, block=True)
        return path
