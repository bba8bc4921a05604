"""Persistent XLA compile cache wiring (VERDICT r2 next #5).

The test conftest has always set ``jax_compilation_cache_dir``; the bench /
ladder / engine paths did not, so every benchmark process re-paid the full
XLA compile cost (warmup_s 210-724 s per rung in BENCH_LADDER_r02). One
idempotent helper, called from Engine.__init__ and the benchmark entry
points, claims the win everywhere.

Opt out with ``MTGE_NO_COMPILE_CACHE=1`` (e.g. when measuring cold-compile
time itself); override the location with ``MTGE_CACHE_DIR``.

The default lives under ``~/.cache``, NOT /tmp: /tmp is wiped between
sessions on this class of host, which silently re-cold-compiled every
program each session (the 1M rung's ~650 s "warm" in BENCH_LADDER_r05 was
exactly this — the program itself caches fine, 15 MB, re-warming in ~60 s
when the entry survives).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "MTGE_CACHE_DIR",
    os.path.join(
        os.path.expanduser("~"), ".cache", "mtge_jax_cache"
    ),
)


def enable_compile_cache(path: str = DEFAULT_CACHE_DIR) -> bool:
    """Point jax's persistent compilation cache at ``path`` unless the
    process already configured one (or opted out). Returns True when the
    cache is active after the call."""
    if os.environ.get("MTGE_NO_COMPILE_CACHE"):
        return False
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return True
    jax.config.update("jax_compilation_cache_dir", path)
    # cache anything that took real compile time; tiny programs stay out
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return True
