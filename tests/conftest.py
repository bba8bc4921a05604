"""Test harness: force an 8-device CPU platform so multi-chip sharding paths
are exercised without TPU hardware (SURVEY.md §4 — the TPU answer to the
reference's "multi-node without a cluster": more local workers ↔ more virtual
devices)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the axon TPU PJRT plugin ignores the JAX_PLATFORMS env var; the config
# knob is authoritative. Tests must run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite compiles many small configs; reruns
# would otherwise pay the full XLA compile cost every time. Shares the
# package default (~/.cache — /tmp is wiped between sessions on this host
# class, which silently re-cold-compiled the whole suite each session).
from multithreadedgameengine_tpu.utils.cache import DEFAULT_CACHE_DIR  # noqa: E402

jax.config.update("jax_compilation_cache_dir", DEFAULT_CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
