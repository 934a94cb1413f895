"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding code paths
execute without TPU hardware (the capability matrix SURVEY.md section 4
calls for).  The sandbox environment forces JAX_PLATFORMS=axon (a tunneled
TPU) with a plugin injected via PYTHONPATH; both must be overridden before
the first `import jax` or every test op round-trips through the tunnel.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Drop the axon TPU plugin site dir so plugin discovery cannot touch the
# (sometimes hanging) remote-compile tunnel during CPU-only test runs.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

# The sandbox pre-imports jax._src.config at interpreter startup (via a
# site hook), so JAX_PLATFORMS=axon is already latched before this file
# runs and the env var alone is ignored.  Override through the live config
# object instead — this must happen before any backend is instantiated.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent executable cache: the suite is compile-dominated (tiny data,
# many jit programs); cached executables make repeat runs (and the smoke
# tier) several times faster.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
