"""Real-hardware test tier (VERDICT r3 item 6).

Run with:  python -m pytest tests_tpu -q

Unlike tests/ (which forces a virtual CPU mesh), this tier keeps the
session's default backend — on this sandbox the tunneled TPU chip — and
exercises exactly the paths the CPU tier cannot: the non-interpret
Mosaic lowering of the fused Pallas kernel, the host-pinning policy of
the pose-graph solver under a TPU default backend, and a small
streaming-SLAM smoke on the chip.  Run it BEFORE any bench capture; it
is the canary for the round-3 class of on-device faults.

Do NOT run concurrently with bench.py or any other TPU process — two
processes on the tunneled chip kill each other with FAILED_PRECONDITION.
"""

import os

import jax
import pytest

# the big scans compile through a remote tunnel; share bench.py's cache
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def pytest_collection_modifyitems(config, items):
    # The repo-wide addopts run xdist workers (-n 2) — which on THIS tier
    # means two processes initializing the one tunneled TPU and killing
    # each other with FAILED_PRECONDITION.  Refuse to run parallel rather
    # than fault the chip: use `python -m pytest tests_tpu -q -n 0`.
    if os.environ.get("PYTEST_XDIST_WORKER") is not None:
        skip = pytest.mark.skip(
            reason="tpu tier must run serially: pass -n 0 (two TPU "
            "processes kill each other)"
        )
        for item in items:
            item.add_marker(skip)
        return
    if jax.default_backend() in ("cpu",):
        skip = pytest.mark.skip(
            reason="tpu tier: default backend is CPU (no accelerator)"
        )
        for item in items:
            item.add_marker(skip)
