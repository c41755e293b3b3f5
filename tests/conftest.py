"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip hardware is unavailable in CI; sharding paths are validated on a
virtual host-platform mesh per the project build rules.

The image's /root/.axon_site sitecustomize imports jax and initializes the
PJRT backend at interpreter start, which freezes the device count before any
conftest code can set xla_force_host_platform_device_count. When that
sitecustomize is on PYTHONPATH, re-exec pytest once with a cleaned
environment.
"""

import os
import sys

# NOTE: the axon-sitecustomize re-exec lives in the repo-root conftest.py
# (must run before pytest's capture manager starts).

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# single-core CI box: persistent compile cache makes reruns tolerable
jax.config.update("jax_compilation_cache_dir", "/tmp/lis_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# VMA-exhaustion guard (round 4): one pytest process compiling the whole
# suite accumulates ~350 VMAs per live executable (XLA CPU code pages +
# mmap'd allocations) and crosses the kernel's vm.max_map_count (65,530
# default) around test 137 — mmap starts failing and XLA segfaults/aborts
# mid-compile (reproduced 4x at the same test; watcher showed 64,647 maps
# at death). Dropping each module's executables caps the live set; the
# persistent cache makes any cross-module recompiles cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
