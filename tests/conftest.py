"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip hardware is unavailable in CI; sharding paths are validated on a
virtual host-platform mesh per the project build rules.
"""

import os

# force: the image exports JAX_PLATFORMS=axon (single real TPU via tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
