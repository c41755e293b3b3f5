"""Root conftest: neutralize the axon sitecustomize before JAX backends init.

The image's /root/.axon_site sitecustomize imports jax and initializes the
PJRT backend at interpreter start, which freezes the device count at 1 before
test configuration can request the 8-device virtual CPU mesh (XLA flags are
parsed once per process). When that sitecustomize is on PYTHONPATH, re-run
pytest in a cleaned child process. Done from pytest_cmdline_main — it fires
before the capture manager starts, so the child's output reaches the
terminal, and its return value becomes the exit code.
"""

import os
import sys

_AXON = "axon_site"


def _needs_reexec() -> bool:
    return _AXON in os.environ.get("PYTHONPATH", "") and not os.environ.get(
        "_LIS_TPU_REEXEC"
    )


def pytest_cmdline_main(config):
    if not _needs_reexec():
        return None
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if _AXON not in p and p
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["_LIS_TPU_REEXEC"] = "1"
    return subprocess.call([sys.executable, "-m", "pytest"] + list(config.invocation_params.args), env=env)
