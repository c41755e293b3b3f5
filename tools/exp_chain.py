"""Diagnose the chained-mode (lax.scan) regression: 62 scans/s vs 110 eager.

Hypotheses: (a) map-slab copies from lost donation inside the scan carry,
(b) the data-dependent ICP while_loop pipelining worse under scan, (c) the
stacked-scan dynamic slices. Measures eager vs scan-of-K for several K, and
a fixed-unroll-ICP variant (no data-dependent while in the body).

Usage: python tools/exp_chain.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)

from lab import make_cfg, load_scans, warm_state, N_SCANS  # noqa: E402

from lidar_imu_slam_tpu import parallel  # noqa: E402
from lidar_imu_slam_tpu.models import kiss_icp  # noqa: E402


def bench_eager(cfg, state, scans, n=30):
    s = jax.tree.map(lambda x: x.copy(), state)
    for _ in range(2):
        s, out = kiss_icp.register_frame_step(s, scans[21], cfg)
    np.asarray(out.pose)
    s = jax.tree.map(lambda x: x.copy(), state)
    t0 = time.perf_counter()
    for _ in range(n):
        s, out = kiss_icp.register_frame_step(s, scans[21], cfg)
    np.asarray(out.pose)
    return (time.perf_counter() - t0) / n * 1e3


def bench_chain(cfg, state, scans, k, donate=True, label=""):
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[scans[21]] * k
    )

    def run(st, stacked):
        def body(s, sc):
            s, out = kiss_icp.register_frame(s, sc, cfg)
            return s, out.pose

        return jax.lax.scan(body, st, stacked)

    fn = jax.jit(run, donate_argnums=(0,) if donate else ())

    s = jax.tree.map(lambda x: x.copy(), state)
    s, poses = fn(s, stacked)
    np.asarray(poses)
    n = max(30 // k, 3)
    t0 = time.perf_counter()
    for _ in range(n):
        s, poses = fn(s, stacked)
    np.asarray(poses)
    return (time.perf_counter() - t0) / (n * k) * 1e3


def main():
    cfg = make_cfg()
    scans = load_scans(cfg)
    state = warm_state(cfg, scans)

    ms = bench_eager(cfg, state, scans)
    print(f"eager donated:        {ms:7.3f} ms/step")

    for k in (4, 8):
        ms = bench_chain(cfg, state, scans, k, donate=True)
        print(f"scan k={k} donated:    {ms:7.3f} ms/step")

    ms = bench_chain(cfg, state, scans, 8, donate=False)
    print(f"scan k=8 no-donate:   {ms:7.3f} ms/step")

    # fixed-unroll ICP body (no data-dependent while inside the scan)
    bcfg = parallel.streams.batch_config(make_cfg(), outer=2, inner=4)
    ms = bench_chain(bcfg, state, scans, 8, donate=True)
    print(f"scan k=8 unrolled-icp:{ms:7.3f} ms/step")


if __name__ == "__main__":
    main()
