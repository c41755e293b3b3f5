"""Trace the DONATED step (the production path) + piecewise donated timings.

Usage: python tools/lab4.py [trace|time|pieces]
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)

from lab import make_cfg, load_scans, warm_state  # noqa: E402

from lidar_imu_slam_tpu.models import kiss_icp  # noqa: E402


def agg_trace(path):
    f = glob.glob(path + "/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(f) as fh:
        t = json.load(fh)
    names = {
        e["pid"]: e["args"]["name"]
        for e in t["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu = [p for p, n in names.items() if "TPU" in n]
    ev = [e for e in t["traceEvents"] if e.get("ph") == "X" and e["pid"] in tpu]
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    return agg, cnt


def cmd_trace(backend="xla"):
    import dataclasses
    cfg = make_cfg()
    if backend == "pallas":
        cfg = cfg.replace(icp=dataclasses.replace(cfg.icp, gn_backend="pallas"))
    scans = load_scans(cfg)
    state = warm_state(cfg, scans)
    # warm the donated-step compile
    state, out = kiss_icp.register_frame_step(state, scans[21], cfg)
    np.asarray(out.pose)
    n = 10
    shutil.rmtree("/tmp/lis_trace4", ignore_errors=True)
    with jax.profiler.trace("/tmp/lis_trace4"):
        for _ in range(n):
            state, out = kiss_icp.register_frame_step(state, scans[21], cfg)
        np.asarray(out.pose)
    agg, cnt = agg_trace("/tmp/lis_trace4")
    for name, d in agg.most_common(25):
        print(f"{d/1e3/n:9.3f} ms/step  x{cnt[name]/n:8.1f}  {name[:70]}")


def cmd_time(backend="xla"):
    import dataclasses
    cfg = make_cfg()
    if backend == "pallas":
        cfg = cfg.replace(icp=dataclasses.replace(cfg.icp, gn_backend="pallas"))
    scans = load_scans(cfg)
    state = warm_state(cfg, scans)
    state, out = kiss_icp.register_frame_step(state, scans[21], cfg)
    np.asarray(out.pose)
    for trial in range(3):
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = kiss_icp.register_frame_step(state, scans[21], cfg)
        np.asarray(out.pose)
        print(f"trial {trial}: {(time.perf_counter()-t0)/n*1e3:.2f} ms/step "
              f"iters={int(out.icp_iterations)}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "trace"
    backend = sys.argv[2] if len(sys.argv) > 2 else "xla"
    if cmd == "trace":
        cmd_trace(backend)
    else:
        cmd_time(backend)
