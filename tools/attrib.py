"""Source-line attribution of step device time.

Compiles the DONATED register step (the production shape), dumps its
optimized HLO, records a 5-step device trace, and joins per-op durations
with the HLO metadata source locations — the definitive "which Python line
costs what" view.

    LIS_GN_BACKEND=pallas python tools/attrib.py
"""

import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)

from lab import make_cfg, load_scans, warm_state  # noqa: E402

from lidar_imu_slam_tpu.models import kiss_icp  # noqa: E402

STEPS = 5


def main():
    cfg = make_cfg()
    scans = load_scans(cfg)
    state = warm_state(cfg, scans)

    step = jax.jit(
        lambda s, sc: kiss_icp.register_frame(s, sc, cfg), donate_argnums=(0,)
    )
    hlo = step.lower(state, scans[21]).compile().as_text()
    with open("/tmp/step_hlo_donated.txt", "w") as f:
        f.write(hlo)

    # op name -> (source_file:line, one-line def head)
    meta = {}
    for m in re.finditer(
        r"^\s*(?:ROOT )?%?([\w.\-]+) = ([^\n]*)", hlo, re.M
    ):
        name, rest = m.group(1), m.group(2)
        sm = re.search(r'source_file="([^"]+)" source_line=(\d+)', rest)
        loc = f"{os.path.basename(sm.group(1))}:{sm.group(2)}" if sm else "?"
        shape = rest.split(" ", 1)[0]
        meta[name] = (loc, shape)

    # fresh trace of STEPS donated steps
    shutil.rmtree("/tmp/lis_trace_attr", ignore_errors=True)
    with jax.profiler.trace("/tmp/lis_trace_attr"):
        for _ in range(STEPS):
            state, out = step(state, scans[21])
        np.asarray(out.pose)

    f = glob.glob("/tmp/lis_trace_attr/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(f) as fh:
        t = json.load(fh)
    pnames = {
        e["pid"]: e["args"]["name"]
        for e in t["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu = [p for p, n in pnames.items() if "TPU" in n]

    per_op = collections.Counter()
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and e["pid"] in tpu:
            nm = e["name"].split("(")[0]
            if not nm.startswith("jit_"):
                per_op[nm] += e.get("dur", 0)

    per_line = collections.Counter()
    rows = []
    for nm, d in per_op.items():
        loc, shape = meta.get(nm, ("<not-in-hlo>", "?"))
        per_line[loc] += d
        rows.append((d, nm, loc, shape))

    print("== per-op (top 40) ==")
    for d, nm, loc, shape in sorted(rows, reverse=True)[:40]:
        print(f"{d/1e3/STEPS:8.3f} ms  {nm:34s} {loc:28s} {shape[:40]}")
    print(f"\n== per source line ==")
    for loc, d in per_line.most_common(30):
        print(f"{d/1e3/STEPS:8.3f} ms  {loc}")
    total = sum(per_op.values())
    print(f"\nDEVICE TOTAL: {total/1e3/STEPS:.3f} ms/step (donated)")


if __name__ == "__main__":
    main()
