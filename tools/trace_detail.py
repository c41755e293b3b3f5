"""Detailed device-trace breakdown: every TPU op with duration, count, and
output shape (from the HLO long_name), plus category subtotals. Reads the
trace left by `tools/lab.py trace` (or records a fresh one with --fresh).

    python tools/trace_detail.py [/tmp/lis_trace2]
"""

import collections
import glob
import gzip
import json
import re
import sys

STEPS = 5  # lab.py trace records 5 steps


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lis_trace2"
    f = glob.glob(f"{root}/**/*.trace.json.gz", recursive=True)[0]
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
    shape = {}
    cat_of = {}
    total = 0.0
    for e in ev:
        name = e["name"]
        if name.startswith("jit_") or "(" in name:  # module-level envelope
            continue
        d = e.get("dur", 0)
        agg[name] += d
        cnt[name] += 1
        total += d
        args = e.get("args", {})
        ln = args.get("long_name", "")
        m = re.match(r"%\S+ = (\S+?) ", ln)
        if m and name not in shape:
            shape[name] = m.group(1)[:48]
        cat_of[name] = args.get("hlo_category", "?")

    print(f"TOTAL device time: {total/1e3/STEPS:.3f} ms/step over {STEPS} steps\n")
    cats = collections.Counter()
    for name, d in agg.items():
        cats[cat_of.get(name, "?")] += d
    for c, d in cats.most_common():
        print(f"  {d/1e3/STEPS:8.3f} ms/step  category: {c}")
    print()
    for name, d in agg.most_common(60):
        print(
            f"{d/1e3/STEPS:8.3f} ms/step x{cnt[name]/STEPS:6.1f}  "
            f"{name[:28]:28s} {shape.get(name, '')}"
        )


if __name__ == "__main__":
    main()
