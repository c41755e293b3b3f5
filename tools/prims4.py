"""Round-3b primitive experiments: scatter/gather layout alternatives for
the insert path, plus a preprocess trace. Device-time attribution via a
jax.profiler trace (wall timings through the tunnel carry a ~1 ms
dispatch floor, so each variant runs 20x inside one trace).

    python tools/prims4.py
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
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)

C, K3, KP = 1 << 17, 30, 10
N = 1 << 15  # updates per insert


def trace_run(fns, label):
    """Run each jitted thunk 20x inside one trace; print device ms/call."""
    for name, f in fns:
        np.asarray(jax.tree.leaves(f())[0]).ravel()[:1]  # compile
    shutil.rmtree("/tmp/lis_trace_p4", ignore_errors=True)
    with jax.profiler.trace("/tmp/lis_trace_p4"):
        outs = []
        for name, f in fns:
            for _ in range(20):
                outs.append(f())
        np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[:1]
    f = glob.glob("/tmp/lis_trace_p4/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(f) as fh:
        t = json.load(fh)
    names = {
        e["pid"]: e["args"]["name"]
        for e in t["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu = [p for p, n in names.items() if "TPU" in n]
    agg = collections.Counter()
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and e["pid"] in tpu:
            nm = e["name"]
            if nm.startswith("jit_"):
                agg[nm.split("(")[0]] += e.get("dur", 0)
    print(f"--- {label} ---")
    for nm, d in agg.most_common(30):
        print(f"  {d/1e3/20:8.3f} ms/call  {nm}")


def main():
    rng = np.random.default_rng(0)
    slab2d = jnp.asarray(rng.random((C, K3)), jnp.float32)
    slab1d = slab2d.reshape(-1)
    pk2d = jnp.asarray(rng.integers(0, 1 << 30, (C, KP), dtype=np.int32))
    pk1d = pk2d.reshape(-1)
    slot = jnp.asarray(rng.integers(0, C, N, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, KP, N, dtype=np.int32))
    vals = jnp.asarray(rng.random((N, 3)), jnp.float32)
    iv = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))

    # --- insert-scatter variants -------------------------------------------
    @jax.jit
    def scat_flat_reshape(slab2d, slot, pos, vals):
        """Current: reshape to flat, 3 component scatters, reshape back."""
        flat = slot * K3 + pos * 3
        v = slab2d.reshape(-1)
        for c in range(3):
            v = v.at[flat + c].set(vals[:, c], mode="drop")
        return v.reshape(C, K3)

    @jax.jit
    def scat_flat_native(slab1d, slot, pos, vals):
        """Flat-stored slab: 3 component scatters, no reshape."""
        flat = slot * K3 + pos * 3
        v = slab1d
        for c in range(3):
            v = v.at[flat + c].set(vals[:, c], mode="drop")
        return v

    @jax.jit
    def scat_2d(slab2d, slot, pos, vals):
        """2D scalar scatter: (N,2) indices into (C,K3), one per component."""
        v = slab2d
        for c in range(3):
            idx = jnp.stack([slot, pos * 3 + c], axis=-1)
            v = v.at[idx[:, 0], idx[:, 1]].set(vals[:, c], mode="drop")
        return v

    @jax.jit
    def scat_pk_flat_reshape(pk2d, slot, pos, iv):
        v = pk2d.reshape(-1).at[slot * KP + pos].set(iv, mode="drop")
        return v.reshape(C, KP)

    @jax.jit
    def scat_pk_flat_native(pk1d, slot, pos, iv):
        return pk1d.at[slot * KP + pos].set(iv, mode="drop")

    @jax.jit
    def scat_pk_2d(pk2d, slot, pos, iv):
        return pk2d.at[slot, pos].set(iv, mode="drop")

    trace_run(
        [
            ("f32x3 flat+reshape (current)",
             lambda: scat_flat_reshape(slab2d, slot, pos, vals)),
            ("f32x3 flat native",
             lambda: scat_flat_native(slab1d, slot, pos, vals)),
            ("f32x3 2d scalar",
             lambda: scat_2d(slab2d, slot, pos, vals)),
            ("pk flat+reshape (current)",
             lambda: scat_pk_flat_reshape(pk2d, slot, pos, iv)),
            ("pk flat native",
             lambda: scat_pk_flat_native(pk1d, slot, pos, iv)),
            ("pk 2d scalar",
             lambda: scat_pk_2d(pk2d, slot, pos, iv)),
        ],
        "insert scatters",
    )

    # --- packed-row fetch variants -----------------------------------------
    rows_slot = jnp.asarray(rng.integers(0, C, N, dtype=np.int32))

    @jax.jit
    def fetch_2d(pk2d, s):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        return jax.lax.gather(
            pk2d, s[:, None], dimension_numbers=dn, slice_sizes=(1, KP)
        )

    @jax.jit
    def fetch_1d(pk1d, s):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(), start_index_map=(0,)
        )
        return jax.lax.gather(
            pk1d, (s * KP)[:, None], dimension_numbers=dn, slice_sizes=(KP,)
        )

    trace_run(
        [
            ("fetch rows 2d (current)", lambda: fetch_2d(pk2d, rows_slot)),
            ("fetch rows from flat 1d", lambda: fetch_1d(pk1d, rows_slot)),
        ],
        "packed row fetch",
    )

    # --- element-gather pair: keys+npts merged -----------------------------
    keys = jnp.asarray(rng.integers(0, 1 << 30, C, dtype=np.int32))
    npts = jnp.asarray(rng.integers(0, KP + 1, C, dtype=np.int32))
    meta64 = (keys.astype(jnp.int64) << 8) | npts.astype(jnp.int64)
    q = jnp.asarray(rng.integers(0, C, N, dtype=np.int32))

    trace_run(
        [
            ("2x i32 elem gathers", jax.jit(lambda: (keys[q], npts[q]))),
            ("1x i64 merged gather", jax.jit(lambda: meta64[q])),
            ("1x i32 elem gather", jax.jit(lambda: keys[q])),
        ],
        "key+npts gathers",
    )

    # --- preprocess trace ----------------------------------------------------
    from lidar_imu_slam_tpu import config as cfgmod
    from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan

    cfg = cfgmod.LidarConfig(
        num_scan_lines=64, max_points=131072, min_range=2.5, max_range=80.0
    )
    pts = rng.random((131072, 3)).astype(np.float32) * 80.0
    raw = jax.tree.map(
        jnp.asarray, pack_raw_scan(pts, stamp=0.0, max_points=131072)
    )
    pre = jax.jit(lambda r: preprocess_scan(r, cfg))
    trace_run([("preprocess_scan", lambda: pre(raw))], "preprocess")


if __name__ == "__main__":
    main()
