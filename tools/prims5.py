"""Element-gather index-width experiment: the in-step 32k element gathers
(grid lookup, key verify, head-slot, npts) cost 0.234 ms each and carry
integer_config=64 in their backend config; isolated gathers measure ~0.01 ms
with integer_config=0. Hypothesis: some index chains promote to 64-bit
gather lowering. Variants replicate the real index computations.

    python tools/prims5.py
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)

C = 1 << 17
G = 1 << 23  # grid size 8.4M
N = 1 << 15


def trace_run(fns):
    for name, f in fns:
        np.asarray(jax.tree.leaves(f())[0]).ravel()[:1]
    shutil.rmtree("/tmp/lis_trace_p5", ignore_errors=True)
    with jax.profiler.trace("/tmp/lis_trace_p5"):
        outs = []
        for name, f in fns:
            for _ in range(20):
                outs.append(f())
        np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[:1]
    fpath = glob.glob("/tmp/lis_trace_p5/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(fpath) as fh:
        t = json.load(fh)
    pnames = {
        e["pid"]: e["args"]["name"]
        for e in t["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu = [p for p, n in pnames.items() if "TPU" in n]
    agg = collections.Counter()
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and e["pid"] in tpu:
            nm = e["name"]
            if nm.startswith("jit_"):
                agg[nm.split("(")[0]] += e.get("dur", 0)
    for nm, d in sorted(agg.items()):
        print(f"  {d/1e3/20:8.3f} ms/call  {nm}")


def main():
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.integers(-1, C, G, dtype=np.int32))
    keys = jnp.asarray(rng.integers(0, 1 << 30, C, dtype=np.int32))
    qkeys = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
    qvalid = jnp.asarray(rng.random(N) < 0.9)

    def grid_pos(k):
        x = (k >> 20) & 255
        y = (k >> 10) & 255
        z = k & 127
        return (x * 256 + y) * 128 + z

    @jax.jit
    def lookup_jnp(grid, keys, qk, qv):
        """The real _lookup: jnp indexing."""
        gp = grid_pos(qk)
        slot = grid[gp]
        safe = jnp.maximum(slot, 0)
        ok = qv & (slot >= 0) & (keys[safe] == qk)
        return jnp.where(ok, safe, jnp.int32(-1))

    @jax.jit
    def lookup_lax32(grid, keys, qk, qv):
        """Explicit lax.gather with i32 indices."""
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        gp = grid_pos(qk).astype(jnp.int32)
        slot = jax.lax.gather(
            grid, gp[:, None], dimension_numbers=dn, slice_sizes=(1,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        safe = jnp.maximum(slot, 0)
        kk = jax.lax.gather(
            keys, safe[:, None], dimension_numbers=dn, slice_sizes=(1,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        ok = qv & (slot >= 0) & (kk == qk)
        return jnp.where(ok, safe, jnp.int32(-1))

    @jax.jit
    def gathers_only(grid, keys, qk):
        """Two raw jnp element gathers, no comparison chain."""
        gp = grid_pos(qk)
        slot = grid[gp]
        return slot, keys[jnp.maximum(slot, 0)]

    @jax.jit
    def gather_grid_only(grid, qk):
        return grid[grid_pos(qk)]

    @jax.jit
    def gather_keys_only(keys, qk):
        return keys[qk & (C - 1)]

    trace_run(
        [
            ("lookup jnp", lambda: lookup_jnp(grid, keys, qkeys, qvalid)),
            ("lookup lax32", lambda: lookup_lax32(grid, keys, qkeys, qvalid)),
            ("gathers only", lambda: gathers_only(grid, keys, qkeys)),
            ("gather grid only", lambda: gather_grid_only(grid, qkeys)),
            ("gather keys only", lambda: gather_keys_only(keys, qkeys)),
        ]
    )


if __name__ == "__main__":
    main()
