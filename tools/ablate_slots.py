"""Micro-timing of _find_insert_slots primitives (chained, DCE-proof)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.ops import voxel_map

C = 1 << 17
N = 32768
cfg = cfgmod.MapConfig(voxel_size=1.0, max_range=80.0, capacity=C)


def chain(name, fn, init, n_iter=12, n_warm=3):
    x = init
    for _ in range(n_warm):
        x = fn(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0])
    t0 = time.perf_counter()
    for _ in range(n_iter):
        x = fn(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0])
    print(f"{name:40s} {(time.perf_counter()-t0)/n_iter*1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    # table at ~30% load
    m = voxel_map.create(cfg)
    pts = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
    ins = jax.jit(lambda m, p: voxel_map.insert(m, p, jnp.ones((N,), bool), cfg))
    m = ins(m, jnp.asarray(pts))
    for i in range(3):
        p2 = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
        m = ins(m, jnp.asarray(p2))
    np.asarray(m.keys)
    print("voxels:", int(voxel_map.num_voxels(m)))
    keys = m.keys
    qpts = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
    qkeys = voxel_map.pack_key(voxel_map.voxel_of(jnp.asarray(qpts), 1.0))

    # 1. fps_wide construction alone
    chain("fps_wide (C=131k, W=8)",
          jax.jit(lambda k: voxel_map._fps_wide(k)[:, 0].astype(jnp.int64) + k),
          keys)

    # 2. 32k-row gather from (C, 8)
    fps = voxel_map._fps_wide(keys)
    h0 = voxel_map._hash_key(qkeys, C)
    chain("gather 32k rows from (C,8)",
          jax.jit(lambda h: (voxel_map._fps_wide(keys)[h].sum(1) + h) % C), h0)

    # 3. scatter-min 32k into C
    idxs = jnp.arange(N, dtype=jnp.int32)
    def scat(h):
        claims = jnp.full((C,), N, jnp.int32)
        claims = claims.at[h].min(idxs, mode="drop")
        return (h + claims[h]) % C
    chain("scatter-min 32k into C", jax.jit(scat), h0)

    # 4. int64 sort 32k / 131k
    pk = jnp.where(jnp.arange(N) % 7 != 0, qkeys, jnp.int64(1 << 62))
    chain("sort 32k int64", jax.jit(lambda k: jnp.sort(k) ^ 1), pk)
    big = jnp.concatenate([pk, pk ^ 3, pk + 7, pk - 9])
    chain("sort 131k int64", jax.jit(lambda k: jnp.sort(k) ^ 1), big)

    # 5. one attempt_body equivalent, outside any while loop
    def one_attempt(tk):
        h0 = voxel_map._hash_key(qkeys, C)
        qfp = voxel_map._fingerprint(qkeys)
        rows = voxel_map._fps_wide(tk)[h0]
        matched = rows == qfp[:, None]
        is_empty = rows == 0
        free = is_empty | (rows == 1)
        pos_match = jnp.argmax(matched, axis=1).astype(jnp.int32)
        pos_empty = jnp.where(jnp.any(is_empty, axis=1), jnp.argmax(is_empty, axis=1), 8).astype(jnp.int32)
        pos_free = jnp.where(jnp.any(free, axis=1), jnp.argmax(free, axis=1), 8).astype(jnp.int32)
        cand_match = jnp.any(matched, axis=1) & (pos_match < pos_empty)
        mslot = (h0 + pos_match) & (C - 1)
        verified = cand_match & (tk[mslot] == qkeys)
        wide_slot = (h0 + pos_free) & (C - 1)
        claims = jnp.full((C,), N, jnp.int32)
        claim_slot = jnp.where(~verified, wide_slot, C)
        claims = claims.at[claim_slot].min(idxs, mode="drop")
        won = ~verified & (claims[wide_slot] == idxs)
        tk = tk.at[jnp.where(won, wide_slot, C)].set(qkeys, mode="drop")
        return tk
    chain("one attempt (no while_loop)", jax.jit(one_attempt), keys)

    # 6. full find_insert_slots
    def fis(tk):
        nk, slots, reused = voxel_map._find_insert_slots(tk, qkeys, jnp.ones((N,), bool), cfg.max_probes)
        return nk
    chain("find_insert_slots (full)", jax.jit(fis), keys)

    # 7. lookup_wide (query-only path)
    def lw(tk):
        fps = voxel_map._fps_wide(tk)
        s = voxel_map._lookup_wide(tk, fps, qkeys, jnp.ones((N,), bool), cfg.max_probes)
        return tk.at[0].set(s[0])
    chain("lookup_wide 32k queries", jax.jit(lw), keys)

    # 8. u64 fingerprint of full table
    chain("fingerprint 131k u64",
          jax.jit(lambda k: voxel_map._fingerprint(k).astype(jnp.int64) + k), keys)


if __name__ == "__main__":
    main()
