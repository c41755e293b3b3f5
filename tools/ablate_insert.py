"""Break down voxel_map.insert cost: sort vs slot-finding vs scatter.

Chains a map through repeated inserts of pre-staged point batches.
"""

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


def chain(name, fn, m, batches, n_warm=3):
    for i in range(n_warm):
        m2 = fn(m, *batches[i])
    np.asarray(jax.tree_util.tree_leaves(m2)[0])
    t0 = time.perf_counter()
    for i in range(n_warm, len(batches)):
        m2 = fn(m2, *batches[i])
    np.asarray(jax.tree_util.tree_leaves(m2)[0])
    dt = (time.perf_counter() - t0) / (len(batches) - n_warm)
    print(f"{name:34s} {dt*1e3:8.2f} ms")


def main():
    cfg = cfgmod.MapConfig(voxel_size=1.0, max_range=80.0, capacity=1 << 17)
    n = 32768
    rng = np.random.default_rng(0)
    batches = []
    for i in range(16):
        # drifting cloud mimicking a moving scan footprint
        pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
        pts[:, 0] += i * 0.8
        pts[:, 2] *= 0.1
        batches.append((jnp.asarray(pts), jnp.ones((n,), bool)))

    m0 = voxel_map.create(cfg)
    # warm the map so inserts see realistic occupancy
    ins = jax.jit(lambda m, p, msk: voxel_map.insert(m, p, msk, cfg))
    m = m0
    for b in batches[:4]:
        m = ins(m, *b)
    np.asarray(m.keys)
    print(f"voxels: {int(voxel_map.num_voxels(m))}")

    chain("insert (full)", ins, m, batches)

    def sort_only(m, p, msk):
        vox = voxel_map.voxel_of(p, cfg.voxel_size)
        order, group, valid_s = voxel_map._voxel_group_sort(vox, msk, n)
        key_s = voxel_map.pack_key(vox[order])
        pts_s = p[order]
        # fold results into the map so nothing is DCE'd
        return m._replace(tombstones=m.tombstones + (key_s[0] + order[0]).astype(jnp.int32) + pts_s[0, 0].astype(jnp.int32))

    chain("  group-sort only", jax.jit(sort_only), m, batches)

    def slots_only(m, p, msk):
        vox = voxel_map.voxel_of(p, cfg.voxel_size)
        order, group, valid_s = voxel_map._voxel_group_sort(vox, msk, n)
        key_s = voxel_map.pack_key(vox[order])
        idxs = jnp.arange(n, dtype=jnp.int32)
        prev = jnp.concatenate([jnp.full((1,), -9, group.dtype), group[:-1]])
        first = valid_s & (group != prev)
        new_keys, slots_first, reused = voxel_map._find_insert_slots(
            m.keys, key_s, first, cfg.max_probes
        )
        return m._replace(keys=new_keys, tombstones=m.tombstones - reused + slots_first[0])

    chain("  sort + find_slots", jax.jit(slots_only), m, batches)

    # find_slots without the sort: feed unsorted keys, all active (dup keys!)
    def slots_nosort(m, p, msk):
        vox = voxel_map.voxel_of(p, cfg.voxel_size)
        keys = voxel_map.pack_key(vox)
        new_keys, slots, reused = voxel_map._find_insert_slots(
            m.keys, keys, msk, cfg.max_probes
        )
        return m._replace(keys=new_keys, tombstones=m.tombstones - reused + slots[0])

    chain("  find_slots alone (dup keys)", jax.jit(slots_nosort), m, batches)

    def scatter_only(m, p, msk):
        k = cfg.max_points_per_voxel
        slot = jnp.arange(n, dtype=jnp.int32) % cfg.capacity
        pos = jnp.zeros((n,), jnp.int32)
        flat = slot * (k * 3) + pos * 3
        pts_view = m.points.reshape(-1)
        for c in range(3):
            pts_view = pts_view.at[flat + c].set(p[:, c], mode="drop")
        new_points = pts_view.reshape(cfg.capacity, k * 3)
        new_npts = m.npts.at[slot].max(pos + 1, mode="drop")
        return m._replace(points=new_points, npts=new_npts)

    chain("  3x flat scatter + npts", jax.jit(scatter_only), m, batches)


if __name__ == "__main__":
    main()
