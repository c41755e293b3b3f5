"""Per-stage timing of the odometry step (perf lab companion).

Times each pipeline stage warm, on device-resident inputs, with the bench
perf config (pallas + packed-only map + unsorted scans). Reuses the lab
scan cache. Usage:

    LIS_GN_BACKEND=pallas python tools/stages.py
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

from lidar_imu_slam_tpu.ops import icp as icp_ops  # noqa: E402
from lidar_imu_slam_tpu.ops import lie, stats, voxel_map  # noqa: E402
from lidar_imu_slam_tpu.ops.preprocess import preprocess_scan  # noqa: E402
from tools.lab import make_cfg, load_scans, warm_state, CACHE, PTS  # noqa: E402


def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))  # compile
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{dt:7.3f} ms  {name}")
    return out


def main():
    cfg = make_cfg()
    scans = load_scans(cfg)
    state = warm_state(cfg, scans)
    scan = scans[21]
    m = state.map

    # raw device scan for preprocess timing
    z = np.load(CACHE)
    from lidar_imu_slam_tpu.host import synthetic
    from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan
    raw = pack_raw_scan(
        z["xyz21"], time=synthetic.azimuth_times(z["xyz21"], 2.1),
        stamp=2.1, max_points=PTS,
    )
    raw = jax.tree.map(jnp.asarray, raw)

    pre = jax.jit(lambda r: preprocess_scan(r, cfg.lidar))
    timeit("preprocess (device raw)", pre, raw)

    guess = state.pose
    Rg = guess[:3, :3].astype(jnp.float32)
    tg = guess[:3, 3].astype(jnp.float32)

    @jax.jit
    def world_pts(scan, guess):
        Rg = guess[:3, :3].astype(jnp.float32)
        tg = guess[:3, 3].astype(jnp.float32)
        return lie.rotate_points(Rg, scan.xyz) + tg

    world = timeit("world transform", world_pts, scan, guess)

    fd = jax.jit(lambda w, mk, tau: voxel_map.fused_downsample(
        w, mk, cfg.map.voxel_size, cfg.icp.max_map_points, tau=tau))
    g = timeit("fused_downsample", fd, world, scan.mask, scan.tau)
    print(f"         n_unique = {int(g.n_unique)} / {cfg.icp.max_map_points}")

    fp = jax.jit(lambda p, mk: voxel_map.first_point_per_voxel(
        p, mk, 1.5 * cfg.map.voxel_size, cfg.icp.max_source_points))
    src, src_mask, nsrc, _ = timeit("first_point_per_voxel", fp, g.points, g.mask)
    print(f"         n_source = {int(nsrc)} / {cfg.icp.max_source_points}")

    iqr = jax.jit(lambda s, mk, t: stats.iqr_inlier_mask(
        jnp.sum((s - t[None, :]) ** 2, axis=-1).astype(jnp.float64), mk))
    src_mask = timeit("iqr mask", iqr, src, src_mask, tg)

    sigma = jnp.float64(0.5)
    reg = jax.jit(lambda m, s, mk: icp_ops.registration_dispatch(
        m, s, mk, jnp.eye(4, dtype=jnp.float64), sigma, cfg.map, cfg.icp))
    res = timeit("registration_dispatch", reg, m, src, src_mask)
    print(f"         iters = {int(res.iterations)}")

    keys = jax.jit(lambda p: voxel_map.pack_key(
        voxel_map.voxel_of(p, cfg.map.voxel_size)))(g.points)

    ins = jax.jit(lambda m, g, k: voxel_map.insert_grouped(m, g, cfg.map, keys=k))
    timeit("insert_grouped", ins, m, g, keys)

    ev = jax.jit(lambda m, o: voxel_map.evict_far(m, o, cfg.map))
    timeit("evict_far", ev, m, guess[:3, 3])

    from lidar_imu_slam_tpu.models import kiss_icp
    full = jax.jit(lambda st, sc: kiss_icp.register_frame(st, sc, cfg),
                   static_argnames=())
    timeit("FULL register_frame", full, state, scan)

    # chained register-only (no preprocess): amortized per-scan device cost
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans[:20])

    @jax.jit
    def chain(st, stacked):
        def body(s, sc):
            s, out = kiss_icp.register_frame(s, sc, cfg)
            return s, out.pose
        return jax.lax.scan(body, st, stacked)

    out = jax.block_until_ready(chain(state, stacked))
    np.asarray(out[1])
    t0 = time.perf_counter()
    out = chain(state, stacked)
    np.asarray(out[1])
    print(f"{(time.perf_counter()-t0)/20*1e3:7.3f} ms  chained register (per scan, 20/call)")


if __name__ == "__main__":
    main()
