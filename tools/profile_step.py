"""Stage-by-stage timing of the odometry step on the live accelerator.

Times each subcomponent of kiss_icp.register_frame in isolation (separately
jitted, donated where the real step donates) so the optimization effort lands
where the milliseconds are. Host sync after every timed window is a real
fetch (np.asarray): block_until_ready does not synchronize through the axon
tunnel.

    python tools/profile_step.py [n_iters]
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
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.models import kiss_icp
from lidar_imu_slam_tpu.ops import icp as icp_ops
from lidar_imu_slam_tpu.ops import lie, voxel_map
from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan


def timeit(name, fn, *args, n=10, sync=None):
    """fn is jitted; time n calls with a host fetch at the end."""
    out = fn(*args)  # compile
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt*1e3:8.3f} ms")
    return out, dt


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    points_per_scan = 131072
    cfg = cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(
            num_scan_lines=64, max_points=points_per_scan, min_range=2.5, max_range=80.0
        ),
        map=cfgmod.MapConfig(voxel_size=1.0, max_range=80.0, capacity=1 << 17),
        icp=cfgmod.IcpConfig(max_map_points=32768, max_source_points=4096),
    )

    world = synthetic.make_world(seed=0, n_points=600_000, extent=(160.0, 40.0, 12.0))
    gt = synthetic.make_trajectory(n_poses=12, speed=8.0, yaw_rate=0.01, dt=0.1)
    pre = jax.jit(lambda raw: preprocess_scan(raw, cfg.lidar))
    scans = []
    for i, pose in enumerate(gt):
        pts = synthetic.render_scan(world, pose, points_per_scan, 2.5, 80.0, noise=0.02, seed=i)
        raw = pack_raw_scan(pts, stamp=i * 0.1, max_points=points_per_scan)
        scans.append((raw, jax.block_until_ready(pre(raw))))

    # build a warm state (a few steps) so stage timings see realistic occupancy
    state = kiss_icp.init_state(cfg)
    for i in range(8):
        state, out = kiss_icp.register_frame_jit(state, scans[i][1], cfg)
    np.asarray(out.pose)
    print(f"map voxels after warmup: {int(out.map_voxels)}")

    raw, scan = scans[9]

    # --- full step ---------------------------------------------------------
    timeit("register_frame (full step)", lambda: kiss_icp.register_frame_jit(state, scan, cfg), n=n_iters)

    # --- preprocess --------------------------------------------------------
    timeit("preprocess_scan", lambda: pre(raw), n=n_iters)

    # --- voxelize (double downsample + IQR) -------------------------------
    vox_fn = jax.jit(lambda xyz, m: kiss_icp.voxelize(xyz, m, cfg))
    (source, source_mask, map_pts, map_mask), _ = timeit(
        "voxelize (2x downsample + IQR)", vox_fn, scan.xyz, scan.mask, n=n_iters
    )
    print(f"  source pts: {int(jnp.sum(source_mask))}, map pts: {int(jnp.sum(map_mask))}")

    ds1 = jax.jit(
        lambda xyz, m: voxel_map.first_point_per_voxel(xyz, m, 0.5 * cfg.map.voxel_size, cfg.icp.max_map_points)
    )
    timeit("  downsample#1 (131k->32k)", ds1, scan.xyz, scan.mask, n=n_iters)
    ds2 = jax.jit(
        lambda xyz, m: voxel_map.first_point_per_voxel(xyz, m, 1.5 * cfg.map.voxel_size, cfg.icp.max_source_points)
    )
    timeit("  downsample#2 (32k->4k)", ds2, map_pts, map_mask, n=n_iters)

    # --- ICP breakdown -----------------------------------------------------
    init_guess = state.pose @ kiss_icp.get_prediction_model(state)
    pts64 = source.astype(jnp.float64)
    world_pts = jax.jit(lambda T: lie.transform_points(T, pts64).astype(jnp.float32))(init_guess)

    gather = jax.jit(lambda q, m: voxel_map.gather_candidates(state.map, q, m, cfg.map))
    (cand, cand_valid), _ = timeit("gather_candidates (1 fetch)", gather, world_pts, source_mask, n=n_iters)

    nn_red = jax.jit(voxel_map.nn_from_candidates)
    timeit("nn_from_candidates (1 iter)", nn_red, cand, cand_valid, world_pts, source_mask, n=n_iters)

    nn, d2, found = nn_red(cand, cand_valid, world_pts, source_mask)
    corr = found & (d2 < 4.0)
    align = jax.jit(lambda w, nnp, c: icp_ops.align_clouds(w.astype(jnp.float64), nnp, c, 0.5)[0])
    timeit("align_clouds (1 GN solve)", align, world_pts, nn, corr, n=n_iters)

    icp_full = jax.jit(
        lambda: icp_ops.icp_registration(
            state.map, source, source_mask, init_guess, 2.0, 0.3, cfg.map,
            cfg.icp.max_iterations, cfg.icp.estimation_threshold,
        )
    )
    res, _ = timeit("icp_registration (full loop)", icp_full, n=n_iters)
    print(f"  iters={int(res.iterations)}, corr={int(res.num_correspondences)}")

    # --- map update --------------------------------------------------------
    ins = jax.jit(lambda m, p, msk: voxel_map.insert(m, p, msk, cfg.map))
    world_map_pts = jax.jit(lambda T: lie.transform_points(T, map_pts.astype(jnp.float64)).astype(jnp.float32))(init_guess)
    timeit("insert (32k pts)", ins, state.map, world_map_pts, map_mask, n=n_iters)

    ev = jax.jit(lambda m, o: voxel_map.evict_far(m, o, cfg.map))
    timeit("evict_far", ev, state.map, init_guess[:3, 3], n=n_iters)

    upd = jax.jit(lambda m, p, msk, T: voxel_map.update(m, p, msk, T, cfg.map))
    timeit("map update (insert+evict)", upd, state.map, map_pts, map_mask, init_guess, n=n_iters)


if __name__ == "__main__":
    main()
