"""Ablation timing: chained odometry loops with components disabled.

Each variant runs the same chained 20-scan loop as the bench; the delta
against the full step attributes real milliseconds to a component without
per-call dispatch noise.

    python tools/ablate_step.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.models import kiss_icp
from lidar_imu_slam_tpu.ops import icp as icp_ops
from lidar_imu_slam_tpu.ops import lie, voxel_map
from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan


def make_variant(name, cfg, *, no_insert=False, no_evict=False, no_icp=False,
                 no_voxelize=False, fetch_only=False):
    """A register_frame clone with pieces cut out."""

    def step(state, scan):
        if no_voxelize:
            source = scan.xyz[: cfg.icp.max_source_points]
            source_mask = scan.mask[: cfg.icp.max_source_points]
            map_pts = scan.xyz[: cfg.icp.max_map_points]
            map_mask = scan.mask[: cfg.icp.max_map_points]
        else:
            source, source_mask, map_pts, map_mask = kiss_icp.voxelize(
                scan.xyz, scan.mask, cfg
            )
        moved = kiss_icp.has_moved(state, cfg.icp.min_motion_th)
        thr_state, sigma = icp_ops.compute_threshold(
            state.threshold, moved, cfg.icp.initial_threshold,
            cfg.icp.min_motion_th, cfg.map.max_range,
        )
        last_pose = jnp.where(
            state.num_poses == 0, jnp.eye(4, dtype=jnp.float64), state.pose
        )
        init_guess = last_pose @ kiss_icp.get_prediction_model(state)
        if no_icp:
            pose = init_guess
            n_corr = jnp.int32(0)
        elif fetch_only:
            world = lie.transform_points(init_guess, source.astype(jnp.float64)).astype(jnp.float32)
            cand, cand_valid = voxel_map.gather_candidates(state.map, world, source_mask, cfg.map)
            nn, d2, found = voxel_map.nn_from_candidates(cand, cand_valid, world, source_mask)
            pose = init_guess + 0.0 * jnp.sum(nn).astype(jnp.float64)
            n_corr = jnp.sum(found, dtype=jnp.int32)
        else:
            result = icp_ops.icp_registration(
                state.map, source, source_mask, init_guess,
                3.0 * sigma, sigma / 3.0, cfg.map,
                cfg.icp.max_iterations, cfg.icp.estimation_threshold,
                cfg.icp.min_correspondences, cfg.icp.max_step_norm,
            )
            pose = result.pose
            n_corr = result.num_correspondences
        pose = lie.orthonormalize(pose)
        thr_state = icp_ops.update_model_deviation(
            thr_state, lie.transform_inverse(init_guess) @ pose
        )
        new_map = state.map
        if not no_insert:
            world = lie.transform_points(pose, map_pts.astype(jnp.float64)).astype(jnp.float32)
            new_map = voxel_map.insert(new_map, world, map_mask, cfg.map)
        if not no_evict:
            new_map = voxel_map.evict_far(new_map, pose[:3, 3], cfg.map)
        new_state = kiss_icp.KissState(
            map=new_map, pose=pose,
            pose_prev=jnp.where(state.num_poses == 0, pose, state.pose),
            first_pose=jnp.where(state.num_poses == 0, pose, state.first_pose),
            num_poses=state.num_poses + 1, threshold=thr_state,
        )
        return new_state, (pose, n_corr)

    return name, jax.jit(step)


def run(name, fn, scans, cfg, n_warm=4):
    state = kiss_icp.init_state(cfg)
    for i in range(n_warm):
        state, out = fn(state, scans[i])
    np.asarray(out[0])
    t0 = time.perf_counter()
    for i in range(n_warm, len(scans)):
        state, out = fn(state, scans[i])
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / (len(scans) - n_warm)
    print(f"{name:28s} {dt*1e3:8.2f} ms/step")
    return dt


def main():
    points_per_scan = 131072
    cfg = cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(
            num_scan_lines=64, max_points=points_per_scan, min_range=2.5, max_range=80.0
        ),
        map=cfgmod.MapConfig(voxel_size=1.0, max_range=80.0, capacity=1 << 17),
        icp=cfgmod.IcpConfig(max_map_points=32768, max_source_points=4096),
    )
    world = synthetic.make_world(seed=0, n_points=600_000, extent=(160.0, 40.0, 12.0))
    gt = synthetic.make_trajectory(n_poses=24, speed=8.0, yaw_rate=0.01, dt=0.1)
    pre = jax.jit(lambda raw: preprocess_scan(raw, cfg.lidar))
    scans = []
    for i, pose in enumerate(gt):
        pts = synthetic.render_scan(world, pose, points_per_scan, 2.5, 80.0, noise=0.02, seed=i)
        raw = pack_raw_scan(pts, stamp=i * 0.1, max_points=points_per_scan)
        scans.append(jax.block_until_ready(pre(raw)))

    variants = [
        make_variant("full", cfg),
        make_variant("no_insert", cfg, no_insert=True),
        make_variant("no_evict", cfg, no_evict=True),
        make_variant("no_map_update", cfg, no_insert=True, no_evict=True),
        make_variant("no_icp", cfg, no_icp=True),
        make_variant("fetch_only_icp", cfg, fetch_only=True),
        make_variant("no_voxelize", cfg, no_voxelize=True, no_icp=True,
                     no_insert=True, no_evict=True),
    ]
    for name, fn in variants:
        run(name, fn, scans, cfg)


if __name__ == "__main__":
    main()
