"""Headline benchmark: 64-beam scans/sec through the full odometry step.

Runs the flagship KISS-ICP pipeline (the reference's wired end-to-end path)
on synthetic 64-beam-scale scans on whatever accelerator JAX sees (the real
TPU under the driver). Prints ONE JSON line:

  {"metric": "scans_per_sec_64beam", "value": N, "unit": "scans/s",
   "vs_baseline": N / 1000.0}

vs_baseline is against the BASELINE.json north-star target of 1,000
64-beam scans/sec/chip (the reference publishes no numbers of its own —
BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from lidar_imu_slam_tpu import config as cfgmod
    from lidar_imu_slam_tpu.host import synthetic
    from lidar_imu_slam_tpu.models import kiss_icp
    from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan

    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    points_per_scan = 131072  # HDL-64E scale

    cfg = cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(
            num_scan_lines=64, max_points=points_per_scan, min_range=2.5, max_range=80.0
        ),
        map=cfgmod.MapConfig(voxel_size=1.0, max_range=80.0, capacity=1 << 17),
        icp=cfgmod.IcpConfig(max_map_points=32768, max_source_points=8192),
    )

    world = synthetic.make_world(seed=0, n_points=600_000, extent=(160.0, 40.0, 12.0))
    gt = synthetic.make_trajectory(n_poses=n_scans, speed=8.0, yaw_rate=0.01, dt=0.1)

    # pre-render and preprocess all scans so the loop times the step only
    scans = []
    pre = jax.jit(lambda raw: preprocess_scan(raw, cfg.lidar))
    for i, pose in enumerate(gt):
        pts = synthetic.render_scan(
            world, pose, points_per_scan, 2.5, 80.0, noise=0.02, seed=i
        )
        raw = pack_raw_scan(pts, stamp=i * 0.1, max_points=points_per_scan)
        scans.append(jax.block_until_ready(pre(raw)))

    state = kiss_icp.init_state(cfg)

    # warmup: compile + first two steps (map fill-in)
    for i in range(2):
        state, out = kiss_icp.register_frame_jit(state, scans[i], cfg)
    jax.block_until_ready(out.pose)

    t0 = time.perf_counter()
    for i in range(2, n_scans):
        state, out = kiss_icp.register_frame_jit(state, scans[i], cfg)
    jax.block_until_ready(out.pose)
    dt = time.perf_counter() - t0

    timed = n_scans - 2
    scans_per_sec = timed / dt
    print(
        json.dumps(
            {
                "metric": "scans_per_sec_64beam",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 1000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
