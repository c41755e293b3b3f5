"""Runner-level frame splitting (reference frame_split_num + MIN_SCAN_COUNT
warmup gate, frame.cpp:5,64): each segment registers as an independent frame."""

import numpy as np

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.host.runner import OdometryRunner


def _cfg(split):
    return cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(
            max_range=30.0, min_range=0.5, max_points=4096, frame_split_num=split
        ),
        map=cfgmod.MapConfig(voxel_size=0.5, max_range=30.0, capacity=1 << 14, max_probes=16),
        icp=cfgmod.IcpConfig(max_map_points=4096, max_source_points=1024, max_iterations=50),
        min_scan_count=3,
    )


class TestRunnerSplit:
    def test_split_runs_and_tracks(self):
        world = synthetic.make_world(seed=0, n_points=120_000, extent=(30.0, 10.0, 5.0))
        gt = synthetic.make_trajectory(n_poses=8, speed=1.0, dt=0.1)
        scans = [
            {
                "xyz": synthetic.render_scan(world, p, 3000, 0.5, 30.0, seed=i),
                "time": i * 0.1 + np.linspace(0, 0.1, 3000),
                "stamp": i * 0.1,
            }
            for i, p in enumerate(gt)
        ]
        runner = OdometryRunner(_cfg(split=2)).run(iter(scans))
        # after the warmup gate, scans 3..7 register twice (2 segments)
        assert int(runner.state.num_poses) == 3 + 5 * 2
        gt_rel = np.linalg.inv(gt[0]) @ gt[-1]
        err = np.linalg.norm(runner.poses[-1][:3, 3] - gt_rel[:3, 3])
        assert err < 0.12, err
