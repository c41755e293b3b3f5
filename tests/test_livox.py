"""Dense solid-state (Livox-style) scans: 262,144 points/frame
(BASELINE.json config 4). Exercises the full pipeline at the packed-sort
budget edge (_IDX_BITS: 2^18 points per sorted call)."""

import numpy as np

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.models import kiss_icp
from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan


def test_livox_dense_full_budget_tracks():
    cfg = cfgmod.livox_dense()
    assert cfg.lidar.max_points == 262144  # the 2^18 sort-budget edge
    world = synthetic.make_world(seed=2, n_points=500_000, extent=(120.0, 30.0, 10.0))
    n = 6
    gt = synthetic.make_trajectory(n_poses=n, speed=4.0, yaw_rate=0.01, dt=0.1)

    state = kiss_icp.init_state(cfg)
    poses = []
    for i, pose in enumerate(gt):
        pts = synthetic.render_scan(
            world, pose, cfg.lidar.max_points, cfg.lidar.min_range,
            cfg.lidar.max_range, noise=0.02, seed=i
        )
        assert len(pts) == cfg.lidar.max_points  # genuinely full-budget
        raw = pack_raw_scan(pts, stamp=i * 0.1, max_points=cfg.lidar.max_points)
        scan = preprocess_scan(raw, cfg.lidar)
        state, out = kiss_icp.register_frame_jit(state, scan, cfg)
        poses.append(np.asarray(out.pose))
        assert np.isfinite(poses[-1]).all()

    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    err = np.linalg.norm(poses[-1][:3, 3] - gt_rel[-1][:3, 3])
    assert err < 0.3, err
    # the dense frame must actually fill the downsample budgets
    assert int(out.num_correspondences) > 1000
