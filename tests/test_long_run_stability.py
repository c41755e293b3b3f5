"""Long-run numerical stability: matrix-form pose composition must stay on
SO(3) (the CV-prediction feedback doubles any non-orthonormality defect per
scan — fatal within ~50 scans without renormalization), and tracking must
survive a saturated map + tombstone churn."""

import numpy as np

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.host.runner import OdometryRunner


class TestLongRunStability:
    def test_80_scans_det_stays_unit_under_map_overload(self):
        cfg = cfgmod.PipelineConfig(
            lidar=cfgmod.LidarConfig(max_range=12.0, min_range=0.5, max_points=2048),
            map=cfgmod.MapConfig(voxel_size=0.5, max_range=12.0, capacity=2048, max_probes=16),
            icp=cfgmod.IcpConfig(max_map_points=2048, max_source_points=512, max_iterations=30),
        )
        world = synthetic.make_world(seed=0, n_points=200_000, extent=(80.0, 10.0, 5.0))
        gt = synthetic.make_trajectory(n_poses=80, speed=4.0, yaw_rate=0.0, dt=0.1)
        scans = (
            {"xyz": synthetic.render_scan(world, p, 1800, 0.5, 12.0, seed=i), "stamp": i * 0.1}
            for i, p in enumerate(gt)
        )
        r = OdometryRunner(cfg).run(scans)
        poses = np.stack(r.poses)
        assert np.isfinite(poses).all()
        dets = np.linalg.det(poses[:, :3, :3])
        np.testing.assert_allclose(dets, 1.0, atol=1e-9)
        gt_rel = np.linalg.inv(gt[0]) @ gt[-1]
        err = np.linalg.norm(poses[-1][:3, 3] - gt_rel[:3, 3])
        # map saturation degrades accuracy but must not diverge
        assert err < 1.0, err
