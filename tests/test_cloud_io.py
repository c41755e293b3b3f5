"""Per-scan cloud export: the file-based analog of the reference's
frame/keypoints/local_map ROS topics (reference src/odom_run.cpp:187-238;
`local_map` was advertised but never published — we do export it)."""

import numpy as np

from lidar_imu_slam_tpu import cli
from lidar_imu_slam_tpu.utils import cloud_io


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    cloud_io.write_ply(p, pts)
    back = cloud_io.read_ply(p)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_cli_save_clouds(tmp_path):
    out = str(tmp_path / "traj.tum")
    clouds = str(tmp_path / "clouds")
    rc = cli.main(
        [
            "--synthetic", "6", "--preset", "default",
            "--out", out, "--save-clouds", clouds,
            "--save-clouds-every", "2",
        ]
    )
    assert rc == 0
    frames = sorted((tmp_path / "clouds").glob("frame_*.ply"))
    assert len(frames) == 3  # scans 0, 2, 4
    pts = cloud_io.read_ply(str(frames[-1]))
    assert len(pts) > 100 and np.isfinite(pts).all()
    m = cloud_io.read_ply(str(tmp_path / "clouds" / "local_map.ply"))
    assert len(m) > 1000 and np.isfinite(m).all()
