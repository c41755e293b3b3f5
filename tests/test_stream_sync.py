"""Host stream hygiene (reference odom_run.cpp:55-63, sensors/*/frame.cpp):
lidar-imu time-offset detection, loop-back resets, IMU rate warning, and an
end-to-end LIO run over a stream with offset clocks."""

import numpy as np
import pytest

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.host.runner import LioRunner
from lidar_imu_slam_tpu.host.stream_sync import StreamSynchronizer


def _cfg(reset=8):
    return cfgmod.ImuConfig(reset=reset, max_samples_per_scan=32)


class TestStreamSynchronizer:
    def test_offset_detection_and_shift(self):
        warns = []
        s = StreamSynchronizer(_cfg(), warn=warns.append)
        # IMU clock runs 100 s ahead of the LiDAR clock
        for k in range(5):
            s.push_imu(100.0 + 0.01 * k, np.zeros(3), [0, 0, 9.81])
        s.push_scan(0.05)
        assert s.offset_set
        assert abs(s.time_offset - (100.04 - 0.05)) < 1e-9
        # queued samples were re-shifted into the lidar clock
        assert all(row[0] < 1.0 for row in s.buffer)
        assert any("offset" in w for w in warns)
        # later samples arrive shifted too
        s.push_imu(100.06, np.zeros(3), [0, 0, 9.81])
        take = s.take_until(0.2, 32)
        assert len(take) == 6
        assert np.all(np.diff(take[:, 0]) > 0)

    def test_small_offset_not_latched(self):
        s = StreamSynchronizer(_cfg())
        s.push_imu(0.01, np.zeros(3), [0, 0, 9.81])
        s.push_scan(0.05)
        assert s.offset_set  # checked once, like the reference flag
        assert s.time_offset == 0.0

    def test_imu_loop_back_clears_buffer(self):
        warns = []
        s = StreamSynchronizer(_cfg(), warn=warns.append)
        for k in range(4):
            s.push_imu(0.01 * k, np.zeros(3), [0, 0, 9.81])
        s.push_imu(0.005, np.zeros(3), [0, 0, 9.81])  # regression
        assert len(s.buffer) == 1
        assert any("loop back" in w.lower() for w in warns)

    def test_lidar_loop_back_flag(self):
        s = StreamSynchronizer(_cfg())
        assert not s.push_scan(1.0)
        assert s.push_scan(0.5)

    def test_rate_warning(self):
        warns = []
        s = StreamSynchronizer(_cfg(reset=8), warn=warns.append)
        for k in range(8):
            s.push_imu(0.05 * k, np.zeros(3), [0, 0, 9.81])  # 20 Hz
        assert any("150 Hz" in w for w in warns)

    def test_running_mean_matches_reference_recursion(self):
        s = StreamSynchronizer(_cfg(reset=100))
        rng = np.random.default_rng(0)
        accs = rng.normal([0, 0, 9.8], 0.05, (50, 3))
        for k, a in enumerate(accs):
            s.push_imu(0.005 * k, np.zeros(3), a)
        np.testing.assert_allclose(s.mean_acc, accs.mean(axis=0), atol=1e-12)


class TestLioRunnerOffsetStream:
    def test_tracks_with_offset_imu_clock(self):
        """A LIO drive where the IMU clock is 50 s ahead: without offset
        detection every packet would be empty (or mis-bucketed); with it the
        pipeline must track exactly as well as the aligned-clock run."""
        cfg = cfgmod.PipelineConfig(
            lidar=cfgmod.LidarConfig(max_range=25.0, min_range=0.5, max_points=4096),
            map=cfgmod.MapConfig(voxel_size=0.5, max_range=25.0, capacity=1 << 13),
            icp=cfgmod.IcpConfig(max_map_points=4096, max_source_points=1024,
                                 max_iterations=30),
            imu=cfgmod.ImuConfig(max_init_count=30, max_samples_per_scan=32),
        )
        world = synthetic.make_world(seed=5, n_points=60_000, extent=(40.0, 12.0, 5.0))
        n = 12
        gt = synthetic.make_trajectory(n_poses=n, speed=1.5, yaw_rate=0.02, dt=0.1)

        def scan_stream():
            for i, p in enumerate(gt):
                yield {
                    "xyz": synthetic.render_scan(world, p, 3000, 0.5, 25.0, seed=i),
                    "stamp": i * 0.1,
                }

        def imu_rows(offset):
            # phase-shifted off the scan-stamp boundaries: a sample at
            # exactly t = k*0.1 would bucket-flip under the ~1e-14 rounding
            # of the offset shift (not a bug — the sample just lands in the
            # next packet — but it breaks the exact-equality comparison)
            rows = []
            for k in range(n * 10):
                t = k * 0.01 + 0.0013
                rows.append([t + offset, 0, 0, 0, 0, 0, 9.81])
            return np.asarray(rows)

        r_aligned = LioRunner(cfg).run_lio(scan_stream(), imu_rows(0.0))
        r_offset = LioRunner(cfg).run_lio(scan_stream(), imu_rows(50.0))

        used_aligned = [m.get("used_imu") for m in r_aligned.metrics.records]
        used_offset = [m.get("used_imu") for m in r_offset.metrics.records]
        assert used_aligned == used_offset
        # the latched offset includes the instantaneous sub-period phase
        # (reference odom_run.cpp:55-63 latches the raw diff), so packet
        # bucketing shifts by up to one IMU period: trajectories agree to
        # sub-sample jitter, not bitwise
        d = np.stack(r_aligned.poses)[:, :3, 3] - np.stack(r_offset.poses)[:, :3, 3]
        assert np.max(np.linalg.norm(d, axis=1)) < 0.1
