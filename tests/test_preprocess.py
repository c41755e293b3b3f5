"""Scan preprocessing: range gate, time sorting, rotation-model fallback,
segment splitting (reference frame.cpp behaviors)."""

import jax.numpy as jnp
import numpy as np

from lidar_imu_slam_tpu.config import LidarConfig
from lidar_imu_slam_tpu.ops import preprocess

CFG = LidarConfig(max_range=50.0, min_range=1.0, max_points=256, frame_rate=10.0)


def _raw(xyz, time=None, ring=None, stamp=100.0):
    return preprocess.pack_raw_scan(xyz, time=time, ring=ring, stamp=stamp, max_points=256)


class TestRangeGate:
    def test_blind_and_max_filtered(self):
        xyz = np.array(
            [[0.5, 0, 0], [10, 0, 0], [60, 0, 0], [np.nan, 0, 0], [3, 4, 0]],
            np.float32,
        )
        scan = preprocess.preprocess_scan(_raw(xyz), CFG)
        assert int(jnp.sum(scan.mask)) == 2  # only [10,0,0] and [3,4,0]

    def test_boundaries_inclusive(self):
        # reference keeps dist^2 in [blind_sq, max_sq] inclusive (frame.cpp:144)
        xyz = np.array([[1.0, 0, 0], [50.0, 0, 0]], np.float32)
        scan = preprocess.preprocess_scan(_raw(xyz), CFG)
        assert int(jnp.sum(scan.mask)) == 2


class TestTimeSorting:
    def test_sorted_by_sensor_time(self):
        xyz = np.tile([[10.0, 0, 0]], (4, 1)).astype(np.float32)
        xyz[:, 1] = [1, 2, 3, 4]
        t = np.array([100.03, 100.01, 100.04, 100.02])
        scan = preprocess.preprocess_scan(_raw(xyz, time=t), CFG)
        ys = np.asarray(scan.xyz[:4, 1])
        np.testing.assert_array_equal(ys, [2, 4, 1, 3])
        rel = np.asarray(scan.rel_t[:4])
        assert (np.diff(rel) >= 0).all()
        assert rel[0] == 0.0

    def test_tau_normalized(self):
        xyz = np.tile([[10.0, 0, 0]], (5, 1)).astype(np.float32)
        t = 100.0 + np.linspace(0, 0.1, 5)
        scan = preprocess.preprocess_scan(_raw(xyz, time=t), CFG)
        tau = np.asarray(scan.tau[:5])
        np.testing.assert_allclose(tau[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(tau[-1], 1.0, atol=1e-6)

    def test_t_begin_end(self):
        xyz = np.tile([[10.0, 0, 0]], (3, 1)).astype(np.float32)
        t = np.array([100.0, 100.05, 100.1])
        scan = preprocess.preprocess_scan(_raw(xyz, time=t), CFG)
        assert float(scan.t_begin) == 100.0
        np.testing.assert_allclose(float(scan.t_end), 100.1, atol=1e-9)


class TestRotationModelFallback:
    def test_azimuth_time_reconstruction(self):
        """No per-point timestamps: time must come from azimuth sweep
        (reference frame.cpp:159-182). A full CCW-ordered ring sweep maps to
        [0, 100 ms) at 10 Hz."""
        n = 64
        az = np.linspace(0, -2 * np.pi * 0.9, n)  # clockwise sweep (yaw decreasing)
        xyz = np.stack([10 * np.cos(az), 10 * np.sin(az), np.zeros(n)], 1).astype(
            np.float32
        )
        scan = preprocess.preprocess_scan(
            _raw(xyz, ring=np.zeros(n, np.int32)), CFG
        )
        rel = np.asarray(scan.rel_t[:n])
        assert (np.diff(rel) >= -1e-9).all()
        np.testing.assert_allclose(rel[-1], 0.9 * 0.1, rtol=0.02)


class TestSegments:
    def test_equal_count_split(self):
        xyz = np.tile([[10.0, 0, 0]], (100, 1)).astype(np.float32)
        t = 100.0 + np.linspace(0, 0.1, 100)
        scan = preprocess.preprocess_scan(_raw(xyz, time=t), CFG)
        seg = np.asarray(preprocess.segment_ids(scan, 4))
        m = np.asarray(scan.mask)
        counts = [int(((seg == i) & m).sum()) for i in range(4)]
        assert counts == [25, 25, 25, 25]


class TestSplitScanCompact:
    """Compact (ceil(N/k)-shaped) equal-count split must carry exactly the
    same valid points, times and tau as the full-shape splitter."""

    def test_matches_full_shape_split(self):
        import numpy as np

        from lidar_imu_slam_tpu.config import LidarConfig
        from lidar_imu_slam_tpu.ops.preprocess import (
            pack_raw_scan, preprocess_scan, split_scan, split_scan_compact,
        )

        rng = np.random.default_rng(0)
        n_valid = 3000
        pts = rng.uniform(-20, 20, (n_valid, 3))
        t = np.sort(rng.uniform(0, 0.1, n_valid))
        raw = pack_raw_scan(pts, time=100.0 + t, stamp=100.0, max_points=4096)
        scan = preprocess_scan(raw, LidarConfig(max_range=50.0, min_range=0.1, max_points=4096))

        for k in (2, 3, 4):
            full = split_scan(scan, k)
            compact = split_scan_compact(scan, k)
            assert len(full) == len(compact) == k
            for fs, cs in zip(full, compact):
                assert cs.mask.shape[0] == -(-4096 // k)
                f_pts = np.asarray(fs.xyz)[np.asarray(fs.mask)]
                c_pts = np.asarray(cs.xyz)[np.asarray(cs.mask)]
                np.testing.assert_allclose(c_pts, f_pts, atol=0)
                np.testing.assert_allclose(
                    np.asarray(cs.rel_t)[np.asarray(cs.mask)],
                    np.asarray(fs.rel_t)[np.asarray(fs.mask)],
                    atol=1e-12,
                )
                np.testing.assert_allclose(
                    np.asarray(cs.tau)[np.asarray(cs.mask)],
                    np.asarray(fs.tau)[np.asarray(fs.mask)],
                    atol=1e-6,
                )
                assert abs(float(cs.t_begin) - float(fs.t_begin)) < 1e-9
                assert abs(float(cs.t_end) - float(fs.t_end)) < 1e-9
