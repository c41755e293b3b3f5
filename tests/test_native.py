"""Native scan packer vs the JAX preprocessing path: identical semantics."""

import numpy as np
import pytest

from lidar_imu_slam_tpu.config import LidarConfig
from lidar_imu_slam_tpu.host import native
from lidar_imu_slam_tpu.ops import preprocess

CFG = LidarConfig(max_range=50.0, min_range=1.0, max_points=256, frame_rate=10.0)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestNativePacker:
    def test_matches_jax_preprocess_with_times(self):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-40, 40, (200, 3)).astype(np.float32)
        t = 100.0 + rng.uniform(0, 0.1, 200)
        n_xyz, n_tau, n_rel, n_mask, tb, te = native.pack_scan_native(
            xyz, t, None, 100.0, CFG
        )
        raw = preprocess.pack_raw_scan(xyz, time=t, stamp=100.0, max_points=256)
        scan = preprocess.preprocess_scan(raw, CFG)
        j_mask = np.asarray(scan.mask)
        assert (n_mask == j_mask).all()
        np.testing.assert_allclose(n_xyz[n_mask], np.asarray(scan.xyz)[j_mask], atol=1e-6)
        np.testing.assert_allclose(n_rel[n_mask], np.asarray(scan.rel_t)[j_mask], atol=1e-9)
        np.testing.assert_allclose(n_tau[n_mask], np.asarray(scan.tau)[j_mask], atol=1e-6)
        np.testing.assert_allclose(tb, float(scan.t_begin), atol=1e-9)
        np.testing.assert_allclose(te, float(scan.t_end), atol=1e-9)

    def test_range_gate_and_nan(self):
        xyz = np.array(
            [[0.5, 0, 0], [10, 0, 0], [60, 0, 0], [np.nan, 0, 0], [3, 4, 0]],
            np.float32,
        )
        _, _, _, mask, _, _ = native.pack_scan_native(xyz, None, None, 0.0, CFG)
        assert mask.sum() == 2

    def test_rotation_fallback_matches(self):
        n = 64
        az = np.linspace(0, -2 * np.pi * 0.9, n)
        xyz = np.stack([10 * np.cos(az), 10 * np.sin(az), np.zeros(n)], 1).astype(
            np.float32
        )
        ring = np.zeros(n, np.int32)
        n_xyz, _, n_rel, n_mask, _, _ = native.pack_scan_native(xyz, None, ring, 0.0, CFG)
        raw = preprocess.pack_raw_scan(xyz, ring=ring, stamp=0.0, max_points=256)
        scan = preprocess.preprocess_scan(raw, CFG)
        np.testing.assert_allclose(
            n_rel[n_mask], np.asarray(scan.rel_t)[np.asarray(scan.mask)], atol=1e-6
        )

    def test_voxel_downsample_first_wins(self):
        xyz = np.array([[0.7, 0.7, 0.7], [0.1, 0.1, 0.1], [1.5, 0.1, 0.1]], np.float32)
        out = native.voxel_downsample_native(xyz, 1.0, 8)
        assert len(out) == 2
        np.testing.assert_allclose(out[0], [0.7, 0.7, 0.7], atol=1e-6)
