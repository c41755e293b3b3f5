"""Pallas streaming brute-force NN vs numpy ground truth (interpret mode on
CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from lidar_imu_slam_tpu.config import MapConfig
from lidar_imu_slam_tpu.ops import voxel_map as vm
from lidar_imu_slam_tpu.ops.pallas import nn_bruteforce as bf


class TestBruteforceNN:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        n, m_pts = 256, 8192
        queries = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
        pts = rng.uniform(-20, 20, (m_pts, 3)).astype(np.float32)
        pool = np.full((3, bf.MT * ((m_pts + bf.MT - 1) // bf.MT)), np.inf, np.float32)
        pool[:, :m_pts] = pts.T

        d2, idx = bf.nn_bruteforce(jnp.asarray(queries), jnp.asarray(pool), interpret=True)
        # numpy ground truth
        gt_d2 = ((queries[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        gt_idx = gt_d2.argmin(1)
        np.testing.assert_allclose(np.asarray(d2), gt_d2.min(1), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), gt_idx)

    def test_inf_padding_never_wins(self):
        rng = np.random.default_rng(1)
        queries = rng.uniform(-5, 5, (bf.QT, 3)).astype(np.float32)
        pool = np.full((3, bf.MT), np.inf, np.float32)
        pool[:, :10] = rng.uniform(-5, 5, (10, 3)).astype(np.float32).T
        d2, idx = bf.nn_bruteforce(jnp.asarray(queries), jnp.asarray(pool), interpret=True)
        assert int(np.asarray(idx).max()) < 10
        assert np.isfinite(np.asarray(d2)).all()

    def test_pool_from_map_roundtrip(self):
        cfg = MapConfig(voxel_size=1.0, max_points_per_voxel=4, capacity=1 << 10)
        rng = np.random.default_rng(2)
        pts = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
        m = vm.insert(vm.create(cfg), jnp.asarray(pts), jnp.ones(200, bool), cfg)
        pool = bf.pool_from_map(m, cfg)
        finite = np.isfinite(np.asarray(pool[0]))
        # every stored point appears exactly once
        stored = np.asarray(pool)[:, finite].T
        assert stored.shape[0] == int(jnp.sum(m.npts))
        # query a known point through the kernel: exact hit
        q = np.tile(pts[:1], (bf.QT, 1))
        d2, idx = bf.nn_bruteforce(jnp.asarray(q), pool, interpret=True)
        assert float(np.asarray(d2)[0]) < 1e-9
