"""Registration: GN alignment recovers known transforms; adaptive threshold
matches the reference recursion (threshold.cpp); deskew matches per-point
closed form (deskew.cpp)."""

import jax.numpy as jnp
import numpy as np

from lidar_imu_slam_tpu.config import MapConfig
from lidar_imu_slam_tpu.ops import deskew, icp, lie, voxel_map

RNG = np.random.default_rng(11)
CFG = MapConfig(voxel_size=1.0, max_points_per_voxel=10, max_range=100.0, capacity=1 << 13)


def _map_from(points):
    m = voxel_map.create(CFG)
    pts = jnp.asarray(points.astype(np.float32))
    return voxel_map.insert(m, pts, jnp.ones(len(points), bool), CFG)


class TestAlignClouds:
    def test_identity_when_aligned(self):
        pts = jnp.asarray(RNG.uniform(-10, 10, (200, 3)))
        T, _ = icp.align_clouds(pts, pts, jnp.ones(200, bool), 1.0)
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-9)

    def test_recovers_small_transform(self):
        src_true = RNG.uniform(-10, 10, (500, 3))
        xi = np.array([0.05, -0.03, 0.02, 0.01, -0.005, 0.02])
        T_true = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        moved = src_true @ T_true[:3, :3].T + T_true[:3, 3]
        # align moved -> src_true: one GN step of point-to-point
        T, _ = icp.align_clouds(
            jnp.asarray(moved), jnp.asarray(src_true), jnp.ones(500, bool), 2.0
        )
        # estimate should move points back: T ~ T_true^-1 (small-angle)
        err = np.asarray(T) @ T_true - np.eye(4)
        assert np.abs(err).max() < 5e-3

    def test_no_correspondences_identity(self):
        pts = jnp.asarray(RNG.uniform(-10, 10, (50, 3)))
        T, _ = icp.align_clouds(pts, pts, jnp.zeros(50, bool), 1.0)
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-12)


class TestIcpRegistration:
    def test_recovers_perturbed_pose(self):
        world = RNG.uniform(-20, 20, (3000, 3))
        m = _map_from(world)
        xi = np.array([0.2, -0.1, 0.05, 0.02, 0.01, -0.03])
        T_true = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        # sensor points: world seen from T_true => p_s = T_true^-1 p_w
        Rt, tt = T_true[:3, :3], T_true[:3, 3]
        sensor = (world - tt) @ Rt
        res = icp.icp_registration(
            m,
            jnp.asarray(sensor.astype(np.float32)),
            jnp.ones(len(sensor), bool),
            jnp.eye(4, dtype=jnp.float64),  # no prior
            max_corresp_dist=1.5,
            kernel_th=0.5,
            map_cfg=CFG,
            max_iterations=50,
            estimation_threshold=1e-6,
        )
        err = np.asarray(res.pose) - T_true
        assert np.abs(err).max() < 2e-3, f"pose error {np.abs(err).max()}"
        assert int(res.iterations) < 50

    def test_empty_map_returns_guess(self):
        m = voxel_map.create(CFG)
        guess = np.asarray(lie.se3_exp(jnp.asarray([1.0, 2, 3, 0.1, 0, 0])))
        res = icp.icp_registration(
            m, jnp.asarray(RNG.uniform(-5, 5, (64, 3)).astype(np.float32)),
            jnp.ones(64, bool), jnp.asarray(guess), 3.0, 1.0, CFG, 10, 1e-4,
        )
        np.testing.assert_allclose(np.asarray(res.pose), guess, atol=1e-12)


class TestAdaptiveThreshold:
    def test_initial_threshold_before_motion(self):
        st = icp.threshold_init()
        st, sigma = icp.compute_threshold(st, jnp.asarray(False), 2.0, 0.1, 100.0)
        assert float(sigma) == 2.0
        assert int(st.num_samples) == 0

    def test_accumulates_model_error(self):
        st = icp.threshold_init()
        dev = lie.se3_exp(jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.0, 0.01]))
        st = icp.update_model_deviation(st, dev)
        st, sigma = icp.compute_threshold(st, jnp.asarray(True), 2.0, 0.1, 100.0)
        # reference: model_error = 2*r*sin(th/2) + |t|; sigma = rms of samples
        # (translation of se3_exp couples with the rotation via V(w))
        expected_err = 2 * 100.0 * np.sin(0.01 / 2) + float(
            jnp.linalg.norm(dev[:3, 3])
        )
        assert int(st.num_samples) == 1
        np.testing.assert_allclose(float(sigma), expected_err, rtol=1e-9)

    def test_small_deviation_not_accumulated(self):
        st = icp.threshold_init()
        dev = lie.se3_exp(jnp.asarray([0.01, 0, 0, 0, 0, 0]))  # below min_motion
        st = icp.update_model_deviation(st, dev)
        st, sigma = icp.compute_threshold(st, jnp.asarray(True), 2.0, 0.1, 100.0)
        assert int(st.num_samples) == 0
        assert float(sigma) == 2.0  # still init threshold


class TestDeskew:
    def test_matches_pointwise_closed_form(self):
        start = lie.se3_exp(jnp.asarray(RNG.normal(0, 0.1, 6)))
        end = lie.se3_exp(jnp.asarray(RNG.normal(0, 0.1, 6)))
        pts = jnp.asarray(RNG.uniform(-10, 10, (100, 3)).astype(np.float32))
        tau = jnp.asarray(np.linspace(0, 1, 100).astype(np.float32))
        out = deskew.constant_velocity_deskew(pts, tau, start, end)
        twist = np.asarray(lie.delta_pose(start, end))
        for i in (0, 37, 99):
            M = np.asarray(lie.se3_exp(jnp.asarray((float(tau[i]) - 0.5) * twist)))
            expected = M[:3, :3] @ np.asarray(pts[i], np.float64) + M[:3, 3]
            np.testing.assert_allclose(np.asarray(out[i]), expected, atol=1e-5)

    def test_midpoint_unmoved(self):
        start = lie.se3_exp(jnp.asarray([1.0, 0, 0, 0, 0, 0.3]))
        end = lie.se3_exp(jnp.asarray([2.0, 0, 0, 0, 0, 0.6]))
        pts = jnp.asarray(RNG.uniform(-5, 5, (4, 3)).astype(np.float32))
        tau = jnp.full((4,), 0.5, jnp.float32)
        out = deskew.constant_velocity_deskew(pts, tau, start, end)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


class TestPartialCorrespondence:
    def test_align_clouds_ignores_absent_targets(self):
        """Round-2 regression: absent correspondences carry +inf targets
        (voxel_map v2 sentinel); zero weight times inf must not poison the
        normal equations (0 * inf = NaN zeroed the whole GN step)."""
        import jax.numpy as jnp
        import numpy as np

        from lidar_imu_slam_tpu.ops import icp as icp_ops, lie

        rng = np.random.default_rng(3)
        src = jnp.asarray(rng.uniform(-5, 5, (256, 3)))
        shift = jnp.asarray([0.2, 0.0, 0.0])
        tgt = src + shift
        # half the lanes have no correspondence: inf target, mask False
        corr = jnp.arange(256) % 2 == 0
        tgt = jnp.where(corr[:, None], tgt, jnp.inf)
        est, _ = icp_ops.align_clouds(src, tgt, corr, 1.0)
        xi = np.asarray(lie.se3_log(est))
        assert np.isfinite(xi).all()
        # must actually move toward the shift, not return identity
        assert abs(xi[0] - 0.2) < 0.05, xi

    def test_nn_from_candidates_absent_returns_finite_point(self):
        import jax.numpy as jnp

        from lidar_imu_slam_tpu.ops import voxel_map as vm

        cand = jnp.full((4, 6), jnp.inf, jnp.float32)  # 2 candidates/query
        cand_valid = jnp.ones((4, 2), bool)
        q = jnp.zeros((4, 3), jnp.float32)
        nn, d2, found = vm.nn_from_candidates(cand, cand_valid, q, jnp.ones(4, bool))
        assert not bool(found.any())
        assert bool(jnp.isfinite(nn).all())


class TestChol6Solve:
    def test_matches_numpy_solve(self):
        rng = np.random.default_rng(2)
        for _ in range(50):
            M = rng.normal(size=(6, 6))
            A = M @ M.T + 6 * np.eye(6)
            b = rng.normal(size=6)
            x = np.asarray(icp.chol6_solve(jnp.asarray(A), jnp.asarray(b)))
            np.testing.assert_allclose(x, np.linalg.solve(A, b), atol=1e-10)
