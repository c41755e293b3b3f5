"""Lie-group math: round trips, finite-difference Jacobians, known values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_imu_slam_tpu.ops import lie


RNG = np.random.default_rng(42)


def rand_w(scale=1.0, n=None):
    shape = (3,) if n is None else (n, 3)
    return jnp.asarray(RNG.normal(0, scale, shape))


class TestSO3:
    def test_exp_zero(self):
        np.testing.assert_allclose(lie.so3_exp(jnp.zeros(3)), np.eye(3), atol=1e-15)

    def test_exp_log_roundtrip(self):
        for scale in (1e-8, 1e-4, 0.1, 1.0):
            w = rand_w(scale)
            w2 = lie.so3_log(lie.so3_exp(w))
            np.testing.assert_allclose(w2, w, atol=1e-12, rtol=1e-12)

    def test_exp_log_roundtrip_large_angle(self):
        # |w| may exceed pi: log returns the wrapped representative, so
        # compare rotations, not vectors
        w = rand_w(3.0)
        R = lie.so3_exp(w)
        np.testing.assert_allclose(lie.so3_exp(lie.so3_log(R)), R, atol=1e-12)

    def test_exp_known(self):
        # 90 deg about z
        w = jnp.array([0.0, 0.0, np.pi / 2])
        R = lie.so3_exp(w)
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(R, expected, atol=1e-12)

    def test_orthonormal(self):
        R = lie.so3_exp(rand_w(2.0))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(np.asarray(R)) == pytest.approx(1.0, abs=1e-12)

    def test_batched(self):
        w = rand_w(1.0, n=7)
        R = lie.so3_exp(w)
        assert R.shape == (7, 3, 3)
        for i in range(7):
            np.testing.assert_allclose(R[i], lie.so3_exp(w[i]), atol=1e-14)

    def test_hat_vee(self):
        w = rand_w()
        np.testing.assert_allclose(lie.vee(lie.hat(w)), w)
        v = rand_w()
        np.testing.assert_allclose(
            lie.hat(w) @ v, jnp.cross(w, v), atol=1e-14
        )


class TestSE3:
    def test_exp_log_roundtrip(self):
        # rotation magnitude must stay below pi for vector-level comparison
        for scale in (1e-8, 0.1, 1.0):
            xi = jnp.asarray(RNG.normal(0, scale, 6))
            xi2 = lie.se3_log(lie.se3_exp(xi))
            np.testing.assert_allclose(xi2, xi, atol=1e-11, rtol=1e-11)

    def test_exp_log_roundtrip_large(self):
        xi = jnp.asarray(RNG.normal(0, 2.0, 6))
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(lie.se3_exp(lie.se3_log(T)), T, atol=1e-10)

    def test_translation_only(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0, 0, 0])
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-15)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-15)

    def test_inverse(self):
        T = lie.se3_exp(jnp.asarray(RNG.normal(0, 1, 6)))
        np.testing.assert_allclose(
            T @ lie.transform_inverse(T), np.eye(4), atol=1e-12
        )

    def test_transform_points(self):
        T = lie.se3_exp(jnp.asarray(RNG.normal(0, 1, 6)))
        pts = jnp.asarray(RNG.normal(0, 10, (100, 3)))
        expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
        np.testing.assert_allclose(lie.transform_points(T, pts), expected, atol=1e-10)

    def test_delta_pose(self):
        T1 = lie.se3_exp(jnp.asarray(RNG.normal(0, 1, 6)))
        T2 = lie.se3_exp(jnp.asarray(RNG.normal(0, 1, 6)))
        xi = lie.delta_pose(T1, T2)
        np.testing.assert_allclose(T1 @ lie.se3_exp(xi), T2, atol=1e-12)


class TestQuaternion:
    def test_mul_identity(self):
        q = lie.quat_normalize(jnp.asarray(RNG.normal(0, 1, 4)))
        np.testing.assert_allclose(lie.quat_mul(lie.quat_identity(), q), q)

    def test_quat_rot_consistency(self):
        w = rand_w(1.5)
        R_direct = lie.so3_exp(w)
        R_via_quat = lie.quat_to_rot(lie.quat_exp(w))
        np.testing.assert_allclose(R_via_quat, R_direct, atol=1e-12)

    def test_rot_to_quat_roundtrip(self):
        for scale in (1e-6, 0.5, 2.0, 3.1):
            w = rand_w(scale)
            R = lie.so3_exp(w)
            q = lie.rot_to_quat(R)
            np.testing.assert_allclose(lie.quat_to_rot(q), R, atol=1e-9)

    def test_quat_mul_matches_rotation_compose(self):
        qa, qb = lie.quat_exp(rand_w()), lie.quat_exp(rand_w())
        np.testing.assert_allclose(
            lie.quat_to_rot(lie.quat_mul(qa, qb)),
            lie.quat_to_rot(qa) @ lie.quat_to_rot(qb),
            atol=1e-12,
        )

    def test_from_two_vectors(self):
        a, b = rand_w(), rand_w()
        q = lie.quat_from_two_vectors(a, b)
        rotated = lie.quat_to_rot(q) @ (a / jnp.linalg.norm(a))
        np.testing.assert_allclose(
            rotated, np.asarray(b) / np.linalg.norm(b), atol=1e-9
        )

    def test_from_two_vectors_antiparallel(self):
        a = jnp.array([1.0, 0.0, 0.0])
        q = lie.quat_from_two_vectors(a, -a)
        np.testing.assert_allclose(lie.quat_to_rot(q) @ a, -a, atol=1e-9)

    def test_dquat_to_rot_matches_autodiff(self):
        q = lie.quat_normalize(jnp.asarray(RNG.normal(0, 1, 4)))
        analytic = lie.dquat_to_rot(q)
        auto = jax.jacobian(lie.quat_to_rot)(q)  # (3,3,4)
        np.testing.assert_allclose(analytic, jnp.moveaxis(auto, -1, 0), atol=1e-12)


class TestQuatPropagator:
    def test_matches_matrix_exponential(self):
        """A = exp(S(w) * -dt/2) against dense expm (reference ekf.cpp:266-267)."""
        from scipy.linalg import expm

        for dt in (1e-4, 0.005, 0.1):
            w = np.asarray(rand_w(2.0))
            S = np.asarray(lie.quat_xi_matrix(jnp.asarray(w))) * (-dt / 2)
            A_ref = expm(S)
            A = lie.quat_propagator(jnp.asarray(w), dt)
            np.testing.assert_allclose(A, A_ref, atol=1e-12)

    def test_propagates_unit_norm(self):
        w = rand_w(1.0)
        q = lie.quat_exp(rand_w())
        A = lie.quat_propagator(w, 0.01)
        q2 = A @ q
        assert jnp.linalg.norm(q2) == pytest.approx(1.0, abs=1e-12)

    def test_zero_rate_identity(self):
        A = lie.quat_propagator(jnp.zeros(3), 0.01)
        np.testing.assert_allclose(A, np.eye(4), atol=1e-15)


class TestSe3ExpPoly:
    """Polynomial (transcendental-free) exp used by the ICP hot loop."""

    def test_matches_se3_exp_over_domain(self):
        rng = np.random.default_rng(1)
        for _ in range(200):
            xi = rng.normal(size=6)
            w = xi[3:]
            xi[3:] = w / np.linalg.norm(w) * rng.uniform(1e-8, 3.1)
            a = np.asarray(lie.se3_exp(jnp.asarray(xi)))
            b = np.asarray(lie.se3_exp_poly(jnp.asarray(xi)))
            # poly truncation reaches ~5e-10 only at the domain edge
            # (|w| ~ 3); ICP steps are clamped far below
            np.testing.assert_allclose(b, a, atol=1e-9)

    def test_zero_twist(self):
        np.testing.assert_allclose(
            np.asarray(lie.se3_exp_poly(jnp.zeros(6))), np.eye(4), atol=1e-15
        )
