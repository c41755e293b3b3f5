"""EKF mean-propagation parity against an independent numpy implementation
of the reference equations (reference propagate_state ekf.cpp:486-519 +
calculate_S :471-484 with scipy expm). Validates that the closed-form JAX
propagation reproduces the reference's math exactly where we claim parity."""

import numpy as np
import jax.numpy as jnp
from scipy.linalg import expm

from lidar_imu_slam_tpu.config import GRAVITY, EkfConfig
from lidar_imu_slam_tpu.models import ekf

CFG = EkfConfig(lidar_pose_trail=4)
RNG = np.random.default_rng(5)


def numpy_reference_predict(m, dt, xg, xa, calc_grav, trans_li, rot_li, cfg):
    """Reference mean propagation, written independently from ekf.cpp:
    S = Xi(xg - bga) * (-dt/2); A = expm(S); pos += vel dt;
    vel += (R(A q)^T (BAT*xa - BAA) + grav) dt; q' = A q; OU bias decay;
    grav/extrinsics overwritten (ekf.cpp:510-517)."""
    m = m.copy()
    w = xg - m[10:13]
    S = np.array([
        [0, -w[0], -w[1], -w[2]],
        [w[0], 0, -w[2], w[1]],
        [w[1], w[2], 0, -w[0]],
        [w[2], -w[1], w[0], 0],
    ]) * (-dt / 2.0)
    A = expm(S)
    q_next = A @ m[6:10]
    qw, qx, qy, qz = q_next
    R = np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
    ])
    T_ab = m[16:19] * xa - m[13:16]
    m[0:3] += m[3:6] * dt
    m[3:6] += (R.T @ T_ab + m[19:22]) * dt
    m[6:10] = q_next
    if cfg.acc_process_noise_rev > 0:
        m[13:16] *= np.exp(-dt * cfg.acc_process_noise_rev)
    if cfg.gyro_process_noise > 0:
        m[10:13] *= np.exp(-dt * cfg.gyro_process_noise)
    m[19:22] = calc_grav
    m[22:25] = trans_li
    return m


class TestMeanPropagationParity:
    def test_matches_numpy_reference(self):
        s = ekf.init(CFG)
        s = ekf.initialize_gravity_alignment(s, jnp.asarray([0.2, -0.1, 9.8]), CFG)
        # random-ish running state
        m0 = np.asarray(s.m).copy()
        m0[0:3] = RNG.normal(0, 5, 3)
        m0[3:6] = RNG.normal(0, 1, 3)
        m0[10:13] = RNG.normal(0, 1e-3, 3)
        m0[13:16] = RNG.normal(0, 1e-2, 3)
        s = s._replace(
            m=jnp.asarray(m0),
            first_sample=jnp.asarray(False),
            prev_sample_t=jnp.float64(10.0),
            first_sample_t=jnp.float64(0.0),
        )
        dt = 0.005
        xg = RNG.normal(0, 0.5, 3)
        xa = np.array([0.3, -0.2, 9.75])
        grav = m0[19:22]
        s2 = ekf.predict(
            s, jnp.float64(10.0 + dt), jnp.asarray(xg), jnp.asarray(xa),
            jnp.asarray(grav), jnp.zeros(3), jnp.eye(3), CFG,
        )
        expected = numpy_reference_predict(
            m0, dt, xg, xa, grav, np.zeros(3), np.eye(3), CFG
        )
        np.testing.assert_allclose(
            np.asarray(s2.m)[:25], expected[:25], rtol=1e-12, atol=1e-12
        )

    def test_multi_step_consistency(self):
        """50 propagation steps stay in lockstep with the numpy reference."""
        s = ekf.init(CFG)
        s = ekf.initialize_gravity_alignment(s, jnp.asarray([0.0, 0.0, 9.81]), CFG)
        m_np = np.asarray(s.m).copy()
        t = 0.0
        dt = 0.005
        grav = m_np[19:22].copy()
        for i in range(50):
            xg = 0.2 * np.array([np.sin(i * 0.1), np.cos(i * 0.1), 0.05])
            xa = np.array([0.1 * np.sin(i * 0.05), 0.0, 9.81])
            t += dt
            s = ekf.predict(
                s, jnp.float64(t), jnp.asarray(xg), jnp.asarray(xa),
                jnp.asarray(grav), jnp.zeros(3), jnp.eye(3), CFG,
            )
            if i == 0:
                # first sample only sets timestamps (dt=0 skip, ekf.cpp:235)
                continue
            m_np = numpy_reference_predict(m_np, dt, xg, xa, grav, np.zeros(3), np.eye(3), CFG)
        np.testing.assert_allclose(np.asarray(s.m)[:22], m_np[:22], rtol=1e-9, atol=1e-11)
