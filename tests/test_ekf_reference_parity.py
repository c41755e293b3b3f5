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


# ---------------------------------------------------------------------------
# Covariance-propagation parity (reference ekf.cpp:214-290, 521-578) and the
# update forms (update ekf.cpp:36-60, Joseph ekf.cpp:20-34), against a numpy
# implementation written independently from the reference equations.
# PARITY.md deviation #6 applies: dR/dq is the true analytic derivative of
# the unit-assumed rotation formula, not the reference's R(e_i)-R(q)
# perturbation.
# ---------------------------------------------------------------------------

INNER = 30
Q_DIM = 12
POS, VEL, ORI, BGA, BAA, BAT, GRAV, PIL, RIL, SFT = 0, 3, 6, 10, 13, 16, 19, 22, 25, 29
Q_ACC, Q_GYRO, Q_BGA, Q_BAA = 0, 3, 6, 9


def np_quat_to_rot(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def np_drot_dq(q):
    """Analytic d(np_quat_to_rot)/dq_i, derived term-by-term."""
    w, x, y, z = q
    dw = np.array([[0, -2 * z, 2 * y], [2 * z, 0, -2 * x], [-2 * y, 2 * x, 0]])
    dx = np.array([[0, 2 * y, 2 * z], [2 * y, -4 * x, -2 * w], [2 * z, 2 * w, -4 * x]])
    dy = np.array([[-4 * y, 2 * x, 2 * w], [2 * x, 0, 2 * z], [-2 * w, 2 * z, -4 * y]])
    dz = np.array([[-4 * z, -2 * w, 2 * x], [2 * w, -4 * z, 2 * y], [2 * x, 2 * y, 0]])
    return [dw, dx, dy, dz]


def np_reference_predict_cov(P, m_prev, xg, xa, dt, cfg):
    """Fx/Fw (ekf.cpp:521-578), OU Q (ekf.cpp:224-263), block P update
    (ekf.cpp:284-289) in plain numpy."""
    noise_scale = cfg.noise_scale**2
    w = xg - m_prev[BGA:BGA + 3]
    S = np.array([
        [0, -w[0], -w[1], -w[2]],
        [w[0], 0, -w[2], w[1]],
        [w[1], w[2], 0, -w[0]],
        [w[2], -w[1], w[0], 0],
    ]) * (-dt / 2.0)
    A = expm(S)
    prev_quat = m_prev[ORI:ORI + 4]
    q_next = A @ prev_quat
    R = np_quat_to_rot(q_next)
    dR = np_drot_dq(q_next)
    T_ab = m_prev[BAT:BAT + 3] * xa - m_prev[BAA:BAA + 3]

    Fx = np.zeros((INNER, INNER))
    Fw = np.zeros((INNER, Q_DIM))
    for blk in (POS, VEL, BGA, BAA, BAT, GRAV, PIL):
        Fx[blk:blk + 3, blk:blk + 3] = np.eye(3)
    Fx[RIL:RIL + 4, RIL:RIL + 4] = np.eye(4)
    Fx[SFT, SFT] = 1.0
    Fx[POS:POS + 3, VEL:VEL + 3] = np.eye(3) * dt
    # d(vel)/d(grav) = dt*I: deviation from the reference's Fx, which
    # freezes gravity despite integrating it into velocity (PARITY.md #27)
    Fx[VEL:VEL + 3, GRAV:GRAV + 3] = np.eye(3) * dt
    dv_dq = np.stack([dR[i].T @ T_ab * dt for i in range(4)], axis=1)  # (3,4)
    Fx[VEL:VEL + 3, ORI:ORI + 4] = dv_dq @ A
    Fx[ORI:ORI + 4, ORI:ORI + 4] = A

    Fw[VEL:VEL + 3, Q_ACC:Q_ACC + 3] = R.T * dt
    h = dt / 2.0
    dS0 = np.array([[0, h, 0, 0], [-h, 0, 0, 0], [0, 0, 0, h], [0, 0, -h, 0]])
    dS1 = np.array([[0, 0, h, 0], [0, 0, 0, -h], [-h, 0, 0, 0], [0, h, 0, 0]])
    dS2 = np.array([[0, 0, 0, h], [0, 0, h, 0], [0, -h, 0, 0], [-h, 0, 0, 0]])
    dq_dw = np.stack([A @ dSi @ prev_quat for dSi in (dS0, dS1, dS2)], axis=1)
    Fw[ORI:ORI + 4, Q_GYRO:Q_GYRO + 3] = dq_dw
    Fw[BGA:BGA + 3, Q_BGA:Q_BGA + 3] = np.eye(3)
    Fw[BAA:BAA + 3, Q_BAA:Q_BAA + 3] = np.eye(3)
    Fw[VEL:VEL + 3, Q_GYRO:Q_GYRO + 3] = Fx[VEL:VEL + 3, ORI:ORI + 4] @ dq_dw
    Fx[VEL:VEL + 3, BGA:BGA + 3] = -Fw[VEL:VEL + 3, Q_GYRO:Q_GYRO + 3]
    Fx[ORI:ORI + 4, BGA:BGA + 3] = -dq_dw
    Fx[VEL:VEL + 3, BAA:BAA + 3] = -R.T * dt
    Fx[VEL:VEL + 3, BAT:BAT + 3] = R.T @ np.diag(xa) * dt

    Q = np.zeros((Q_DIM, Q_DIM))
    Q[Q_ACC:Q_ACC + 3, Q_ACC:Q_ACC + 3] = np.eye(3) * cfg.acc_process_noise**2
    Q[Q_GYRO:Q_GYRO + 3, Q_GYRO:Q_GYRO + 3] = np.eye(3) * cfg.gyro_process_noise**2
    if cfg.gyro_process_noise > 0:
        qc = cfg.gyro_process_noise**2
        th = cfg.gyro_process_noise_rev
        s = (1 - np.exp(-2 * dt * th)) / (2 * th) if th > 0 else 1.0
        Q[Q_BGA:Q_BGA + 3, Q_BGA:Q_BGA + 3] = np.eye(3) * qc * s
    if cfg.acc_process_noise > 0:
        qc = cfg.acc_process_noise**2
        th = cfg.acc_process_noise_rev
        s = (1 - np.exp(-2 * dt * th)) / (2 * th) if th > 0 else 1.0
        Q[Q_BAA:Q_BAA + 3, Q_BAA:Q_BAA + 3] = np.eye(3) * qc * s
    Q *= noise_scale

    P = P.copy()
    P[:INNER, :INNER] = Fx @ P[:INNER, :INNER] @ Fx.T + Fw @ Q @ Fw.T
    P[INNER:, :INNER] = P[INNER:, :INNER] @ Fx.T
    P[:INNER, INNER:] = Fx @ P[:INNER, INNER:]
    return P


def _random_state_and_cov(rng):
    s = ekf.init(CFG)
    s = ekf.initialize_gravity_alignment(s, jnp.asarray([0.1, -0.05, 9.79]), CFG)
    m0 = np.asarray(s.m).copy()
    m0[0:3] = rng.normal(0, 3, 3)
    m0[3:6] = rng.normal(0, 1, 3)
    m0[10:13] = rng.normal(0, 1e-3, 3)
    m0[13:16] = rng.normal(0, 1e-2, 3)
    d = CFG.state_dim
    M = rng.normal(size=(d, d)) * 0.1
    P0 = M @ M.T + np.eye(d)
    s = s._replace(
        m=jnp.asarray(m0), P=jnp.asarray(P0),
        first_sample=jnp.asarray(False),
        prev_sample_t=jnp.float64(10.0), first_sample_t=jnp.float64(0.0),
    )
    return s, m0, P0


class TestCovariancePropagationParity:
    def test_block_propagation_matches_numpy_reference(self):
        rng = np.random.default_rng(7)
        s, m0, P0 = _random_state_and_cov(rng)
        dt = 0.005
        xg = rng.normal(0, 0.4, 3)
        xa = np.array([0.2, -0.1, 9.7])
        grav = m0[19:22]
        s2 = ekf.predict(
            s, jnp.float64(10.0 + dt), jnp.asarray(xg), jnp.asarray(xa),
            jnp.asarray(grav), jnp.zeros(3), jnp.eye(3), CFG,
        )
        expected = np_reference_predict_cov(P0, m0, xg, xa, dt, CFG)
        np.testing.assert_allclose(
            np.asarray(s2.P), expected, rtol=1e-9, atol=1e-9
        )

    def test_fw_gyro_columns_match_finite_difference(self):
        """Fw's quaternion-vs-gyro-noise block must be the true derivative of
        the propagator wrt the angular rate (the structured dS matrices)."""
        rng = np.random.default_rng(8)
        w = rng.normal(0, 0.4, 3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        dt = 0.01

        def q_next(wv):
            S = np.array([
                [0, -wv[0], -wv[1], -wv[2]],
                [wv[0], 0, -wv[2], wv[1]],
                [wv[1], wv[2], 0, -wv[0]],
                [wv[2], -wv[1], wv[0], 0],
            ]) * (-dt / 2.0)
            return expm(S) @ q

        A = expm(np.array([
            [0, -w[0], -w[1], -w[2]],
            [w[0], 0, -w[2], w[1]],
            [w[1], w[2], 0, -w[0]],
            [w[2], -w[1], w[0], 0],
        ]) * (-dt / 2.0))
        h = dt / 2.0
        dS = [
            np.array([[0, h, 0, 0], [-h, 0, 0, 0], [0, 0, 0, h], [0, 0, -h, 0]]),
            np.array([[0, 0, h, 0], [0, 0, 0, -h], [-h, 0, 0, 0], [0, h, 0, 0]]),
            np.array([[0, 0, 0, h], [0, 0, h, 0], [0, -h, 0, 0], [-h, 0, 0, 0]]),
        ]
        eps = 1e-7
        for i in range(3):
            fd = (q_next(w + eps * np.eye(3)[i]) - q_next(w - eps * np.eye(3)[i])) / (2 * eps)
            # the reference's structured form A * dS_i * q: exact up to the
            # second-order commutator term O(dt^2 |w|)
            analytic = A @ dS[i] @ q
            np.testing.assert_allclose(analytic, fd, atol=5e-5)


class TestUpdateFormsParity:
    def test_kalman_update_matches_numpy_reference(self):
        """reference anonymous update (ekf.cpp:36-60): S = R + H P_l H^T,
        K = (S^-1 H P)^T, m += K (y - H m_l), P -= K H P."""
        rng = np.random.default_rng(9)
        d, n, l = CFG.state_dim, 3, 6
        M = rng.normal(size=(d, d)) * 0.1
        P = M @ M.T + np.eye(d)
        m = rng.normal(size=d)
        H = rng.normal(size=(n, l))
        Rn = np.eye(n) * 0.01
        y = rng.normal(size=n)

        m2, P2 = ekf.kalman_update(
            jnp.asarray(m), jnp.asarray(P), jnp.asarray(y), jnp.asarray(H),
            jnp.asarray(Rn),
        )
        HP = H @ P[:l, :]
        S = Rn + HP[:, :l] @ H.T
        K = np.linalg.solve(S, HP).T
        m_exp = m + K @ (y - H @ m[:l])
        P_exp = P - K @ HP
        np.testing.assert_allclose(np.asarray(m2), m_exp, atol=1e-10)
        np.testing.assert_allclose(np.asarray(P2), P_exp, atol=1e-9)

    def test_joseph_form_matches_numpy_reference(self):
        """reference update_common_joseph_form (ekf.cpp:20-34):
        P = (I - K H) P (I - K H)^T + K R K^T."""
        rng = np.random.default_rng(10)
        d, n = CFG.state_dim, 3
        M = rng.normal(size=(d, d)) * 0.1
        P = M @ M.T + np.eye(d)
        H = np.zeros((n, d))
        H[:, :3] = np.eye(3)
        Rn = np.eye(n) * 0.01
        K = rng.normal(size=(d, n)) * 0.1

        P2 = ekf._joseph_update(
            jnp.asarray(P), jnp.asarray(H), jnp.asarray(Rn), jnp.asarray(K)
        )
        IKH = np.eye(d) - K @ H
        P_exp = IKH @ P @ IKH.T + K @ Rn @ K.T
        np.testing.assert_allclose(np.asarray(P2), P_exp, atol=1e-10)
