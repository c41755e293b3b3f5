"""EKF tests: analytic Jacobians vs autodiff, propagation consistency,
ZUPT, pose-trail augmentation bookkeeping, IMU motion compensation on a
synthetic constant-rate trajectory. (The reference ships no EKF tests at
all — SURVEY §4.)"""

import jax
import jax.numpy as jnp
import numpy as np

from lidar_imu_slam_tpu.config import GRAVITY, EkfConfig
from lidar_imu_slam_tpu.models import ekf
from lidar_imu_slam_tpu.ops import imu as imu_ops
from lidar_imu_slam_tpu.ops import lie

CFG = EkfConfig(lidar_pose_trail=4)  # small trail keeps tests fast
RNG = np.random.default_rng(7)


def _stationary_imu(n, jitter=0.0):
    t = np.arange(n) * 0.005
    gyro = RNG.normal(0, jitter, (n, 3))
    acc = np.array([0.0, 0.0, GRAVITY]) + RNG.normal(0, jitter, (n, 3))
    return t, gyro, acc


class TestInit:
    def test_dimensions(self):
        s = ekf.init(CFG)
        assert s.m.shape == (CFG.state_dim,)
        assert s.P.shape == (CFG.state_dim, CFG.state_dim)
        np.testing.assert_allclose(s.m[ekf.ORI:ekf.ORI + 4], [1, 0, 0, 0])
        np.testing.assert_allclose(s.m[ekf.BAT:ekf.BAT + 3], 1.0)

    def test_gravity_alignment_consistency(self):
        # after init, the propagation model must be stationary-consistent:
        # R^T (BAT*acc - BAA) + grav ~ 0 for the mean acc
        s = ekf.init(CFG)
        mean_acc = jnp.asarray([0.3, -0.2, 9.75])
        s = ekf.initialize_gravity_alignment(s, mean_acc, CFG)
        R = lie.quat_to_rot(s.m[ekf.ORI:ekf.ORI + 4])
        resid = R.T @ mean_acc / jnp.linalg.norm(mean_acc) * GRAVITY + s.m[
            ekf.GRAV_I:ekf.GRAV_I + 3
        ]
        np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-9)


class TestJacobians:
    def test_fx_matches_autodiff(self):
        """Analytic Fx vs jax.jacobian of the mean propagation over the
        inner 30 dims (velocity/orientation/bias blocks)."""
        cfg = CFG
        s = ekf.init(cfg)
        s = ekf.initialize_gravity_alignment(s, jnp.asarray([0.1, 0.05, 9.8]), cfg)
        m0 = s.m[:30] + jnp.asarray(RNG.normal(0, 0.01, 30))
        m0 = m0.at[ekf.ORI:ekf.ORI + 4].set(lie.quat_normalize(m0[ekf.ORI:ekf.ORI + 4]))
        xg = jnp.asarray([0.1, -0.2, 0.3])
        xa = jnp.asarray([0.2, 0.1, 9.7])
        dt = 0.005

        def f(m_inner):
            w = xg - m_inner[ekf.BGA:ekf.BGA + 3]
            A = lie.quat_propagator(w, dt)
            q_next = A @ m_inner[ekf.ORI:ekf.ORI + 4]
            R = lie.quat_to_rot(q_next)
            out = m_inner
            T_ab = m_inner[ekf.BAT:ekf.BAT + 3] * xa - m_inner[ekf.BAA:ekf.BAA + 3]
            out = out.at[ekf.POS:ekf.POS + 3].add(m_inner[ekf.VEL:ekf.VEL + 3] * dt)
            # gravity comes from the STATE, as in _propagate_mean — the
            # autodiff Jacobian therefore carries d(vel)/d(grav) = dt*I
            # (PARITY.md #27)
            out = out.at[ekf.VEL:ekf.VEL + 3].add(
                (R.T @ T_ab + m_inner[ekf.GRAV_I:ekf.GRAV_I + 3]) * dt
            )
            out = out.at[ekf.ORI:ekf.ORI + 4].set(q_next)
            return out

        J = jax.jacobian(f)(m0)
        w = xg - m0[ekf.BGA:ekf.BGA + 3]
        A = lie.quat_propagator(w, dt)
        q_next = A @ m0[ekf.ORI:ekf.ORI + 4]
        R = lie.quat_to_rot(q_next)
        dR = lie.dquat_to_rot(q_next)
        T_ab = m0[ekf.BAT:ekf.BAT + 3] * xa - m0[ekf.BAA:ekf.BAA + 3]
        Fx, Fw = ekf._state_jacobians(T_ab, m0[ekf.ORI:ekf.ORI + 4], A, R, dR, xa, dt)

        # exact blocks
        np.testing.assert_allclose(
            Fx[ekf.ORI:ekf.ORI + 4, ekf.ORI:ekf.ORI + 4],
            J[ekf.ORI:ekf.ORI + 4, ekf.ORI:ekf.ORI + 4],
            atol=1e-12,
        )
        np.testing.assert_allclose(
            Fx[ekf.POS:ekf.POS + 3, ekf.VEL:ekf.VEL + 3], np.eye(3) * dt, atol=1e-12
        )
        np.testing.assert_allclose(
            Fx[ekf.VEL:ekf.VEL + 3, ekf.GRAV_I:ekf.GRAV_I + 3],
            J[ekf.VEL:ekf.VEL + 3, ekf.GRAV_I:ekf.GRAV_I + 3],
            atol=1e-12,
        )
        np.testing.assert_allclose(
            Fx[ekf.VEL:ekf.VEL + 3, ekf.BAA:ekf.BAA + 3],
            J[ekf.VEL:ekf.VEL + 3, ekf.BAA:ekf.BAA + 3],
            atol=1e-12,
        )
        np.testing.assert_allclose(
            Fx[ekf.VEL:ekf.VEL + 3, ekf.BAT:ekf.BAT + 3],
            J[ekf.VEL:ekf.VEL + 3, ekf.BAT:ekf.BAT + 3],
            atol=1e-12,
        )
        # velocity wrt quaternion: the reference's approximation evaluates
        # dR at the post-propagation quaternion then right-multiplies by A —
        # agreement to O(|w| dt), tight at IMU rates
        np.testing.assert_allclose(
            Fx[ekf.VEL:ekf.VEL + 3, ekf.ORI:ekf.ORI + 4],
            J[ekf.VEL:ekf.VEL + 3, ekf.ORI:ekf.ORI + 4],
            atol=1e-4,
        )
        # gyro-bias coupling blocks: first-order in dt (A @ dS @ q), error
        # O(dt^2 |w|^2) ~ 2e-6 at this rate
        np.testing.assert_allclose(
            Fx[ekf.ORI:ekf.ORI + 4, ekf.BGA:ekf.BGA + 3],
            J[ekf.ORI:ekf.ORI + 4, ekf.BGA:ekf.BGA + 3],
            atol=1e-5,
        )

    def test_propagation_preserves_symmetry(self):
        s = ekf.init(CFG)
        s = ekf.initialize_gravity_alignment(s, jnp.asarray([0.0, 0.0, 9.81]), CFG)
        t, gyro, acc = _stationary_imu(20)
        for i in range(20):
            s = ekf.predict(
                s, jnp.float64(t[i]), jnp.asarray(gyro[i]), jnp.asarray(acc[i]),
                s.m[ekf.GRAV_I:ekf.GRAV_I + 3],
                jnp.zeros(3), jnp.eye(3), CFG,
            )
        P = np.asarray(s.P)
        np.testing.assert_allclose(P, P.T, atol=1e-9)
        assert np.isfinite(P).all() and np.isfinite(np.asarray(s.m)).all()

    def test_stationary_predict_keeps_pose(self):
        s = ekf.init(CFG)
        s = ekf.initialize_gravity_alignment(s, jnp.asarray([0.0, 0.0, 9.81]), CFG)
        t, gyro, acc = _stationary_imu(100)
        packet = ekf.ImuPacket(
            time=jnp.asarray(t), gyro=jnp.asarray(gyro), acc=jnp.asarray(acc),
            mask=jnp.ones(100, bool),
        )
        s = ekf.predict_over_packet(s, packet, jnp.zeros(3), jnp.eye(3), CFG)
        assert float(jnp.linalg.norm(ekf.position(s))) < 1e-6
        assert float(ekf.speed(s)) < 1e-6


class TestZupt:
    def test_zupt_zeroes_velocity(self):
        s = ekf.init(CFG)
        s = s._replace(
            m=s.m.at[ekf.VEL:ekf.VEL + 3].set(jnp.asarray([1e-4, -5e-5, 2e-5])),
            time=jnp.float64(1.0),
        )
        s2 = ekf.zero_vel_update(s, CFG)
        assert float(ekf.speed(s2)) < float(ekf.speed(s))
        assert bool(s2.was_stationary)

    def test_zupt_rate_limited(self):
        s = ekf.init(CFG)._replace(time=jnp.float64(1.0), zupt_time=jnp.float64(0.9))
        v0 = s.m.at[ekf.VEL:ekf.VEL + 3].set(jnp.asarray([1e-4, 0, 0]))
        s = s._replace(m=v0)
        s2 = ekf.zero_vel_update(s, CFG)  # gate: 0.1 < 0.25 interval
        np.testing.assert_allclose(np.asarray(s2.m), np.asarray(s.m))


class TestAugmentation:
    def test_augment_copies_pose_into_trail(self):
        s = ekf.init(CFG)
        pos = jnp.asarray([1.0, 2.0, 3.0])
        s = s._replace(m=s.m.at[ekf.POS:ekf.POS + 3].set(pos))
        s2 = ekf.update_visual_pose_aug(s, CFG)
        trail0 = s2.m[ekf.INNER:ekf.INNER + 7]
        np.testing.assert_allclose(np.asarray(trail0[:3]), np.asarray(pos), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(trail0[3:7]), np.asarray(s2.m[ekf.ORI:ekf.ORI + 4]), atol=1e-6
        )
        assert int(s2.augment_count) == 1

    def test_augment_shifts_existing_trail(self):
        s = ekf.init(CFG)
        s = s._replace(m=s.m.at[ekf.POS:ekf.POS + 3].set(jnp.asarray([1.0, 0, 0])))
        s = ekf.update_visual_pose_aug(s, CFG)
        s = s._replace(m=s.m.at[ekf.POS:ekf.POS + 3].set(jnp.asarray([2.0, 0, 0])))
        s = ekf.update_visual_pose_aug(s, CFG)
        np.testing.assert_allclose(float(s.m[ekf.INNER]), 2.0, atol=1e-6)
        np.testing.assert_allclose(float(s.m[ekf.INNER + 7]), 1.0, atol=1e-6)

    def test_undo_augmentation_reverses(self):
        s = ekf.init(CFG)
        s = s._replace(m=s.m.at[ekf.POS:ekf.POS + 3].set(jnp.asarray([1.0, 0, 0])))
        s = ekf.update_visual_pose_aug(s, CFG)
        s = s._replace(m=s.m.at[ekf.POS:ekf.POS + 3].set(jnp.asarray([2.0, 0, 0])))
        s = ekf.update_visual_pose_aug(s, CFG)
        s2 = ekf.update_undo_augmentation(s, CFG)
        # newest trail pose dropped; the older one moves back to slot 0
        np.testing.assert_allclose(float(s2.m[ekf.INNER]), 1.0, atol=1e-6)
        assert int(s2.augment_count) == 1


class TestMotionCompensation:
    def test_stationary_scan_unchanged(self):
        s = ekf.init(CFG)
        s = ekf.initialize_gravity_alignment(s, jnp.asarray([0.0, 0.0, 9.81]), CFG)
        t, gyro, acc = _stationary_imu(30)
        packet = ekf.ImuPacket(
            time=jnp.asarray(t + 0.001), gyro=jnp.asarray(gyro),
            acc=jnp.asarray(acc), mask=jnp.ones(30, bool),
        )
        pts = jnp.asarray(RNG.uniform(-5, 5, (128, 3)).astype(np.float32))
        rel_t = jnp.asarray(np.sort(RNG.uniform(0, 0.1, 128)))
        s2, deskewed, _ = ekf.motion_compensation_with_imu(
            s, packet, pts, rel_t, jnp.ones(128, bool),
            jnp.float64(GRAVITY), jnp.float64(0.0), CFG,
        )
        np.testing.assert_allclose(np.asarray(deskewed), np.asarray(pts), atol=1e-3)

    def test_pure_rotation_compensation(self):
        """Points from a sensor spinning at constant rate must deskew onto
        the scan-end frame: generate world points, project at per-point
        times, compensate, compare to scan-end projection."""
        s = ekf.init(CFG)
        s = ekf.initialize_gravity_alignment(s, jnp.asarray([0.0, 0.0, 9.81]), CFG)
        wz = 1.0  # rad/s about z
        n_imu, n_pts, T = 41, 256, 0.1
        t_imu = np.linspace(0, T, n_imu)
        gyro = np.tile([0, 0, wz], (n_imu, 1))
        # stationary translation: specific force = R(t)^T g_up; R about z
        # keeps z fixed -> acc stays (0,0,g)
        acc = np.tile([0, 0, GRAVITY], (n_imu, 1))
        packet = ekf.ImuPacket(
            time=jnp.asarray(t_imu + 1e-4), gyro=jnp.asarray(gyro),
            acc=jnp.asarray(acc), mask=jnp.ones(n_imu, bool),
        )
        world = RNG.uniform(-5, 5, (n_pts, 3))
        rel_t = np.sort(RNG.uniform(0, T, n_pts))

        def Rz(a):
            c, s_ = np.cos(a), np.sin(a)
            return np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1]])

        # sensor frame at time t rotated by wz*t; observed point = R(t)^T world
        pts = np.stack([Rz(wz * t).T @ w for t, w in zip(rel_t, world)])
        expected = np.stack([Rz(wz * T).T @ w for w in world])

        s2, deskewed, _ = ekf.motion_compensation_with_imu(
            s, packet, jnp.asarray(pts, jnp.float32), jnp.asarray(rel_t),
            jnp.ones(n_pts, bool), jnp.float64(GRAVITY), jnp.float64(0.0), CFG,
        )
        err = np.abs(np.asarray(deskewed) - expected).max()
        assert err < 0.02, f"max deskew error {err}"


class TestImuInit:
    def test_running_stats(self):
        st = imu_ops.init_state()
        cfg_imu = __import__("lidar_imu_slam_tpu.config", fromlist=["ImuConfig"]).ImuConfig(
            max_init_count=50
        )
        samples_a = RNG.normal([0, 0, 9.8], 0.01, (60, 3))
        samples_g = RNG.normal(0.001, 0.001, (60, 3))
        st = imu_ops.accumulate(
            st, jnp.asarray(samples_g), jnp.asarray(samples_a),
            jnp.ones(60, bool), cfg_imu,
        )
        assert bool(st.done)
        np.testing.assert_allclose(
            np.asarray(st.mean_acc), samples_a.mean(0), atol=1e-9
        )
        grav = imu_ops.gravity_estimate(st)
        np.testing.assert_allclose(
            np.asarray(grav) / np.linalg.norm(np.asarray(grav)),
            -samples_a.mean(0) / np.linalg.norm(samples_a.mean(0)),
            atol=1e-12,
        )
