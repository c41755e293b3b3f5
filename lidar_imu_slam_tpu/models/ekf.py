"""Quaternion error-state EKF (HybVIO-derived), 30-dim inner state + pose trail.

Re-implements the reference's largest component (reference src/kalman/ekf.cpp,
include/limu/kalman/ekf.hpp) as pure functions over an `EkfState` pytree:

  state layout (ekf.hpp:14-54):
    [0:3]   position (imu-world)        [16:19] acc scale (BAT)
    [3:6]   velocity                    [19:22] gravity
    [6:10]  orientation quat (w,x,y,z)  [22:25] imu-lidar translation
    [10:13] gyro bias (BGA)             [25:29] imu-lidar quat
    [13:16] acc bias (BAA)              [29]    imu-lidar time shift
    [30:]   trail of `lidar_pose_trail` historical 7-dim poses
  => state_dim = 30 + 20*7 = 170 with the default trail (ekf.cpp:67).

TPU-native differences from the reference (all documented):
  * A = exp(S(w)dt) is closed form (ops/lie.quat_propagator) instead of
    Eigen's unsupported MatrixFunctions expm (ekf.cpp:266-267, 349).
  * dR/dq is the analytic Jacobian of the rotation formula
    (ops/lie.dquat_to_rot) instead of the R(e_i) - R(q) perturbation hack
    (helper.hpp:19-33), which is not a derivative.
  * Pose-trail augmentation shift matrices (ekf.cpp:119-190) become gather
    index maps — no sparse matmuls.
  * Innovation solves use Cholesky (f64 LU does not compile on TPU); the
    reference's LDLT on the same SPD systems is numerically equivalent.
  * Covariance propagation exploits the trail block structure exactly like
    the reference (ekf.cpp:284-289): only the top-left 30x30 and the 30-wide
    cross strips are touched per IMU sample.
  * `initialize_imu_global_orientation` (ekf.cpp:194-211) is called in the
    reference with xa = 0 (imu/frame.cpp:115-116), making FromTwoVectors
    degenerate; here orientation init aligns measured mean specific force
    with world up — the intended behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GRAVITY, EkfConfig
from ..ops import lie
from ..ops.precise import exp_

# state layout offsets (reference ekf.hpp:32-54)
POS, VEL, ORI, BGA, BAA, BAT, GRAV_I, PIL, RIL, SFT = (
    0, 3, 6, 10, 13, 16, 19, 22, 25, 29,
)
INNER = 30
POSE_DIM = 7
# process noise layout (reference ekf.hpp:56-60)
Q_ACC, Q_GYRO, Q_BGA, Q_BAA, Q_DIM = 0, 3, 6, 9, 12


class EkfState(NamedTuple):
    m: jnp.ndarray  # (D,) f64 mean
    P: jnp.ndarray  # (D, D) f64 covariance
    time: jnp.ndarray  # () f64 — seconds since first sample
    first_sample_t: jnp.ndarray  # () f64
    prev_sample_t: jnp.ndarray  # () f64
    first_sample: jnp.ndarray  # () bool
    zupt_time: jnp.ndarray  # () f64 last ZUPT (time-origin relative)
    was_stationary: jnp.ndarray  # () bool
    augment_count: jnp.ndarray  # () i32
    last_lidar_end_time: jnp.ndarray  # () f64
    orientation_initialized: jnp.ndarray  # () bool


def _process_covariance(cfg: EkfConfig, noise_scale: float | jnp.ndarray) -> jnp.ndarray:
    """Initial covariance (reference initialize_process_covariance, ekf.cpp:580-617)."""
    d = cfg.state_dim
    diag = jnp.zeros((d,), jnp.float64)
    sq = lambda v: v * v  # noqa: E731
    diag = diag.at[POS:POS + 3].set(sq(cfg.init_pos_noise))
    diag = diag.at[VEL:VEL + 3].set(sq(cfg.init_vel_noise))
    diag = diag.at[ORI:ORI + 4].set(1.0)
    diag = diag.at[BGA:BGA + 3].set(sq(cfg.init_bga_noise))
    diag = diag.at[BAA:BAA + 3].set(sq(cfg.init_baa_noise))
    diag = diag.at[BAT:BAT + 3].set(sq(cfg.init_bat_noise))
    # quirk preserved: the reference seeds the gravity block with the
    # lidar-imu time noise (ekf.cpp:595)
    diag = diag.at[GRAV_I:GRAV_I + 3].set(sq(cfg.init_lidar_imu_time_noise))
    diag = diag.at[PIL:PIL + 3].set(sq(cfg.init_pos_noise))
    diag = diag.at[RIL:RIL + 4].set(1.0)
    diag = diag.at[SFT].set(sq(cfg.init_lidar_imu_time_noise))
    trail = jnp.tile(
        jnp.concatenate(
            [
                jnp.full((3,), sq(cfg.init_pos_trail_noise), jnp.float64),
                jnp.full((4,), sq(cfg.init_ori_trail_noise), jnp.float64),
            ]
        ),
        cfg.lidar_pose_trail,
    )
    diag = diag.at[INNER:].set(trail)
    return jnp.diag(diag) * noise_scale


def init(cfg: EkfConfig) -> EkfState:
    d = cfg.state_dim
    m = jnp.zeros((d,), jnp.float64)
    m = m.at[ORI].set(1.0).at[RIL].set(1.0)
    m = m.at[BAT:BAT + 3].set(1.0)
    m = m.at[GRAV_I:GRAV_I + 3].set(jnp.array([0.0, 0.0, -GRAVITY]))
    noise_scale = cfg.noise_scale * cfg.noise_scale  # reference ekf.cpp:66
    P = _process_covariance(cfg, noise_scale)
    # distinct buffers per field (a shared scalar would be the same device
    # buffer donated twice through the donating step variants)
    return EkfState(
        m=m,
        P=P,
        time=jnp.float64(0.0),
        first_sample_t=jnp.float64(0.0),
        prev_sample_t=jnp.float64(-1.0),
        first_sample=jnp.asarray(True),
        zupt_time=jnp.float64(-1.0),
        was_stationary=jnp.asarray(False),
        augment_count=jnp.int32(0),
        last_lidar_end_time=jnp.float64(0.0),
        orientation_initialized=jnp.asarray(False),
    )


def initialize_gravity_alignment(state: EkfState, mean_acc, cfg: EkfConfig) -> EkfState:
    """Gravity-aligned orientation init (intent of reference ekf.cpp:194-211).

    `mean_acc` is the mean body-frame specific force while stationary; the
    body gravity estimate is calc_grav = -mean_acc * g / |mean_acc|
    (imu/frame.cpp:114). Orientation is set so the propagation model
    vel += (R^T T_ab + grav) dt is consistent at rest, and the gravity state
    takes calc_grav's magnitude along world -z.
    """
    calc_grav = -mean_acc / jnp.linalg.norm(mean_acc) * GRAVITY
    # propagation uses R^T a_body + grav: require R^T mean_dir = -ghat_world,
    # i.e. R maps (world up) to body mean-acc direction.
    up = jnp.array([0.0, 0.0, 1.0], jnp.float64)
    q = lie.quat_from_two_vectors(up, mean_acc)  # R(q) up = acc_dir; R^T acc = up
    m = state.m.at[ORI:ORI + 4].set(q)
    m = m.at[GRAV_I:GRAV_I + 3].set(jnp.array([0.0, 0.0, -1.0]) * jnp.linalg.norm(calc_grav))
    noise_scale = cfg.noise_scale * cfg.noise_scale
    P = state.P
    ori_block = jnp.eye(4, dtype=jnp.float64).at[3, 3].set(0.0)
    P = P.at[ORI:ORI + 4, ORI:ORI + 4].set(
        ori_block * (cfg.init_ori_noise**2) * noise_scale
    )
    return state._replace(m=m, P=P, orientation_initialized=jnp.asarray(True))


def initialize_from_odometry(
    state: EkfState, mean_acc, T_wi, vel_world, cfg: EkfConfig,
    accel_world=None, window_time=None,
) -> EkfState:
    """`initialize_gravity_alignment` for an init that completes IN MOTION,
    seeded from the running lidar odometry (no reference counterpart — the
    reference never runs its EKF (odom_run.cpp:135-152 has no caller) and
    its static init assumes rest; PARITY.md #26).

    The EKF world frame is pinned to the ODOMETRY world frame (the frame
    every `lidar_pose_update` measurement arrives in): orientation and
    position come from the current world-from-imu transform `T_wi`,
    velocity from the finite-difference of the last two lidar poses, and
    the gravity STATE absorbs the attitude information of `mean_acc`
    (at near-constant velocity the mean specific force is the gravity
    reaction): 0 = R(q)^T a_b + g  =>  g_world = -R(q)^T mean_dir * |g|.
    Without this, an init that completes mid-flight resets the nominal
    state to identity/zero-velocity while the vehicle is far from the
    origin — the next scan's guess teleports and registration diverges
    (measured: 305 ICP iterations and 10.7 m error on the 8 m/s bench
    trajectory; 4-6 iterations with the seed).

    AT-REST inits (|vel_world| <= 0.5 m/s) fall back to EXACTLY the
    `initialize_gravity_alignment` behavior: accelerometer-aligned
    orientation, exact-vertical gravity, untouched pos/vel and their
    near-frozen priors. At rest (a) the rest-window mean specific force
    IS the gravity reaction — the best-conditioned attitude source; (b)
    the odometry second-difference acceleration is pure ICP noise
    amplified by 1/dt^2 (~2 m/s^2 from mm-level pose noise); and (c) the
    loose in-motion priors let modeling errors (e.g. a sub-latch IMU
    clock skew, tests/test_adversarial.py) leak into velocity/gravity
    and drift the filter — the round-4 version seeded every init from
    odometry and regressed exactly that test.
    """
    # "moving" = the velocity/gravity seeds are real signal: below the
    # threshold v_fd is mostly ICP pose noise / dt (~0.06 m/s at mm-level
    # noise) and the rest-window gravity alignment is the better-
    # conditioned choice — its tight priors keep modeling errors (IMU
    # clock skew) from leaking into velocity/gravity
    # (tests/test_adversarial.py regression, round 4). The threshold must
    # sit just ABOVE the noise floor, not at "fast": a 1.2 m/s init that
    # fell into the rest branch zeroed a real velocity against the
    # near-frozen velocity prior and the filter needed ~10 scans to
    # absorb it (round-5 drive: 63 ICP iterations and 1.6 m of error on
    # the first post-seed scan).
    moving = jnp.linalg.norm(vel_world) > 0.25
    R_wb = T_wi[:3, :3]  # world-from-body
    mean_dir = mean_acc / jnp.linalg.norm(mean_acc)
    # at rest: accelerometer-aligned orientation (R(q) up = acc_dir) and
    # exact-vertical gravity — initialize_gravity_alignment's math
    up = jnp.array([0.0, 0.0, 1.0], jnp.float64)
    q_align = lie.quat_from_two_vectors(up, mean_acc)
    q = jnp.where(moving, lie.rot_to_quat(R_wb.T), q_align)
    g_world = jnp.where(
        moving,
        -(R_wb @ mean_dir) * GRAVITY,
        jnp.array([0.0, 0.0, -1.0], jnp.float64) * GRAVITY,
    )
    if accel_world is not None:
        # the init window may cover real vehicle acceleration (a launch
        # ramp): the specific-force model f_b = R_bw (a_w - g_w) gives
        # g_w = a_w - R_wb f_b. `accel_world` is the odometry's (noisy,
        # ~sqrt(6)*sigma_icp/dt^2) world-acceleration estimate; the
        # corrected direction is projected to the known |g| and falls back
        # to the rest-assumption seed when the correction degenerates
        # (e.g. free-fall-like |g_est| << g). The remaining error is
        # estimated ONLINE through the d(vel)/d(grav) coupling + the
        # honest gravity covariance below (PARITY.md #27).
        g_est = accel_world - R_wb @ mean_acc
        g_norm = jnp.linalg.norm(g_est)
        g_world = jnp.where(
            moving & (g_norm > 0.5 * GRAVITY),
            g_est / jnp.maximum(g_norm, 1e-9) * GRAVITY,
            g_world,
        )
    m = state.m
    m = m.at[ORI:ORI + 4].set(q)
    # position ALWAYS pins to the odometry frame: every lidar pose
    # measurement after the seed arrives in that frame, and "slow" does
    # not mean "at the origin" — a sub-threshold init away from the
    # origin with an identity position teleports the next guess exactly
    # like the fast case (round-5 drive regression).
    m = m.at[POS:POS + 3].set(T_wi[:3, 3])
    m = m.at[VEL:VEL + 3].set(
        jnp.where(moving, vel_world, m[VEL:VEL + 3])
    )
    m = m.at[GRAV_I:GRAV_I + 3].set(g_world)
    noise_scale = cfg.noise_scale * cfg.noise_scale
    P = state.P
    ori_block = jnp.eye(4, dtype=jnp.float64).at[3, 3].set(0.0)
    # seed-trust regime: with >= 1 s of settled odometry behind the seed
    # (a long init window), the seed quantities are measured well (vel to
    # ~0.1 m/s, attitude to ~the odometry's rotation noise, gravity to
    # the window-mean accel residual ~0.1-0.5 m/s^2) and the priors say
    # so — an over-loose prior lets the first post-seed updates swing
    # velocity by m/s and drag yaw off the map frame, after which the
    # near-zero-process-noise attitude block is too confident to ever
    # pull it back (measured: a frozen 0.2 deg yaw offset costing ICP
    # 3-4 extra iterations every scan). A SHORT window (init completed
    # seconds after launch, mid-ramp) leaves genuinely uncertain seeds:
    # keep the loose priors so online estimation can do its job.
    trusted = (
        moving if window_time is None else moving & (window_time >= 1.0)
    )
    ori_var = jnp.where(
        trusted, 0.02**2,
        jnp.where(moving, 0.2**2, cfg.init_ori_noise**2),
    )
    P = P.at[ORI:ORI + 4, ORI:ORI + 4].set(
        ori_block * ori_var * noise_scale
    )
    vidx = VEL + jnp.arange(3)
    P = P.at[vidx, vidx].set(
        jnp.where(
            moving, jnp.where(trusted, 0.3**2, 1.0), P[vidx, vidx]
        ) * jnp.where(moving, noise_scale, 1.0)
    )
    # gravity is NOT well-determined by an in-motion init (the mean
    # specific force conflates gravity with vehicle acceleration): replace
    # the tiny time-noise quirk variance (_process_covariance) with an
    # honest prior so the d(vel)/d(grav)-coupled filter can estimate it
    # online. (3 m/s^2)^2 covers a hard launch ramp; the trusted-window
    # seed (window-mean accel correction, models/lio.py) narrows it to
    # (1 m/s^2)^2. At-rest inits KEEP the near-frozen prior.
    gidx = GRAV_I + jnp.arange(3)
    P = P.at[gidx, gidx].set(
        jnp.where(
            moving, jnp.where(trusted, 1.0, 9.0) * noise_scale,
            P[gidx, gidx],
        )
    )
    return state._replace(m=m, P=P, orientation_initialized=jnp.asarray(True))


def _ou_q(cfg: EkfConfig, dt, noise_scale) -> jnp.ndarray:
    """Process noise with Ornstein-Uhlenbeck bias scaling (reference ekf.cpp:112-116, 244-263)."""
    q = jnp.zeros((Q_DIM,), jnp.float64)
    q = q.at[Q_ACC:Q_ACC + 3].set(cfg.acc_process_noise**2)
    q = q.at[Q_GYRO:Q_GYRO + 3].set(cfg.gyro_process_noise**2)

    def ou(qc, theta):
        scale = jnp.where(
            theta > 0.0, (1.0 - exp_(-2.0 * dt * theta)) / (2.0 * theta), 1.0
        )
        return qc * scale

    q = q.at[Q_BGA:Q_BGA + 3].set(
        jnp.where(
            cfg.gyro_process_noise > 0.0,
            ou(cfg.gyro_process_noise**2, cfg.gyro_process_noise_rev),
            0.0,
        )
    )
    q = q.at[Q_BAA:Q_BAA + 3].set(
        jnp.where(
            cfg.acc_process_noise > 0.0,
            ou(cfg.acc_process_noise**2, cfg.acc_process_noise_rev),
            0.0,
        )
    )
    return jnp.diag(q) * noise_scale


def _propagate_mean(m, A, R, rot_li, trans_li, dt, calc_grav, xa, cfg: EkfConfig):
    """Mean propagation (reference propagate_state, ekf.cpp:486-519)."""
    T_ab = m[BAT:BAT + 3] * xa - m[BAA:BAA + 3]
    prev_quat = m[ORI:ORI + 4]

    m = m.at[POS:POS + 3].add(m[VEL:VEL + 3] * dt)
    m = m.at[VEL:VEL + 3].add((R.T @ T_ab + m[GRAV_I:GRAV_I + 3]) * dt)
    m = m.at[ORI:ORI + 4].set(A @ prev_quat)
    m = m.at[BAA:BAA + 3].multiply(
        jnp.where(cfg.acc_process_noise_rev > 0.0, exp_(-dt * cfg.acc_process_noise_rev), 1.0)
    )
    m = m.at[BGA:BGA + 3].multiply(
        jnp.where(cfg.gyro_process_noise > 0.0, exp_(-dt * cfg.gyro_process_noise), 1.0)
    )
    m = m.at[GRAV_I:GRAV_I + 3].set(calc_grav)
    m = m.at[PIL:PIL + 3].set(trans_li)
    m = m.at[RIL:RIL + 4].set(lie.rot_to_quat(rot_li))
    return m, T_ab, prev_quat


def _state_jacobians(T_ab, prev_quat, A, R, dR, xa, dt):
    """Fx (30x30) and Fw (30x12) (reference initialize_state_jacobians, ekf.cpp:521-578)."""
    Fx = jnp.zeros((INNER, INNER), jnp.float64)
    Fw = jnp.zeros((INNER, Q_DIM), jnp.float64)
    eye3 = jnp.eye(3, dtype=jnp.float64)

    for blk in (POS, VEL, BGA, BAA, BAT, GRAV_I, PIL):
        Fx = Fx.at[blk:blk + 3, blk:blk + 3].set(eye3)
    Fx = Fx.at[RIL:RIL + 4, RIL:RIL + 4].set(jnp.eye(4, dtype=jnp.float64))
    Fx = Fx.at[SFT, SFT].set(1.0)
    Fx = Fx.at[POS:POS + 3, VEL:VEL + 3].set(eye3 * dt)
    # d(vel)/d(grav) = dt*I: the mean propagation integrates the gravity
    # STATE into velocity (_propagate_mean), so the error-state Jacobian
    # must couple them — the reference's Fx omits this ("use calculated
    # value", ekf.cpp:536-537) despite its own propagate_state using grav
    # (ekf.cpp:499), which freezes gravity forever: a filter seeded with an
    # imperfect gravity (any in-motion init) then integrates a constant
    # acceleration error that pose updates can never explain, and velocity
    # diverges ~|Δg| per second (measured: 48° gravity seed error on an
    # accelerating start → velocity error growing 0.5 m/s per scan). The
    # reference never runs its EKF, so the omission was invisible there.
    # Documented deviation (PARITY.md #27).
    Fx = Fx.at[VEL:VEL + 3, GRAV_I:GRAV_I + 3].set(eye3 * dt)

    # d(vel)/d(quat): columns dR_i^T T_ab dt, then right-multiplied by A
    dv_dq = jnp.einsum("qji,j->iq", dR, T_ab) * dt  # (3, 4)
    dv_dq = dv_dq @ A
    Fx = Fx.at[VEL:VEL + 3, ORI:ORI + 4].set(dv_dq)
    Fx = Fx.at[ORI:ORI + 4, ORI:ORI + 4].set(A)

    Fw = Fw.at[VEL:VEL + 3, Q_ACC:Q_ACC + 3].set(R.T * dt)

    # quaternion wrt gyro noise: A @ dS_i @ prev_quat with the structured
    # dt/2 matrices (ekf.cpp:554-560)
    h = dt / 2.0
    dS = jnp.array(
        [
            [[0, h, 0, 0], [-h, 0, 0, 0], [0, 0, 0, h], [0, 0, -h, 0]],
            [[0, 0, h, 0], [0, 0, 0, -h], [-h, 0, 0, 0], [0, h, 0, 0]],
            [[0, 0, 0, h], [0, 0, h, 0], [0, -h, 0, 0], [-h, 0, 0, 0]],
        ],
        jnp.float64,
    )
    dq_dw = jnp.einsum("ab,gbc,c->ag", A, dS, prev_quat)  # (4, 3)
    Fw = Fw.at[ORI:ORI + 4, Q_GYRO:Q_GYRO + 3].set(dq_dw)
    Fw = Fw.at[BGA:BGA + 3, Q_BGA:Q_BGA + 3].set(eye3)
    Fw = Fw.at[BAA:BAA + 3, Q_BAA:Q_BAA + 3].set(eye3)

    dv_dw = dv_dq @ dq_dw  # (3, 3)
    Fw = Fw.at[VEL:VEL + 3, Q_GYRO:Q_GYRO + 3].set(dv_dw)
    Fx = Fx.at[VEL:VEL + 3, BGA:BGA + 3].set(-dv_dw)
    Fx = Fx.at[ORI:ORI + 4, BGA:BGA + 3].set(-dq_dw)
    Fx = Fx.at[VEL:VEL + 3, BAA:BAA + 3].set(-R.T * dt)
    Fx = Fx.at[VEL:VEL + 3, BAT:BAT + 3].set(R.T @ jnp.diag(xa) * dt)
    return Fx, Fw


def _block_cov_propagate(P, Fx, Fw_Q_FwT):
    """P update exploiting trail sparsity (reference ekf.cpp:284-289).

    matmul_nowhile: f64 dot_generals lower to bf16 while-loop emulation on
    TPU; this runs once per IMU sample inside the predict scan."""
    mm = lie.matmul_nowhile
    FxT = Fx.T
    P = P.at[:INNER, :INNER].set(mm(mm(Fx, P[:INNER, :INNER]), FxT) + Fw_Q_FwT)
    P = P.at[INNER:, :INNER].set(mm(P[INNER:, :INNER], FxT))
    P = P.at[:INNER, INNER:].set(mm(Fx, P[:INNER, INNER:]))
    return P


def predict(
    state: EkfState,
    t,
    xg,
    xa,
    calc_grav,
    trans_lidar_imu,
    rot_lidar_imu,
    cfg: EkfConfig,
) -> EkfState:
    """Forward propagation (reference EKF::predict, ekf.cpp:214-290)."""
    noise_scale = cfg.noise_scale * cfg.noise_scale
    dt = jnp.where(state.first_sample, 0.0, t - state.prev_sample_t)
    new_time = jnp.where(state.first_sample, state.time, t - state.first_sample_t)
    first_sample_t = jnp.where(state.first_sample, t, state.first_sample_t)

    def do_predict(m, P):
        Q = _ou_q(cfg, dt, noise_scale)
        w = xg - m[BGA:BGA + 3]
        A = lie.quat_propagator(w, dt)
        q_next = A @ m[ORI:ORI + 4]
        R = lie.quat_to_rot(q_next)
        dR = lie.dquat_to_rot(q_next)
        m2, T_ab, prev_quat = _propagate_mean(
            m, A, R, rot_lidar_imu, trans_lidar_imu, dt, calc_grav, xa, cfg
        )
        Fx, Fw = _state_jacobians(T_ab, prev_quat, A, R, dR, xa, dt)
        mm = lie.matmul_nowhile  # f64 dot_general lowers to a while loop
        P2 = _block_cov_propagate(P, Fx, mm(mm(Fw, Q), Fw.T))
        return m2, P2

    skip = dt <= 0.0  # reference ekf.cpp:235-240
    m, P = jax.lax.cond(skip, lambda m, P: (m, P), do_predict, state.m, state.P)
    return state._replace(
        m=m,
        P=P,
        time=new_time,
        first_sample_t=first_sample_t,
        prev_sample_t=t,
        first_sample=jnp.asarray(False),
    )


def predict_mean(
    state: EkfState,
    t,
    xg,
    xa,
    calc_grav,
    trans_lidar_imu,
    rot_lidar_imu,
    cfg: EkfConfig,
) -> EkfState:
    """Mean-only forward extrapolation: `predict` without the covariance
    propagation. This is the reference's frame-end extrapolation semantics
    (ekf.cpp:393-410 extrapolates the nominal trail, never the filter
    covariance); used for the <= one-IMU-period scan-end hold in
    models/lio.py, where the full Fx/Fw build + three 30-dim emulated
    matmuls cost ~0.4 ms/scan for a covariance change of O(Q * 10 ms)."""
    dt = jnp.where(state.first_sample, 0.0, t - state.prev_sample_t)
    new_time = jnp.where(state.first_sample, state.time, t - state.first_sample_t)
    first_sample_t = jnp.where(state.first_sample, t, state.first_sample_t)

    def do_predict(m):
        w = xg - m[BGA:BGA + 3]
        A = lie.quat_propagator(w, dt)
        q_next = A @ m[ORI:ORI + 4]
        R = lie.quat_to_rot(q_next)
        m2, _, _ = _propagate_mean(
            m, A, R, rot_lidar_imu, trans_lidar_imu, dt, calc_grav, xa, cfg
        )
        return m2

    m = jax.lax.cond(dt <= 0.0, lambda m: m, do_predict, state.m)
    return state._replace(
        m=m,
        time=new_time,
        first_sample_t=first_sample_t,
        prev_sample_t=t,
        first_sample=jnp.asarray(False),
    )


def normalize_quaternions(state: EkfState, cfg: EkfConfig, only_current: bool = False) -> EkfState:
    """Reference ekf.cpp:619-634."""
    m = state.m
    m = m.at[ORI:ORI + 4].set(lie.quat_normalize(m[ORI:ORI + 4]))
    m = m.at[RIL:RIL + 4].set(lie.quat_normalize(m[RIL:RIL + 4]))
    if not only_current:
        trail = m[INNER:].reshape(cfg.lidar_pose_trail, POSE_DIM)
        quats = trail[:, 3:7]
        norms = jnp.linalg.norm(quats, axis=-1, keepdims=True)
        quats = jnp.where(norms > 1e-12, quats / jnp.where(norms > 1e-12, norms, 1.0), quats)
        trail = trail.at[:, 3:7].set(quats)
        m = m.at[INNER:].set(trail.reshape(-1))
    return state._replace(m=m)


def maintain_positive_semi_definite(state: EkfState) -> EkfState:
    """Symmetry projection (reference ekf.cpp:758-764)."""
    return state._replace(P=0.5 * (state.P + state.P.T))


# ---------------------------------------------------------------------------
# Generic Kalman update (reference anonymous update, ekf.cpp:36-60)
# ---------------------------------------------------------------------------


def kalman_update(m, P, y, H, Rn):
    """m, P <- Kalman update with measurement y = H m[:l] + noise.

    H: (n, l) with l <= D (truncated representation like the reference's).
    Cholesky innovation solve; P via the reference's P -= K H P form,
    then quaternion renormalization is the caller's job.
    """
    l = H.shape[1]
    mm = lie.matmul_nowhile
    HP = mm(H, P[:l, :])  # (n, D)
    S = Rn + mm(HP[:, :l], H.T)
    K = lie.chol_solve_unrolled(S, HP).T  # (D, n)
    v = y - mm(H, m[:l, None])[:, 0]
    m2 = m + mm(K, v[:, None])[:, 0]
    P2 = P - mm(K, HP)
    return m2, P2


def _joseph_update(P, H_full, Rn, K):
    """Joseph form (reference update_common_joseph_form, ekf.cpp:20-34).

    H_full: (n, D) dense measurement matrix.
    """
    d = P.shape[0]
    mm = lie.matmul_nowhile
    IKH = jnp.eye(d, dtype=P.dtype) - mm(K, H_full)
    return mm(mm(IKH, P), IKH.T) + mm(mm(K, Rn), K.T)


def zero_vel_update(state: EkfState, cfg: EkfConfig) -> EkfState:
    """ZUPT, rate-limited to 4 Hz (reference ekf.cpp:657-678)."""
    noise_scale = cfg.noise_scale * cfg.noise_scale
    gate = (state.time - state.zupt_time) >= cfg.zupt_min_interval

    def do(m, P):
        H = jnp.zeros((3, VEL + 3), jnp.float64).at[:, VEL:VEL + 3].set(jnp.eye(3))
        Rn = jnp.eye(3, dtype=jnp.float64) * cfg.visual_zupt_r * noise_scale
        y = jnp.zeros((3,), jnp.float64)
        return kalman_update(m, P, y, H, Rn)

    m, P = jax.lax.cond(gate, do, lambda m, P: (m, P), state.m, state.P)
    state = state._replace(
        m=m,
        P=P,
        zupt_time=jnp.where(gate, state.time, state.zupt_time),
        was_stationary=state.was_stationary | gate,
    )
    state = normalize_quaternions(state, cfg, only_current=True)
    return state


# ---------------------------------------------------------------------------
# Pose-trail augmentation (reference ekf.cpp:119-190, 700-756)
# ---------------------------------------------------------------------------


def _augment_perm(cfg: EkfConfig) -> jnp.ndarray:
    """Index map for the trail shift dropping the last pose
    (reference visAugA[lidar_pose_count-1], ekf.cpp:119-139):
    inner state unchanged; trail slots shift down by one; slot 0 zeroed
    (source index -1 -> filled with 0)."""
    import numpy as np

    d = cfg.state_dim
    perm = np.arange(d)
    for i in range(INNER, d):
        src = i - POSE_DIM
        perm[i] = src if src >= INNER else -1
    perm[INNER:INNER + POSE_DIM] = -1
    return jnp.asarray(perm, jnp.int32)


def _unaugment_perm(cfg: EkfConfig) -> jnp.ndarray:
    """Reverse shift dropping the first trail pose (reference visUnaugmentA,
    ekf.cpp:142-159): new[i] = old[i + 7] for trail, last slot zeroed."""
    import numpy as np

    d = cfg.state_dim
    perm = np.arange(d)
    for i in range(INNER, d):
        src = i + POSE_DIM
        perm[i] = src if src < d else -1
    return jnp.asarray(perm, jnp.int32)


def _apply_perm(m, P, perm):
    """m' = A m, P' = A P A^T for a 0/1 selection matrix given as index map."""
    safe = jnp.maximum(perm, 0)
    keep = (perm >= 0).astype(m.dtype)
    m2 = m[safe] * keep
    P2 = (P[safe][:, safe]) * keep[:, None] * keep[None, :]
    return m2, P2


def update_visual_pose_aug(state: EkfState, cfg: EkfConfig) -> EkfState:
    """Augment the trail with the current pose (reference ekf.cpp:700-734):
    shift poses (dropping the oldest), add trail noise on slot 0, then a
    tight Kalman update pinning slot 0 to the current pos/ori."""
    noise_scale = cfg.noise_scale * cfg.noise_scale
    d = cfg.state_dim
    m, P = _apply_perm(state.m, state.P, _augment_perm(cfg))

    q_diag = jnp.zeros((d,), jnp.float64)
    q_diag = q_diag.at[INNER:INNER + 3].set(cfg.init_pos_trail_noise**2)
    q_diag = q_diag.at[INNER + 3:INNER + POSE_DIM].set(cfg.init_ori_trail_noise**2)
    P = P + jnp.diag(q_diag * noise_scale)

    # H: (7, D) matching new pose slot to the main state (visAugH, ekf.cpp:161-177)
    H = jnp.zeros((POSE_DIM, d), jnp.float64)
    H = H.at[jnp.arange(3), POS + jnp.arange(3)].set(1.0)
    H = H.at[jnp.arange(3), INNER + jnp.arange(3)].set(-1.0)
    H = H.at[3 + jnp.arange(4), ORI + jnp.arange(4)].set(1.0)
    H = H.at[3 + jnp.arange(4), INNER + 3 + jnp.arange(4)].set(-1.0)
    Rn = jnp.eye(POSE_DIM, dtype=jnp.float64) * 1e-9 * noise_scale

    # matmul_nowhile + unrolled 7x7 Cholesky: f64 dot_general/linalg lower
    # to while-loop emulations on TPU (~0.45 ms/scan measured for the
    # cholesky+cho_solve pair here)
    mm = lie.matmul_nowhile
    HP = mm(H, P)
    S = Rn + mm(HP, H.T)
    K = lie.chol_solve_unrolled(S, HP).T
    m = m + mm(K, -mm(H, m[:, None]))[:, 0]
    P = _joseph_update(P, H, Rn, K)

    state = state._replace(
        m=m, P=P, augment_count=jnp.minimum(state.augment_count + 1, cfg.lidar_pose_trail)
    )
    state = maintain_positive_semi_definite(state)
    return normalize_quaternions(state, cfg)


def update_undo_augmentation(state: EkfState, cfg: EkfConfig) -> EkfState:
    """Drop the newest trail pose (reference ekf.cpp:736-756)."""
    m, P = _apply_perm(state.m, state.P, _unaugment_perm(cfg))
    state = state._replace(
        m=m, P=P, augment_count=jnp.maximum(state.augment_count - 1, 0)
    )
    state = maintain_positive_semi_definite(state)
    return normalize_quaternions(state, cfg)


def update_and_propagate(state: EkfState, cfg: EkfConfig) -> EkfState:
    """ZUPT when stationary, then trail augmentation (reference ekf.cpp:680-698)."""
    speed = jnp.linalg.norm(state.m[VEL:VEL + 3])
    stationary = jnp.abs(speed) < cfg.zupt_speed_threshold

    def when_stationary(s):
        s = zero_vel_update(s, cfg)
        return update_undo_augmentation(s, cfg)

    state = jax.lax.cond(stationary, when_stationary, lambda s: s, state)
    return update_visual_pose_aug(state, cfg)


# ---------------------------------------------------------------------------
# IMU motion compensation (reference motion_compensation_with_imu,
# ekf.cpp:292-469)
# ---------------------------------------------------------------------------


class ImuPacket(NamedTuple):
    """Padded per-scan IMU sub-buffer. Element 0 must be the previous
    packet's last sample (the reference prepends mc_tracker->last_imu,
    ekf.cpp:295)."""

    time: jnp.ndarray  # (M,) f64 absolute seconds
    gyro: jnp.ndarray  # (M, 3) f64
    acc: jnp.ndarray  # (M, 3) f64
    mask: jnp.ndarray  # (M,) bool


def motion_compensation_with_imu(
    state: EkfState,
    packet: ImuPacket,
    points,  # (N, 3) f32 sensor frame, time-sorted
    rel_t,  # (N,) f64 seconds since scan begin
    pts_mask,  # (N,) bool
    mean_acc_norm,  # () f64 — |mean acc| for unit-gravity scaling (ekf.cpp:357)
    pcl_beg_time,  # () f64
    cfg: EkfConfig,
):
    """IMU-trajectory undistortion to the scan-end frame.

    Builds the per-interval IMU pose trail with a `lax.scan` (replacing the
    reference's sequential pair loop, ekf.cpp:315-391), then back-propagates
    every point in parallel: P' = R_end^T (R_i P + T_ei) (ekf.cpp:420-456).
    The reference also propagates a covariance copy in this loop that is
    never read back (ekf.cpp:313, 366-370 write `curr_cov`, a local) — that
    dead work is not replicated.

    Returns (state', deskewed (N,3) f32, trail diagnostics dict).
    """
    m = state.m
    bga = m[BGA:BGA + 3]
    bat = m[BAT:BAT + 3]
    baa = m[BAA:BAA + 3]
    grav = m[GRAV_I:GRAV_I + 3]
    t_il = m[PIL:PIL + 3]

    n_pts = rel_t.shape[0]
    # f32 reduce (see the interval-search comment below): ~6 ns rounding
    # on a <=0.1 s scan period vs an emulated f64-pair reduce over 131k
    last_rel = jnp.max(
        jnp.where(pts_mask, rel_t.astype(jnp.float32), jnp.float32(0.0))
    ).astype(jnp.float64)
    pcl_end_time = pcl_beg_time + last_rel
    imu_t = packet.time
    valid_pair = packet.mask[:-1] & packet.mask[1:]
    imu_end_time = jnp.max(jnp.where(packet.mask, imu_t, -jnp.inf))

    # filter state quaternion is world->body; the trail runs body->world
    q0 = lie.quat_conj(m[ORI:ORI + 4])
    vel0 = m[VEL:VEL + 3]
    pos0 = m[POS:POS + 3]

    def pair_step(carry, inp):
        quat, vel, pos = carry
        head_t, tail_t, g_mid, a_mid, padded_ok = inp
        ok = padded_ok & (tail_t >= state.last_lidar_end_time)  # ekf.cpp:322-323
        dt = jnp.where(
            head_t < state.last_lidar_end_time,
            tail_t - state.last_lidar_end_time,
            tail_t - head_t,
        )
        dt = jnp.where(ok, dt, 0.0)

        # "global update rotation": the sign-flipped propagator turns the
        # trail quaternion into the body->world convention (ekf.cpp:372-375),
        # so the velocity update uses rot directly. (The reference keeps the
        # filter-state rot.transpose() here, ekf.cpp:380, inconsistent with
        # its own flip — documented deviation, matches FAST-LIO's math.)
        A = lie.quat_propagator(g_mid - bga, -dt)
        quat_n = lie.quat_normalize(A @ quat)
        rot = lie.quat_to_rot(quat_n)
        xa = a_mid / mean_acc_norm * GRAVITY  # unit-gravity scaling
        T_ab = bat * xa - baa
        vel_n = vel + (rot @ T_ab + grav) * dt
        pos_n = pos + vel_n * dt

        quat = jnp.where(ok, quat_n, quat)
        vel = jnp.where(ok, vel_n, vel)
        pos = jnp.where(ok, pos_n, pos)
        # offsets must stay nondecreasing for the vectorized interval search:
        # padding -> +inf (never selected); early-skipped or pre-scan pairs
        # clamp to 0 (they carry the unchanged initial state, equivalent to
        # the reference emitting no entry for them)
        offset = jnp.where(
            padded_ok,
            jnp.where(ok, jnp.maximum(tail_t - pcl_beg_time, 0.0), 0.0),
            jnp.inf,
        )
        rec = {
            "offset": offset,
            "acc": xa,
            "gyr": g_mid,
            "vel": vel,
            "pos": pos,
            "rot": lie.quat_to_rot(quat),
        }
        return (quat, vel, pos), rec

    g_mid = 0.5 * (packet.gyro[:-1] + packet.gyro[1:])
    a_mid = 0.5 * (packet.acc[:-1] + packet.acc[1:])
    if cfg.batched_deskew:
        # Batched trail: the sequential pair walk above is a 16-trip XLA
        # while loop of scalar f64 quaternion algebra (~1.9 ms/scan on a
        # v5e). Identical gating via dt = 0 (quat_propagator(·, 0) is
        # exactly I, so masked pairs contribute exact identity transitions
        # to the orientation chain and zero increments to the prefix
        # sums); only the per-step quaternion renormalization moves to the
        # end of the chain (orthogonal propagators — ~1e-15 reordering).
        head_t, tail_t = imu_t[:-1], imu_t[1:]
        ok_b = valid_pair & (tail_t >= state.last_lidar_end_time)
        dt_b = jnp.where(
            head_t < state.last_lidar_end_time,
            tail_t - state.last_lidar_end_time,
            tail_t - head_t,
        )
        dt_b = jnp.where(ok_b, dt_b, 0.0)
        A_b = lie.quat_propagator(g_mid - bga[None, :], -dt_b)  # (Mp,4,4)
        Mk = jax.lax.associative_scan(
            lambda a, b: lie.matmul_nowhile(b, a), A_b
        )
        q_raw = jnp.sum(Mk * q0[None, None, :], axis=-1)  # (Mp, 4)
        quat_b = q_raw / jnp.linalg.norm(q_raw, axis=-1, keepdims=True)
        rot_b = jax.vmap(lie.quat_to_rot)(quat_b)  # (Mp, 3, 3)
        xa_b = a_mid / mean_acc_norm * GRAVITY
        T_ab_b = bat[None, :] * xa_b - baa[None, :]
        dv_b = (jnp.sum(rot_b * T_ab_b[:, None, :], axis=-1) + grav[None, :])
        vel_b = vel0[None, :] + jnp.cumsum(dv_b * dt_b[:, None], axis=0)
        pos_b = pos0[None, :] + jnp.cumsum(vel_b * dt_b[:, None], axis=0)
        offset_b = jnp.where(
            valid_pair,
            jnp.where(ok_b, jnp.maximum(tail_t - pcl_beg_time, 0.0), 0.0),
            jnp.inf,
        )
        quat_f, vel_f, pos_f = quat_b[-1], vel_b[-1], pos_b[-1]
        trail = {
            "offset": offset_b,
            "acc": xa_b,
            "gyr": g_mid,
            "vel": vel_b,
            "pos": pos_b,
            "rot": rot_b,
        }
    else:
        (quat_f, vel_f, pos_f), trail = jax.lax.scan(
            pair_step,
            (q0, vel0, pos0),
            (imu_t[:-1], imu_t[1:], g_mid, a_mid, valid_pair),
        )

    # head entry 0: the state at scan begin (populate_imu_pose(0.0), ekf.cpp:307)
    head0 = {
        "offset": jnp.float64(0.0),
        "acc": jnp.zeros(3, jnp.float64),
        "gyr": jnp.zeros(3, jnp.float64),
        "vel": vel0,
        "pos": pos0,
        "rot": lie.quat_to_rot(q0),
    }
    trail = jax.tree.map(
        lambda h, t: jnp.concatenate([h[None], t], axis=0), head0, trail
    )

    # extrapolate to frame end (ekf.cpp:393-410); the reference takes
    # |pcl_end - imu_end| — replicated
    n_pairs = jnp.maximum(jnp.sum(valid_pair, dtype=jnp.int32), 1)
    last_g = g_mid[n_pairs - 1]
    last_a = a_mid[n_pairs - 1] / mean_acc_norm * GRAVITY
    dt_end = jnp.abs(pcl_end_time - imu_end_time)
    A_end = lie.quat_propagator(last_g - bga, -dt_end)
    rot_end = lie.quat_to_rot(lie.quat_normalize(A_end @ quat_f))
    T_ab_end = bat * last_a - baa
    vel_end = vel_f + (rot_end @ T_ab_end + grav) * dt_end
    pos_end = pos_f + vel_end * dt_end
    pos_lidar_end = rot_end @ t_il + pos_end

    # parallel per-point undistortion: interval = last trail entry with
    # offset < t_pt (the reference's strict `>` walk, ekf.cpp:431).
    # TPU restructure: the old form gathered (N, 3, 3) f64 rows and ran
    # batched f64 matmuls + per-point so3_exp — f64 dot_generals lower to
    # bf16 while-loop emulation and a minor dim of 3 lane-pads to 128. The
    # trail rows are packed into ONE f32 table instead; a single row gather
    # plus elementwise Rodrigues does the whole undistortion in f32 (the
    # compensation displacement is sub-metre; the output is f32 anyway).
    # interval search + in-interval offset in f32: rel_t spans one scan
    # period (<= ~0.1 s), where f32 resolution is ~6 ns — three orders
    # below IMU timestamp jitter — while f64 per-point compares/subtracts
    # on 131k points run as emulated f32-pair chains (measured ~1.3
    # ms/scan of the LIO step on a v5e)
    offsets = trail["offset"].astype(jnp.float32)  # (M,) inf on invalid
    rel32 = rel_t.astype(jnp.float32)
    k = jnp.clip(jnp.searchsorted(offsets, rel32, side="left") - 1, 0, offsets.shape[0] - 1)
    off0 = jnp.where(jnp.isfinite(offsets), offsets, 0.0)
    table = jnp.concatenate(
        [
            trail["rot"].reshape(-1, 9),
            trail["gyr"], trail["pos"], trail["vel"], trail["acc"],
        ],
        axis=1,
    ).astype(jnp.float32)  # (M, 21)
    # per-point trail-row broadcast WITHOUT a (N, 21) row gather: slicing
    # columns back out of a row-major (N, 21) gather re-reads every (8,128)
    # tile of the table per column (measured 1.3 ms/scan at 131k points on
    # a v5e). The trail is tiny (M ~ 17 rows), so a masked sum over the M
    # static rows — one vectorized compare against `k` per row, scalar
    # table entries broadcast — fuses into a single loop fusion that reads
    # `k` once and writes the 22 SoA columns.
    Mn = offsets.shape[0]
    cols = [jnp.zeros_like(rel32) for _ in range(21)]
    offp = jnp.zeros_like(rel32)
    for i in range(Mn):
        mi = (k == i).astype(jnp.float32)
        offp = offp + mi * off0[i]
        for j in range(21):
            cols[j] = cols[j] + mi * table[i, j]
    dtp = rel32 - offp
    (R00, R01, R02, R10, R11, R12, R20, R21, R22,
     gx, gy, gz) = cols[:12]

    wx, wy, wz = gx * dtp, gy * dtp, gz * dtp
    sq = wx * wx + wy * wy + wz * wz  # |w| <= |gyr| * scan_duration << 1
    sinc, cos_t = lie._sincos_poly(sq)
    b = jnp.where(sq < 1e-12, 0.5, (1.0 - cos_t) / jnp.where(sq < 1e-12, 1.0, sq))

    def exp_apply(vx, vy, vz):
        # exp(w) v = v cos + (w x v) sinc + w (w . v) (1-cos)/|w|^2
        dot = wx * vx + wy * vy + wz * vz
        cx_ = wy * vz - wz * vy
        cy_ = wz * vx - wx * vz
        cz_ = wx * vy - wy * vx
        return (
            vx * cos_t + cx_ * sinc + wx * dot * b,
            vy * cos_t + cy_ * sinc + wy * dot * b,
            vz * cos_t + cz_ * sinc + wz * dot * b,
        )

    def head_apply(ax, ay, az):  # R_head v, per-point scalar coefficients
        return (
            R00 * ax + R01 * ay + R02 * az,
            R10 * ax + R11 * ay + R12 * az,
            R20 * ax + R21 * ay + R22 * az,
        )

    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    qx, qy, qz = exp_apply(px, py, pz)
    rx_, ry_, rz_ = head_apply(qx, qy, qz)  # R_i p
    til = t_il.astype(jnp.float32)
    ex, ey, ez = exp_apply(til[0], til[1], til[2])
    ix_, iy_, iz_ = head_apply(ex, ey, ez)  # R_i t_il

    ple = pos_lidar_end.astype(jnp.float32)
    h2 = 0.5 * dtp * dtp
    Tx = cols[12] + cols[15] * dtp + cols[18] * h2 + ix_ - ple[0]
    Ty = cols[13] + cols[16] * dtp + cols[19] * h2 + iy_ - ple[1]
    Tz = cols[14] + cols[17] * dtp + cols[20] * h2 + iz_ - ple[2]
    cx2, cy2, cz2 = rx_ + Tx, ry_ + Ty, rz_ + Tz
    re = rot_end.astype(jnp.float32)
    deskewed = jnp.stack(
        [
            re[0, 0] * cx2 + re[1, 0] * cy2 + re[2, 0] * cz2,  # R_end^T p
            re[0, 1] * cx2 + re[1, 1] * cy2 + re[2, 1] * cz2,
            re[0, 2] * cx2 + re[1, 2] * cy2 + re[2, 2] * cz2,
        ],
        axis=-1,
    ).astype(points.dtype)

    state = state._replace(last_lidar_end_time=pcl_end_time)
    diag = {
        "vel_end": vel_end,
        "pos_end": pos_end,
        "rot_end": rot_end,
        "n_pairs": n_pairs,
    }
    return state, jnp.where(pts_mask[:, None], deskewed, points), diag


def predict_over_packet(
    state: EkfState, packet: ImuPacket, trans_lidar_imu, rot_lidar_imu, cfg: EkfConfig
) -> EkfState:
    """Run the EKF predict step for every sample in the packet (the
    reference's intended per-IMU-sample forward propagation; `predict` at
    ekf.cpp:214-290 has no caller in the shipped main loop — this wires it)."""
    calc_grav = state.m[GRAV_I:GRAV_I + 3]

    def step(s, inp):
        t, g, a, ok = inp
        s2 = predict(s, t, g, a, calc_grav, trans_lidar_imu, rot_lidar_imu, cfg)
        s2 = normalize_quaternions(s2, cfg, only_current=True)
        s = jax.tree.map(lambda new, old: jnp.where(ok, new, old), s2, s)
        return s, None

    state, _ = jax.lax.scan(
        step, state, (packet.time, packet.gyro, packet.acc, packet.mask)
    )
    return state


def predict_over_packet_batched(
    state: EkfState, packet: ImuPacket, trans_lidar_imu, rot_lidar_imu,
    cfg: EkfConfig,
) -> EkfState:
    """Batched reformulation of `predict_over_packet`: the sequential
    per-sample scan (30 scalar block writes + five 30/170-dim matmuls per
    sample, each a serialized scan step on TPU) collapses into

      * closed-form bias decay (the per-sample exp(-dt*rate) factors are a
        cumulative product -> one exp of a cumsum),
      * one batched quaternion-propagator build + a log-depth
        `associative_scan` of 4x4 products for the orientation chain,
      * prefix sums for velocity/position,
      * one vmapped Fx/Fw assembly over all samples,
      * a log-depth associative scan composing (Phi, Sigma) transition
        pairs [(Phi2,S2) o (Phi1,S1) = (Phi2 Phi1, Phi2 S1 Phi2^T + S2)],
      * ONE application to the covariance — the (trail, 30) cross-strip
        products run once per PACKET instead of once per sample.

    Numerics match `predict_over_packet` to roundoff (the quaternion
    propagator is orthogonal, so deferring per-sample renormalization to
    the batched chain only reorders ~1e-16 rounding); masked samples and
    duplicate timestamps contribute exact identity transitions
    (tests/test_ekf_batched.py pins agreement). dt<0 within a packet
    (impossible post stream-sync) clamps to 0 here, while the sequential
    path re-anchors prev_sample_t — documented micro-deviation.
    """
    m, P = state.m, state.P
    t, ok = packet.time, packet.mask
    calc_grav = m[GRAV_I:GRAV_I + 3]
    noise_scale = cfg.noise_scale * cfg.noise_scale
    mm = lie.matmul_nowhile

    # --- per-sample dt (masked samples and duplicates -> dt = 0) ----------
    NEG = jnp.float64(-1e30)
    tv = jnp.where(ok, t, NEG)
    prev_valid = jax.lax.cummax(
        jnp.concatenate([jnp.full((1,), NEG), tv[:-1]])
    )
    start_prev = jnp.where(state.first_sample, NEG, state.prev_sample_t)
    prev_t = jnp.maximum(prev_valid, start_prev)
    dt = jnp.where(ok & (prev_t > 0.5 * NEG), t - prev_t, 0.0)
    dt = jnp.maximum(dt, 0.0)
    cumdt = jnp.cumsum(dt)
    cd_prev = cumdt - dt

    # --- closed-form bias decay (pre-sample values) ------------------------
    g_rate = jnp.where(cfg.gyro_process_noise > 0.0, cfg.gyro_process_noise, 0.0)
    a_rate = jnp.where(
        cfg.acc_process_noise_rev > 0.0, cfg.acc_process_noise_rev, 0.0
    )
    bga_pre = m[BGA:BGA + 3][None] * jnp.exp(-g_rate * cd_prev)[:, None]
    baa_pre = m[BAA:BAA + 3][None] * jnp.exp(-a_rate * cd_prev)[:, None]

    # --- orientation chain --------------------------------------------------
    w = packet.gyro - bga_pre  # (N, 3)
    A = lie.quat_propagator(w, dt)  # (N, 4, 4), orthogonal
    Mk = jax.lax.associative_scan(lambda a, b: mm(b, a), A)  # A_k ... A_1
    q0 = m[ORI:ORI + 4]
    q_raw = jnp.sum(Mk * q0[None, None, :], axis=-1)  # (N, 4)
    q = q_raw / jnp.linalg.norm(q_raw, axis=-1, keepdims=True)
    prev_q = jnp.concatenate([q0[None], q[:-1]])
    R = jax.vmap(lie.quat_to_rot)(q)  # (N, 3, 3)
    dR = jax.vmap(lie.dquat_to_rot)(q)

    # --- velocity / position prefix sums ------------------------------------
    T_ab = m[BAT:BAT + 3][None] * packet.acc - baa_pre  # (N, 3)
    RtT = jnp.sum(R * T_ab[:, :, None], axis=1)  # R^T T_ab, elementwise
    dv = (RtT + calc_grav[None]) * dt[:, None]
    vel = m[VEL:VEL + 3][None] + jnp.cumsum(dv, axis=0)
    vel_prev = jnp.concatenate([m[VEL:VEL + 3][None], vel[:-1]])
    pos = m[POS:POS + 3][None] + jnp.cumsum(vel_prev * dt[:, None], axis=0)

    # --- batched Jacobians + one-shot covariance composition ----------------
    Fx, Fw = jax.vmap(_state_jacobians)(T_ab, prev_q, A, R, dR, packet.acc, dt)
    Q = jax.vmap(lambda d: _ou_q(cfg, d, noise_scale))(dt)
    FwQFw = mm(mm(Fw, Q), jnp.swapaxes(Fw, -1, -2))
    # dt = 0 must be an exact identity transition: _ou_q's OU scale is 1
    # (not 0) when a reversion rate is configured zero, which would inject
    # noise the sequential path's dt<=0 skip never does
    FwQFw = jnp.where((dt > 0.0)[:, None, None], FwQFw, 0.0)

    def compose(a, b):
        Pa, Sa = a
        Pb, Sb = b
        return mm(Pb, Pa), mm(mm(Pb, Sa), jnp.swapaxes(Pb, -1, -2)) + Sb

    Phi, Sig = jax.lax.associative_scan(compose, (Fx, FwQFw))
    PhiN, SigN = Phi[-1], Sig[-1]

    P = P.at[:INNER, :INNER].set(
        mm(mm(PhiN, P[:INNER, :INNER]), PhiN.T) + SigN
    )
    P = P.at[INNER:, :INNER].set(mm(P[INNER:, :INNER], PhiN.T))
    P = P.at[:INNER, INNER:].set(mm(PhiN, P[:INNER, INNER:]))

    # --- final mean ----------------------------------------------------------
    m = m.at[POS:POS + 3].set(pos[-1])
    m = m.at[VEL:VEL + 3].set(vel[-1])
    m = m.at[ORI:ORI + 4].set(q[-1])
    m = m.at[BGA:BGA + 3].set(m[BGA:BGA + 3] * exp_(-g_rate * cumdt[-1]))
    m = m.at[BAA:BAA + 3].set(m[BAA:BAA + 3] * exp_(-a_rate * cumdt[-1]))
    m = m.at[GRAV_I:GRAV_I + 3].set(calc_grav)
    m = m.at[PIL:PIL + 3].set(trans_lidar_imu)
    m = m.at[RIL:RIL + 4].set(lie.rot_to_quat(rot_lidar_imu))

    # --- bookkeeping ---------------------------------------------------------
    any_valid = jnp.any(ok)
    n_valid = jnp.sum(ok, dtype=jnp.int32)
    last_t = jnp.max(tv)
    first_valid_t = t[jnp.argmax(ok)]
    fst = jnp.where(
        state.first_sample & any_valid, first_valid_t, state.first_sample_t
    )
    keep_old_time = (~any_valid) | (state.first_sample & (n_valid < 2))
    new_time = jnp.where(keep_old_time, state.time, last_t - fst)

    new = state._replace(
        m=m,
        P=P,
        time=new_time,
        first_sample_t=fst,
        prev_sample_t=jnp.where(any_valid, last_t, state.prev_sample_t),
        first_sample=state.first_sample & ~any_valid,
    )
    # all-masked packet: the sequential path leaves the state untouched
    return jax.tree.map(
        lambda a, b: jnp.where(any_valid, a, b), new, state
    )


def predict_dispatch(
    state: EkfState, packet: ImuPacket, trans_lidar_imu, rot_lidar_imu,
    cfg: EkfConfig,
) -> EkfState:
    """Config-selected predict: batched (default, TPU-fast) or the
    sequential per-sample scan (bit-for-bit reference semantics)."""
    fn = (
        predict_over_packet_batched if cfg.batched_predict
        else predict_over_packet
    )
    return fn(state, packet, trans_lidar_imu, rot_lidar_imu, cfg)


def lidar_pose_update(state: EkfState, pose, pos_noise, ori_noise, cfg: EkfConfig) -> EkfState:
    """Absolute pose measurement update from scan registration.

    The reference declares the machinery (generic `update`, pose trail) but
    never feeds a LiDAR pose into the filter — the RAD design's third stage.
    Measurement: y = [t; q] with H selecting POS and ORI, Cholesky innovation
    solve, then quaternion renormalization.
    """
    # state quaternion is world->body; the pose's rotation is body->world
    q_meas = lie.rot_to_quat(pose[:3, :3].T)
    # resolve quaternion double cover against the current estimate
    q_cur = state.m[ORI:ORI + 4]
    q_meas = jnp.where(jnp.dot(q_meas, q_cur) < 0, -q_meas, q_meas)
    y = jnp.concatenate([pose[:3, 3], q_meas])

    H = jnp.zeros((7, ORI + 4), jnp.float64)
    H = H.at[jnp.arange(3), POS + jnp.arange(3)].set(1.0)
    H = H.at[3 + jnp.arange(4), ORI + jnp.arange(4)].set(1.0)
    noise_scale = cfg.noise_scale * cfg.noise_scale
    Rn = jnp.diag(
        jnp.concatenate(
            [
                jnp.full((3,), pos_noise**2, jnp.float64),
                jnp.full((4,), ori_noise**2, jnp.float64),
            ]
        )
    ) * noise_scale
    m, P = kalman_update(state.m, state.P, y, H, Rn)
    state = state._replace(m=m, P=P)
    state = maintain_positive_semi_definite(state)
    return normalize_quaternions(state, cfg, only_current=True)


# ---------------------------------------------------------------------------
# Accessors (reference ekf.cpp:766-795)
# ---------------------------------------------------------------------------


def position(state: EkfState) -> jnp.ndarray:
    return state.m[POS:POS + 3]


def velocity(state: EkfState) -> jnp.ndarray:
    return state.m[VEL:VEL + 3]


def orientation(state: EkfState) -> jnp.ndarray:
    return state.m[ORI:ORI + 4]


def speed(state: EkfState) -> jnp.ndarray:
    return jnp.linalg.norm(state.m[VEL:VEL + 3])


def pose_matrix(state: EkfState) -> jnp.ndarray:
    """Current (4,4) world-from-imu transform.

    The filter quaternion follows the propagation convention q: world->body
    (vel += R(q)^T a_b + g, reference ekf.cpp:497), so the world-from-body
    rotation is the transpose."""
    return lie.make_transform(
        lie.quat_to_rot(orientation(state)).T, position(state)
    )
