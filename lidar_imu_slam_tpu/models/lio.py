"""LiDAR-inertial odometry: the reference's *intended* three-stage pipeline,
actually wired.

The reference implements (1) IMU static initialization, (2) IMU forward
propagation + motion compensation, and (3) an error-state EKF with pose
trail — but its shipped main loop never calls them (`kalman_filter_process`
has no caller: reference src/odom_run.cpp:135-152 vs :154-185, and
`EKF::predict` has no caller at all). This module composes them the way the
RAD design describes (LiDAR-inertial initialization -> KISS-ICP matching ->
HybVIO-style EKF odometry), adding the LiDAR pose measurement update the
reference never implemented.

Per-scan step:
  1. while IMU static init is running: ICP-only odometry with
     constant-velocity deskew (the reference's fallback, odom_run.cpp:148-150)
  2. after init: per-sample EKF predict over the scan's IMU packet,
     IMU-trajectory motion compensation of the scan, robust GN-ICP against
     the voxel map seeded by the EKF pose, EKF pose update, ZUPT +
     pose-trail augmentation, map update.

Everything is one jit-compiled functional step over a single state pytree.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops import imu as imu_ops
from ..ops import lie, voxel_map
from ..ops.preprocess import Scan
from . import ekf as ekf_mod
from . import kiss_icp


class LioState(NamedTuple):
    odo: kiss_icp.KissState  # map + pose history + adaptive threshold
    ekf: ekf_mod.EkfState
    imu_init: imu_ops.ImuInitState
    last_imu: jnp.ndarray  # (7,) f64: [t, gyro(3), acc(3)] of previous packet tail
    scan_count: jnp.ndarray  # () i32


class LioOutput(NamedTuple):
    pose: jnp.ndarray  # (4,4) f64 world-from-lidar at scan end
    ekf_pose: jnp.ndarray  # (4,4) f64 world-from-imu
    velocity: jnp.ndarray  # (3,) f64
    keypoints: jnp.ndarray  # (S,3) f32 ICP source (world frame @ guess)
    keypoints_mask: jnp.ndarray
    deskewed: jnp.ndarray  # (M,3) f32 map-insert downsample
    deskewed_mask: jnp.ndarray
    icp_iterations: jnp.ndarray
    num_correspondences: jnp.ndarray
    residual_rms: jnp.ndarray
    sigma: jnp.ndarray
    map_voxels: jnp.ndarray  # () i32
    icp_converged: jnp.ndarray  # () bool
    window_drops: jnp.ndarray  # () i32 downsample-window invalidations
    imu_initialized: jnp.ndarray  # () bool
    used_imu: jnp.ndarray  # () bool — IMU deskew active this scan


def init_state(cfg: PipelineConfig) -> LioState:
    return LioState(
        odo=kiss_icp.init_state(cfg),
        ekf=ekf_mod.init(cfg.ekf),
        imu_init=imu_ops.init_state(),
        last_imu=jnp.zeros((7,), jnp.float64),
        scan_count=jnp.int32(0),
    )


def _with_prev_sample(packet: ekf_mod.ImuPacket, last_imu) -> ekf_mod.ImuPacket:
    """Prepend the previous packet's tail sample (reference ekf.cpp:295)."""
    has_prev = last_imu[0] > 0
    return ekf_mod.ImuPacket(
        time=jnp.concatenate([last_imu[0][None], packet.time]),
        gyro=jnp.concatenate([last_imu[1:4][None], packet.gyro]),
        acc=jnp.concatenate([last_imu[4:7][None], packet.acc]),
        mask=jnp.concatenate([has_prev[None], packet.mask]),
    )


def step(
    state: LioState, scan: Scan, packet: ekf_mod.ImuPacket, cfg: PipelineConfig
):
    """One LIO step. Returns (state', LioOutput).

    With the fused-Pallas backend (unbatched), registration runs through
    the same fast trunk as the lidar-only step (`kiss_icp._fast_trunk`:
    pose kernels + float-float ICP carrier): the classic f64
    `registration_dispatch` while-loop measured 4.8 ms of a 10.7 ms LIO
    scan on a v5e (round-5 trace) — the EKF guess feeds the trunk as one
    f64->float-float split, and only the EKF algebra itself stays f64.
    """
    fast = cfg.icp.gn_backend == "pallas" and cfg.icp.batch_unroll_outer == 0
    full = _with_prev_sample(packet, state.last_imu)

    # --- IMU static initialization phase --------------------------------
    acc_remapped = imu_ops.remap_axes(full.acc, cfg.imu.coordinate)
    imu_init_next = imu_ops.accumulate(
        state.imu_init, full.gyro, acc_remapped, full.mask, cfg.imu
    )
    just_done = imu_init_next.done & ~state.imu_init.done
    ekf_state = state.ekf  # seeding happens after registration (see below)
    use_imu = state.imu_init.done  # initialized before this scan

    # --- branch A: IMU-driven deskew + EKF ------------------------------
    def imu_branch(ekf_state):
        p_il = ekf_state.m[ekf_mod.PIL:ekf_mod.PIL + 3]
        R_il = lie.quat_to_rot(ekf_state.m[ekf_mod.RIL:ekf_mod.RIL + 4])
        ekf_state = ekf_mod.predict_dispatch(ekf_state, full, p_il, R_il, cfg.ekf)
        # extrapolate the nominal state to SCAN END (zero-order hold on the
        # last sample — the reference's frame-end extrapolation,
        # ekf.cpp:393-410, applied to the filter state): the last IMU
        # sample lands up to one IMU period BEFORE scan end, but the ICP
        # guess and the lidar pose measurement are both at scan end.
        # Without this the update injects the uncovered ~10 ms of motion
        # as a forward position residual every scan and the filter
        # explains it by inflating velocity (measured: |v| climbing
        # ~1 m/s per scan above truth on the 8 m/s bench).
        nv = jnp.sum(full.mask, dtype=jnp.int32)
        li = jnp.maximum(nv - 1, 0)
        ekf_state = ekf_mod.predict(
            ekf_state, scan.t_end, full.gyro[li], full.acc[li],
            ekf_state.m[ekf_mod.GRAV_I:ekf_mod.GRAV_I + 3],
            p_il, R_il, cfg.ekf,
        )
        mean_acc_norm = jnp.linalg.norm(state.imu_init.mean_acc)
        ekf_state, deskewed, _ = ekf_mod.motion_compensation_with_imu(
            ekf_state, full, scan.xyz, scan.rel_t, scan.mask,
            mean_acc_norm, scan.t_begin, cfg.ekf,
        )
        T_il = lie.make_transform(
            lie.quat_to_rot(ekf_state.m[ekf_mod.RIL:ekf_mod.RIL + 4]),
            ekf_state.m[ekf_mod.PIL:ekf_mod.PIL + 3],
        )
        guess = lie.compose(ekf_mod.pose_matrix(ekf_state), T_il)
        return ekf_state, deskewed, guess

    # pre-ICP bookkeeping row (fast path): CV guess + adaptive sigma +
    # deskew twist in one kernel dispatch
    row = kiss_icp.pose_pre_row(state.odo, cfg) if fast else None

    # --- branch B: constant-velocity fallback ---------------------------
    def cv_branch(ekf_state):
        from ..ops import deskew as deskew_ops

        if fast:
            # kernel-gated twist: identity when deskew off or < 3 poses
            deskewed = deskew_ops.deskew_from_scalars(
                scan.xyz, scan.tau, row[19:32]
            )
            guess = lie.make_transform(
                row[0:9].reshape(3, 3).astype(jnp.float64),
                row[9:12].astype(jnp.float64) + row[12:15].astype(jnp.float64),
            )
            return ekf_state, deskewed, guess
        if cfg.icp.deskew:
            deskewed = jax.lax.cond(
                state.odo.num_poses > 2,
                lambda: deskew_ops.constant_velocity_deskew_fast(
                    scan.xyz, scan.tau, state.odo.pose_prev, state.odo.pose
                ),
                lambda: scan.xyz,
            )
        else:
            deskewed = scan.xyz
        last_pose = jnp.where(
            state.odo.num_poses == 0, jnp.eye(4, dtype=jnp.float64), state.odo.pose
        )
        guess = lie.compose(last_pose, kiss_icp.get_prediction_model(state.odo))
        return ekf_state, deskewed, guess

    ekf_state, deskewed_xyz, init_guess = jax.lax.cond(
        use_imu, imu_branch, cv_branch, ekf_state
    )

    # --- registration: shared trunk with the lidar-only step -------------
    #     (fused grouped downsample -> adaptive-threshold ICP -> divergence
    #     gate -> map insert/evict), seeded by the EKF pose when the IMU is
    #     initialized
    if fast:
        # ONE f64 -> float-float split of the guess (EKF pose or the
        # recombined CV guess) feeds the fast trunk
        gv = init_guess.reshape(16)
        gh = gv.astype(jnp.float32)
        gl = (gv - gh.astype(jnp.float64)).astype(jnp.float32)
        rot_idx = jnp.asarray([0, 1, 2, 4, 5, 6, 8, 9, 10])
        t_idx = jnp.asarray([3, 7, 11])
        fcore = kiss_icp._fast_trunk(
            state.odo.map, deskewed_xyz, scan.mask, scan.tau,
            gh[rot_idx], gh[t_idx], gl[t_idx], row[15], cfg,
        )
        core = kiss_icp.CoreOutput(
            new_map=fcore.new_map,
            threshold=kiss_icp.fast_threshold_state(row, fcore.prow),
            pose=kiss_icp.fast_pose_from_prow(fcore.prow),
            keypoints=fcore.source,
            keypoints_mask=fcore.source_mask,
            map_points=fcore.map_points,
            map_points_mask=fcore.map_points_mask,
            icp_iterations=fcore.iterations,
            num_correspondences=fcore.num_correspondences,
            residual_rms=fcore.residual_rms.astype(jnp.float64),
            sigma=fcore.sigma.astype(jnp.float64),
            icp_converged=fcore.converged,
            window_drops=fcore.window_drops,
        )
    else:
        moved = kiss_icp.has_moved(state.odo, cfg.icp.min_motion_th)
        core = kiss_icp.register_core(
            state.odo.map, state.odo.threshold, moved, deskewed_xyz, scan.mask,
            init_guess, cfg,
        )

    # --- EKF measurement update + trail maintenance ----------------------
    def ekf_update(e):
        T_il = lie.make_transform(
            lie.quat_to_rot(e.m[ekf_mod.RIL:ekf_mod.RIL + 4]),
            e.m[ekf_mod.PIL:ekf_mod.PIL + 3],
        )
        T_wi = lie.compose(core.pose, lie.transform_inverse(T_il))
        e = ekf_mod.lidar_pose_update(e, T_wi, cfg.ekf.lidar_pos_noise, cfg.ekf.lidar_ori_noise, cfg.ekf)
        return ekf_mod.update_and_propagate(e, cfg.ekf)

    ekf_state = jax.lax.cond(use_imu, ekf_update, lambda e: e, ekf_state)

    # static init completed THIS scan: seed the EKF nominal state from the
    # running odometry (pose, finite-difference velocity, gravity rotated
    # into the odometry world frame). Seeding at identity/zero-velocity
    # when init completes in motion teleports the next scan's guess
    # (ekf_mod.initialize_from_odometry docstring; PARITY.md #26).
    def seed(e):
        T_il = lie.make_transform(
            lie.quat_to_rot(e.m[ekf_mod.RIL:ekf_mod.RIL + 4]),
            e.m[ekf_mod.PIL:ekf_mod.PIL + 3],
        )
        T_wi = lie.compose(core.pose, lie.transform_inverse(T_il))
        dt = jnp.maximum(scan.t_end - scan.t_begin, 1e-3)
        vel = jnp.where(
            state.odo.num_poses > 0,
            (core.pose[:3, 3] - state.odo.pose[:3, 3]) / dt,
            jnp.zeros(3, jnp.float64),
        )
        # world acceleration from the last three odometry poses (second
        # difference): corrects the gravity seed when the init window
        # covered real vehicle acceleration — a launch ramp puts the mean
        # specific force 10+ m/s^2 off the gravity reaction (PARITY.md #27)
        accel = jnp.where(
            state.odo.num_poses > 1,
            (core.pose[:3, 3] - 2.0 * state.odo.pose[:3, 3]
             + state.odo.pose_prev[:3, 3]) / (dt * dt),
            jnp.zeros(3, jnp.float64),
        )
        return ekf_mod.initialize_from_odometry(
            e, imu_init_next.mean_acc, T_wi, vel, cfg.ekf, accel_world=accel
        )

    ekf_state = jax.lax.cond(just_done, seed, lambda e: e, ekf_state)

    # --- map + pose bookkeeping ------------------------------------------
    odo = kiss_icp.KissState(
        map=core.new_map,
        pose=core.pose,
        pose_prev=jnp.where(state.odo.num_poses == 0, core.pose, state.odo.pose),
        first_pose=jnp.where(
            state.odo.num_poses == 0, core.pose, state.odo.first_pose
        ),
        num_poses=state.odo.num_poses + 1,
        threshold=core.threshold,
    )
    new_state = state._replace(odo=odo, scan_count=state.scan_count + 1)

    # carry the packet's last valid sample for the next scan
    n_valid = jnp.sum(full.mask, dtype=jnp.int32)
    last_idx = jnp.maximum(n_valid - 1, 0)
    last_imu = jnp.concatenate(
        [full.time[last_idx][None], full.gyro[last_idx], full.acc[last_idx]]
    )
    last_imu = jnp.where(n_valid > 0, last_imu, state.last_imu)

    new_state = new_state._replace(
        ekf=ekf_state, imu_init=imu_init_next, last_imu=last_imu
    )
    out = LioOutput(
        pose=core.pose,
        ekf_pose=ekf_mod.pose_matrix(ekf_state),
        velocity=ekf_mod.velocity(ekf_state),
        keypoints=core.keypoints,
        keypoints_mask=core.keypoints_mask,
        deskewed=core.map_points,
        deskewed_mask=core.map_points_mask,
        icp_iterations=core.icp_iterations,
        num_correspondences=core.num_correspondences,
        residual_rms=core.residual_rms,
        sigma=core.sigma,
        map_voxels=voxel_map.num_voxels(core.new_map),
        icp_converged=core.icp_converged,
        window_drops=core.window_drops,
        imu_initialized=imu_init_next.done,
        used_imu=use_imu,
    )
    return new_state, out


@partial(jax.jit, static_argnames=("cfg",))
def step_jit(state: LioState, scan: Scan, packet: ekf_mod.ImuPacket, cfg: PipelineConfig):
    return step(state, scan, packet, cfg)


# donating variant for sequential drivers (callers must not reuse `state`)
step_donated = jax.jit(
    lambda state, scan, packet, cfg: step(state, scan, packet, cfg),
    static_argnames=("cfg",),
    donate_argnums=(0,),
)


def pack_imu_packet(times, gyros, accs, max_samples: int) -> ekf_mod.ImuPacket:
    """Host-side helper: pad per-scan IMU arrays into a packet."""
    import numpy as np

    times = np.asarray(times, np.float64)
    n = times.shape[0]
    assert n <= max_samples, f"{n} IMU samples > capacity {max_samples}"

    def pad(a, width):
        out = np.zeros((max_samples,) + a.shape[1:], a.dtype)
        out[:n] = a
        return out

    mask = np.zeros((max_samples,), bool)
    mask[:n] = True
    return ekf_mod.ImuPacket(
        time=jnp.asarray(pad(times, 1)),
        gyro=jnp.asarray(pad(np.asarray(gyros, np.float64), 3)),
        acc=jnp.asarray(pad(np.asarray(accs, np.float64), 3)),
        mask=jnp.asarray(mask),
    )
