"""End-to-end golden tests: the jitted odometry recovers a known synthetic
trajectory (the evaluation layer the reference never had — SURVEY §4), plus
LIO with IMU initialization, checkpoint/resume, and multi-stream vmap on the
8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.models import ekf as ekf_mod
from lidar_imu_slam_tpu.models import kiss_icp, lio
from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan
from lidar_imu_slam_tpu.utils import trajectory

CFG = cfgmod.PipelineConfig(
    lidar=cfgmod.LidarConfig(max_range=30.0, min_range=0.5, max_points=4096),
    map=cfgmod.MapConfig(voxel_size=0.5, max_range=30.0, capacity=1 << 14, max_probes=16),
    icp=cfgmod.IcpConfig(max_map_points=4096, max_source_points=1024, max_iterations=50),
    ekf=cfgmod.EkfConfig(lidar_pose_trail=4),
    imu=cfgmod.ImuConfig(max_init_count=30, max_samples_per_scan=32),
)

WORLD = synthetic.make_world(seed=0, n_points=120_000, extent=(30.0, 10.0, 5.0))
GT = synthetic.make_trajectory(n_poses=12, speed=1.0, yaw_rate=0.02, dt=0.1)


def _scan(i, pose, n=3500):
    pts = synthetic.render_scan(WORLD, pose, n, 0.5, 30.0, noise=0.005, seed=i)
    raw = pack_raw_scan(pts, stamp=i * 0.1, max_points=CFG.lidar.max_points)
    return preprocess_scan(raw, CFG.lidar)


class TestKissIcpGolden:
    def test_recovers_trajectory(self):
        state = kiss_icp.init_state(CFG)
        poses = []
        for i, pose in enumerate(GT):
            state, out = kiss_icp.register_frame_jit(state, _scan(i, pose), CFG)
            poses.append(np.asarray(out.pose))
        gt_rel = np.linalg.inv(GT[0])[None] @ GT
        ate = trajectory.ate_rmse(np.stack(poses), gt_rel, align=False)
        # sparse random resampling of the synthetic world gives ~4 mm/scan
        # point-to-point drift; 12 scans of budget
        assert ate < 0.06, f"ATE {ate}"
        assert int(state.num_poses) == len(GT)

    def test_checkpoint_resume_exact(self, tmp_path):
        from lidar_imu_slam_tpu.host import runner as runner_mod

        state = kiss_icp.init_state(CFG)
        for i in range(3):
            state, out = kiss_icp.register_frame_jit(state, _scan(i, GT[i]), CFG)
        runner_mod.checkpoint_save(str(tmp_path), state, 3)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        restored = runner_mod.checkpoint_restore(str(tmp_path), abstract, 3)
        # continuing from restored state must be bit-identical
        s1, o1 = kiss_icp.register_frame_jit(state, _scan(3, GT[3]), CFG)
        s2, o2 = kiss_icp.register_frame_jit(restored, _scan(3, GT[3]), CFG)
        np.testing.assert_array_equal(np.asarray(o1.pose), np.asarray(o2.pose))


class TestLio:
    def test_full_lio_runs_and_tracks(self):
        """Rolling-shutter scans (real intra-scan motion) + consistent IMU:
        the full init -> predict -> motion-compensate -> register -> update
        pipeline must track the trajectory."""
        cfg = CFG
        state = lio.init_state(cfg)
        scan_dt = 0.1
        # stationary lead-in for IMU static initialization (the reference
        # assumes it: 200 static samples, imu/frame.cpp:72-118)
        GT = synthetic.make_trajectory(
            n_poses=14, speed=1.0, yaw_rate=0.02, dt=scan_dt, n_static=4
        )
        t_imu, gyro, acc = synthetic.make_imu_stream(GT, scan_dt, imu_rate=100.0)
        poses = []
        cursor = 0
        for i in range(len(GT) - 1):
            pts, rel_t = synthetic.render_scan_rolling(
                WORLD, GT[i], GT[i + 1], scan_dt, 3500, 0.5, 30.0,
                noise=0.005, seed=i,
            )
            raw = pack_raw_scan(
                pts, time=i * scan_dt + rel_t, stamp=i * scan_dt,
                max_points=CFG.lidar.max_points,
            )
            scan = preprocess_scan(raw, CFG.lidar)
            t_end = (i + 1) * scan_dt
            take = []
            while cursor < len(t_imu) and t_imu[cursor] <= t_end + 1e-9:
                take.append((t_imu[cursor], *gyro[cursor], *acc[cursor]))
                cursor += 1
            arr = np.asarray(take) if take else np.zeros((0, 7))
            packet = lio.pack_imu_packet(
                arr[:, 0] + 1e-6, arr[:, 1:4], arr[:, 4:7], cfg.imu.max_samples_per_scan
            )
            state, out = lio.step_jit(state, scan, packet, cfg)
            poses.append(np.asarray(out.pose))
        assert bool(out.imu_initialized)
        assert bool(out.used_imu)
        # scan i is deskewed to its END time -> compare against GT[i+1]
        gt_end = np.linalg.inv(GT[0])[None] @ GT[1:]
        ate = trajectory.ate_rmse(np.stack(poses), gt_end, align=False)
        assert ate < 0.12, f"LIO ATE {ate}"
        assert np.isfinite(np.asarray(state.ekf.P)).all()


class TestMultiStream:
    def test_vmap_streams_match_single(self):
        from lidar_imu_slam_tpu import parallel

        n_streams = 4
        states = parallel.streams.init_batched_state(CFG, n_streams)
        scan = _scan(0, GT[0])
        scans = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape).copy(), scan
        )
        states, outs = parallel.streams.batched_register_frame_jit(states, scans, CFG)
        # identical inputs -> identical outputs across streams
        poses = np.asarray(outs.pose)
        for s in range(1, n_streams):
            np.testing.assert_array_equal(poses[s], poses[0])

    def test_sharded_step_on_virtual_mesh(self):
        from lidar_imu_slam_tpu import parallel

        n_dev = len(jax.devices())
        assert n_dev == 8, f"expected 8 virtual devices, got {n_dev}"
        mesh = parallel.mesh.stream_mesh()
        states = parallel.mesh.shard_streams(
            parallel.streams.init_batched_state(CFG, n_dev), mesh
        )
        scan = _scan(0, GT[0])
        scans = parallel.mesh.shard_streams(
            jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_dev,) + x.shape).copy(), scan
            ),
            mesh,
        )
        step = parallel.mesh.sharded_multistream_step(mesh, CFG)
        states, poses, metrics = step(states, scans)
        jax.block_until_ready(poses)
        assert poses.shape == (n_dev, 4, 4)
        assert np.isfinite(float(metrics.mean_residual_rms))
