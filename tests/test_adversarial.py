"""Adversarial sensor-artifact stability (round-2 VERDICT next #5): the
pipeline must keep tracking through the artifact classes a real bag carries
— ring dropouts, wrapped per-point timestamps, IMU clock jitter, moving
outlier clusters, reflective ghosts — which the clean synthetic runs never
exercise. Each test feeds one artifact and asserts tracking + the
documented rejection behavior."""

import numpy as np

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host import adversarial, synthetic
from lidar_imu_slam_tpu.host.runner import LioRunner, OdometryRunner

N = 14
SPEED = 1.5
DT = 0.1


def _cfg():
    return cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(max_range=25.0, min_range=0.5, max_points=4096),
        map=cfgmod.MapConfig(voxel_size=0.5, max_range=25.0, capacity=1 << 13),
        icp=cfgmod.IcpConfig(
            max_map_points=4096, max_source_points=1024, max_iterations=30
        ),
        imu=cfgmod.ImuConfig(max_init_count=30, max_samples_per_scan=32),
    )


def _world_and_gt(n=N):
    world = synthetic.make_world(seed=5, n_points=60_000, extent=(40.0, 12.0, 5.0))
    gt = synthetic.make_trajectory(n_poses=n, speed=SPEED, yaw_rate=0.02, dt=DT)
    return world, gt


def _msgs(world, gt, with_time=True):
    per_pt = np.linspace(0.0, 0.09, 3000)
    out = []
    for i, p in enumerate(gt):
        m = {
            "xyz": synthetic.render_scan(world, p, 3000, 0.5, 25.0, seed=i),
            "stamp": i * DT,
        }
        if with_time:
            m["time"] = i * DT + per_pt
        out.append(m)
    return out


def _final_err(runner, gt):
    gt_rel = np.linalg.inv(gt[0]) @ gt[-1]
    return float(np.linalg.norm(runner.poses[-1][:3, 3] - gt_rel[:3, 3]))


def _run(msgs):
    r = OdometryRunner(_cfg()).run(iter(msgs))
    assert np.isfinite(np.stack(r.poses)).all()
    # the standard configs must lose NOTHING to the downsample windows
    # (VERDICT weak #10 counter; the trigger case is in test_voxel_map)
    assert all(int(m["window_drops"]) == 0 for m in r.metrics.records)
    return r


class TestRingDropout:
    def test_tracks_through_ring_loss(self):
        """Half the rings die for 4 consecutive scans mid-run: the map
        carries the geometry, tracking must hold to decimetres."""
        world, gt = _world_and_gt()
        msgs = [adversarial.assign_rings(m) for m in _msgs(world, gt)]
        for i in range(6, 10):
            msgs[i] = adversarial.drop_rings(msgs[i], range(0, 16, 2))
            assert len(msgs[i]["xyz"]) < len(msgs[5]["xyz"])  # actually lost
        r = _run(msgs)
        assert _final_err(r, gt) < 0.3
        # degraded scans still converged (failure-detection flag)
        assert all(bool(m["icp_converged"]) for m in r.metrics.records[6:10])


class TestWrappedTimestamps:
    def test_time_sort_survives_wraparound(self):
        """Per-point stamps wrapping mid-sweep reorder the scan; the packed
        time-sort must reorder, never corrupt geometry."""
        world, gt = _world_and_gt()
        clean = _msgs(world, gt)
        wrapped = [adversarial.wrap_timestamps(m) for m in clean]
        r_clean = _run(clean)
        r_wrap = _run(wrapped)
        # geometry is identical; only deskew interpolation shifts (the wrap
        # moves each point's tau by half a period)
        d = np.stack(r_clean.poses)[:, :3, 3] - np.stack(r_wrap.poses)[:, :3, 3]
        assert np.max(np.linalg.norm(d, axis=1)) < 0.2
        assert _final_err(r_wrap, gt) < 0.3


class TestMovingOutliers:
    def test_robust_kernel_rejects_moving_cluster(self):
        """A rigid cluster sweeping through the scene at 2 m/s (7% of the
        points): the Geman-McClure kernel + IQR gate must keep the static
        world as the registration target."""
        world, gt = _world_and_gt()
        msgs = [
            adversarial.add_moving_outliers(
                m, n_points=220, scan_index=i, dt=DT, seed=100 + i
            )
            for i, m in enumerate(_msgs(world, gt))
        ]
        r = _run(msgs)
        assert _final_err(r, gt) < 0.3


class TestReflectiveGhosts:
    def test_ghost_returns_rejected(self):
        """5% multipath ghosts at 2x range: they land in empty space beyond
        the walls and must not drag correspondences."""
        world, gt = _world_and_gt()
        msgs = [
            adversarial.add_reflective_ghosts(m, fraction=0.05, seed=50 + i)
            for i, m in enumerate(_msgs(world, gt))
        ]
        r = _run(msgs)
        assert _final_err(r, gt) < 0.3


class TestRandomDropout:
    def test_tracks_through_heavy_rain(self):
        """40% uniform dropout every scan (rain): density halves, tracking
        holds."""
        world, gt = _world_and_gt()
        msgs = [
            adversarial.drop_random_points(m, fraction=0.4, seed=i)
            for i, m in enumerate(_msgs(world, gt))
        ]
        r = _run(msgs)
        assert _final_err(r, gt) < 0.3


def _imu_rows():
    return np.asarray(
        [[k * 0.01 + 0.0013, 0, 0, 0, 0, 0, 9.81] for k in range(N * 10)]
    )


class TestImuClockJitter:
    def test_lio_tracks_with_jittered_imu_clock(self):
        """IMU stamps with 1 ms jitter: packet bucketing wobbles by a sample
        but tracking must stay close to the clean-clock run."""
        world, gt = _world_and_gt()
        msgs = _msgs(world, gt)
        rows = _imu_rows()
        jittered = rows.copy()
        jittered[:, 0] = adversarial.jitter_clock(
            rows[:, 0], sigma=1e-3, offset=0.0, seed=3
        )
        # keep arrival order = stamp order (drivers deliver in stamp order;
        # out-of-order arrival is the loop-back test's job)
        jittered = jittered[np.argsort(jittered[:, 0], kind="stable")]

        r_clean = LioRunner(_cfg()).run_lio(iter(msgs), rows)
        r_jit = LioRunner(_cfg()).run_lio(iter(msgs), jittered)
        assert np.isfinite(np.stack(r_jit.poses)).all()
        d = np.stack(r_clean.poses)[:, :3, 3] - np.stack(r_jit.poses)[:, :3, 3]
        assert np.max(np.linalg.norm(d, axis=1)) < 0.3

    def test_lio_bounded_under_sub_latch_offset(self):
        """A constant 20 ms clock offset is BELOW the >1 s latch threshold
        (the reference latches only whole-second gaps, odom_run.cpp:55-63),
        so every IMU-deskew interpolation is systematically 20 ms skewed.
        Documented behavior: tracking degrades (the skew biases the
        undistortion) but stays BOUNDED — measured ~0.8 m plateau vs the
        clean run's ~0.2 m scan-end lag on this drive; divergence would
        compound past metres."""
        world, gt = _world_and_gt()
        msgs = _msgs(world, gt)
        rows = _imu_rows()
        shifted = rows.copy()
        shifted[:, 0] = rows[:, 0] + 0.02

        r = LioRunner(_cfg()).run_lio(iter(msgs), shifted)
        assert np.isfinite(np.stack(r.poses)).all()
        gt_rel = np.linalg.inv(gt[0])[None] @ gt
        err = np.linalg.norm(
            np.stack(r.poses)[:, :3, 3] - gt_rel[:N, :3, 3], axis=1
        )
        assert err.max() < 1.5, f"diverged under 20 ms offset: {err}"
