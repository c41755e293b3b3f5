"""Online keyframe backend: loop-closure detection + pose-graph optimization
wired behind the odometry runner (BASELINE.json config 3 analog; capability
the reference only promised — README.md:2)."""

import numpy as np

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.host.runner import OdometryRunner
from lidar_imu_slam_tpu.models import backend as backend_mod


def test_pose_graph_closes_synthetic_loop():
    """Pure pose-graph sanity: a drifted circle + one perfect loop edge must
    pull the end of the chain back toward the start."""
    n = 40
    gt = []
    for k in range(n):
        th = 2 * np.pi * k / (n - 1)
        T = np.eye(4)
        c, s = np.cos(th), np.sin(th)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = [10 * np.sin(th), 10 * (1 - np.cos(th)), 0.0]
        gt.append(T)
    gt = np.stack(gt)
    # inject odometric drift: a small per-step YAW error (a pure translation
    # drift in the local frame rotates with the heading and cancels over a
    # closed circle); heading error compounds into metres of end error
    th_d = 0.008
    drift = np.eye(4)
    drift[:3, :3] = np.array(
        [[np.cos(th_d), -np.sin(th_d), 0], [np.sin(th_d), np.cos(th_d), 0], [0, 0, 1]]
    )
    drift[:3, 3] = [0.02, 0.0, 0.0]
    drifted = [gt[0]]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        drifted.append(drifted[-1] @ rel @ drift)
    drifted = np.stack(drifted)
    end_err_before = np.linalg.norm(drifted[-1][:3, 3] - gt[-1][:3, 3])

    g = backend_mod.from_chain(drifted, 64, 256)
    meas = np.linalg.inv(gt[0]) @ gt[-1]
    g = backend_mod.add_edge(g, 0, n - 1, meas, 50.0)
    g = backend_mod.optimize_jit(g, iterations=15)
    opt = np.asarray(g.poses)[:n]
    end_err_after = np.linalg.norm(opt[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_before > 1.0
    assert end_err_after < 0.35 * end_err_before


def test_runner_online_loop_closure():
    """End-to-end: drive the odometry around a closed circuit with noisy
    scans; the online backend must select keyframes, verify at least one
    loop edge where the circuit closes, optimize, and the corrected
    trajectory must not be worse than the raw one."""
    n = 120
    cfg = cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(max_range=25.0, min_range=0.5, max_points=2048),
        map=cfgmod.MapConfig(voxel_size=0.5, max_range=25.0, capacity=1 << 13),
        icp=cfgmod.IcpConfig(
            max_map_points=2048, max_source_points=512, max_iterations=30
        ),
        backend=cfgmod.BackendConfig(
            enabled=True,
            max_keyframes=64,
            max_edges=256,
            keyframe_dist=1.0,
            keyframe_rot=0.3,
            chunk=6,
            optimize_every=6,
            loop_radius=3.0,
            min_index_gap=12,
            max_candidates=4,
            # point-to-point residuals between two DIFFERENT sparse
            # samplings of a surface are bounded by the sampling spacing:
            # at 512-pt clouds over 25 m range correct alignments measure
            # rms ~0.55; discriminate on correspondence count instead
            verify_max_residual=0.65,
            verify_min_correspondences=150,
            lm_iterations=8,
        ),
    )
    world = synthetic.make_world(seed=11, n_points=80_000, extent=(36.0, 36.0, 5.0))
    # closed circle: make_trajectory applies yaw_rate PER STEP -> one full
    # turn over n-1 steps; radius = speed*dt/yaw_rate ~ 4.3 m
    yaw_rate = 2 * np.pi / (n - 1)
    gt = synthetic.make_trajectory(n_poses=n, speed=2.3, yaw_rate=yaw_rate, dt=0.1)

    scans = (
        {
            "xyz": synthetic.render_scan(world, p, 1600, 0.5, 25.0, noise=0.03, seed=i),
            "stamp": i * 0.1,
        }
        for i, p in enumerate(gt)
    )
    r = OdometryRunner(cfg).run(scans)

    assert r.backend is not None
    assert len(r.backend.kf_poses) >= 10
    assert r.backend.num_optimizations >= 1
    # the circuit re-approaches its start: at least one verified loop edge
    assert len(r.backend.loop_edges) >= 1, "no loop closure verified"
    for (i, j, meas, w) in r.backend.loop_edges:
        assert j - i >= cfg.backend.min_index_gap

    raw = np.stack(r.poses)
    opt = r.optimized_poses()
    gt_rel = np.linalg.inv(gt[0])[None] @ gt

    def ate(poses):
        return float(
            np.sqrt(
                np.mean(
                    np.sum((poses[:, :3, 3] - gt_rel[: len(poses), :3, 3]) ** 2, axis=1)
                )
            )
        )

    assert np.isfinite(opt).all()
    # loop closure must not hurt, and with real drift it should help
    assert ate(opt) <= ate(raw) * 1.05 + 1e-6
