"""Backend scalability past the round-2 bounds (VERDICT round 2, weak #5 /
next #6): matrix-free PCG pose-graph solve vs the dense Cholesky path, and
keyframe thinning instead of the silent capacity cap — loop closures must
keep firing after `max_keyframes` binds."""

import numpy as np

from lidar_imu_slam_tpu import config as cfgmod
from lidar_imu_slam_tpu.host.keyframes import OnlineBackend
from lidar_imu_slam_tpu.models import backend as backend_mod
from lidar_imu_slam_tpu.ops import lie

import jax.numpy as jnp

RNG = np.random.default_rng(7)


def _drifted_circle(n=48, radius=10.0, yaw_err=0.006):
    gt, drifted = [], []
    for k in range(n):
        th = 2 * np.pi * k / (n - 1)
        T = np.eye(4)
        c, s = np.cos(th), np.sin(th)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = [radius * np.sin(th), radius * (1 - np.cos(th)), 0.0]
        gt.append(T)
    gt = np.stack(gt)
    drift = np.eye(4)
    cd, sd = np.cos(yaw_err), np.sin(yaw_err)
    drift[:3, :3] = [[cd, -sd, 0], [sd, cd, 0], [0, 0, 1]]
    drift[:3, 3] = [0.015, 0, 0]
    drifted = [gt[0]]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        drifted.append(drifted[-1] @ rel @ drift)
    return gt, np.stack(drifted)


class TestCgSolver:
    def test_cg_matches_dense_on_loop(self):
        """The PCG path must reach the same optimum as the dense Cholesky
        path on a drifted loop with one ground-truth closure."""
        gt, drifted = _drifted_circle()
        n = len(gt)
        meas = np.linalg.inv(gt[0]) @ gt[-1]

        def build():
            g = backend_mod.from_chain(drifted, 64, 256)
            return backend_mod.add_edge(g, 0, n - 1, jnp.asarray(meas), 50.0)

        e0 = float(backend_mod.graph_error(build()))
        g_dense = backend_mod.optimize_jit(build(), iterations=12)
        g_cg = backend_mod.optimize_cg_jit(
            build(), iterations=12, cg_iterations=96
        )
        e_dense = float(backend_mod.graph_error(g_dense))
        e_cg = float(backend_mod.graph_error(g_cg))
        assert e_dense < e0 * 0.1
        assert e_cg < e0 * 0.1, f"CG barely improved: {e0} -> {e_cg}"
        # both paths agree on the recovered trajectory
        d = np.asarray(g_dense.poses[:n, :3, 3]) - np.asarray(
            g_cg.poses[:n, :3, 3]
        )
        assert np.max(np.linalg.norm(d, axis=1)) < 0.05

    def test_cg_anchor_fixed(self):
        gt, drifted = _drifted_circle(n=20)
        g = backend_mod.from_chain(drifted, 32, 64)
        g = backend_mod.optimize_cg_jit(g, iterations=3, cg_iterations=32)
        np.testing.assert_allclose(np.asarray(g.poses[0]), drifted[0], atol=1e-9)

    def test_cg_scales_to_kitti_length_graph(self):
        """512-node graph (the length the dense path was capped at) builds
        and optimizes matrix-free; this is memory-bound O(K), not O(K^2)."""
        n = 500
        th = np.linspace(0, 4 * np.pi, n)
        poses = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
        poses[:, 0, 3] = 30 * np.sin(th)
        poses[:, 1, 3] = 30 * (1 - np.cos(th))
        g = backend_mod.from_chain(poses, 512, 1024)
        # a couple of revisit edges lap-to-lap
        half = n // 2
        for k in (10, 100, 200):
            meas = np.linalg.inv(poses[k]) @ poses[k + half]
            g = backend_mod.add_edge(g, k, k + half, jnp.asarray(meas), 5.0)
        g = backend_mod.optimize_cg_jit(g, iterations=3, cg_iterations=48)
        assert float(backend_mod.graph_error(g)) < 1e-6  # consistent graph


def _backend_cfg(**kw):
    base = dict(
        enabled=True,
        max_keyframes=24,
        max_edges=96,
        solver="cg",
        cg_iterations=48,
        keyframe_dist=0.8,
        keyframe_rot=10.0,
        chunk=4,
        optimize_every=6,
        loop_radius=2.5,
        min_index_gap=10,
        max_candidates=4,
        verify_max_residual=0.65,
        verify_min_correspondences=60,
        lm_iterations=6,
    )
    base.update(kw)
    return cfgmod.PipelineConfig(
        map=cfgmod.MapConfig(voxel_size=0.5, max_range=25.0, capacity=1 << 12),
        backend=cfgmod.BackendConfig(**base),
    )


class TestThinning:
    def test_thin_remaps_loop_edges(self):
        cfg = _backend_cfg(optimize_every=10_000)  # no auto-optimize
        be = OnlineBackend(cfg)
        # straight line: one keyframe per metre
        dummy_cloud = np.zeros((32, 3), np.float32)
        dummy_mask = np.ones(32, bool)
        for i in range(24):
            T = np.eye(4)
            T[0, 3] = float(i)
            be.observe_chunk([i], T[None], [dummy_cloud], [dummy_mask])
        assert len(be.kf_poses) == 24
        # a verified loop edge anchoring keyframes 3 and 21
        meas = np.linalg.inv(be.kf_poses[3]) @ be.kf_poses[21]
        be.loop_edges.append((3, 21, meas, 1.0))
        scan_3, scan_21 = be.kf_scan_idx[3], be.kf_scan_idx[21]

        # next keyframe triggers thinning
        T = np.eye(4)
        T[0, 3] = 25.0
        be.observe_chunk([25], T[None], [dummy_cloud], [dummy_mask])
        assert be.thin_events == 1
        assert len(be.kf_poses) <= 24
        assert be.kf_scan_idx[-1] == 25  # new keyframe WAS accepted
        # the loop edge survived, endpoints remapped to the same keyframes
        (i, j, m, _), = be.loop_edges
        assert be.kf_scan_idx[i] == scan_3
        assert be.kf_scan_idx[j] == scan_21
        np.testing.assert_allclose(m, meas)
        # scan index order (correct() relies on searchsorted)
        assert np.all(np.diff(be.kf_scan_idx) > 0)

    def test_closures_keep_firing_past_capacity(self):
        """Three laps around a circle with real cloud verification: the
        keyframe store overflows its cap mid-run, is thinned, and loop
        edges must still be verified afterwards (round-2's silent cap
        stopped closure forever once full)."""
        cfg = _backend_cfg()
        be = OnlineBackend(cfg)
        world = RNG.uniform(-9, 9, (6000, 3)).astype(np.float64)
        world[:, 2] = RNG.uniform(0, 3, 6000)

        n_per_lap, laps, radius = 20, 3, 5.0
        n = n_per_lap * laps
        scan = 0
        for k in range(n):
            th = 2 * np.pi * (k % n_per_lap) / n_per_lap
            T = np.eye(4)
            c, s = np.cos(th), np.sin(th)
            T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
            T[:3, 3] = [radius * np.cos(th), radius * np.sin(th), 0.0]
            # keyframe cloud: fixed world geometry near the pose (same
            # revisit position -> registrable overlap)
            d = np.linalg.norm(world[:, :2] - T[:2, 3], axis=1)
            idx = np.argsort(d)[:384]
            cloud = world[idx].astype(np.float32)
            mask = np.ones(len(idx), bool)
            be.observe_chunk([scan], T[None], [cloud], [mask])
            scan += 1

        assert be.thin_events >= 1, "capacity never bound - test too small"
        assert len(be.kf_poses) <= cfg.backend.max_keyframes
        assert len(be.loop_edges) >= 1, "no loop verified after thinning"
        assert be.num_optimizations >= 2
        # corrected trajectory stays finite and anchored
        raw = np.stack(be.kf_poses)
        corr = be.correct(raw)
        assert np.isfinite(corr).all()
