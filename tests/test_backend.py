"""Pose-graph backend: LM convergence on a noisy loop, loop-closure
candidate detection + ICP verification (the backend the reference promised
but never shipped — reference README.md:2)."""

import jax.numpy as jnp
import numpy as np

from lidar_imu_slam_tpu.config import MapConfig
from lidar_imu_slam_tpu.models import backend
from lidar_imu_slam_tpu.ops import lie

RNG = np.random.default_rng(3)


def _square_trajectory(n_side=5, step=1.0):
    """Square loop of 4*n_side poses returning to the start."""
    poses = [np.eye(4)]
    headings = [0, np.pi / 2, np.pi, -np.pi / 2]
    for leg in range(4):
        c, s = np.cos(headings[leg]), np.sin(headings[leg])
        for _ in range(n_side):
            T = poses[-1].copy()
            T[:3, 3] += T[:3, :3] @ np.array([step, 0, 0]) * 0 + np.array(
                [c * step, s * step, 0]
            )
            poses.append(T)
    return np.stack(poses)


class TestPoseGraphLm:
    def test_perfect_graph_zero_error(self):
        gt = _square_trajectory(3)
        g = backend.create(max_keyframes=16, max_edges=32)
        g = backend.add_odometry_chain(g, jnp.asarray(gt[:13]))
        assert float(backend.graph_error(g)) < 1e-20

    def test_corrects_drifted_loop(self):
        gt = _square_trajectory(4)  # 17 poses, ends where it started
        n = len(gt)
        # corrupt odometry with incremental drift
        drifted = [gt[0]]
        for i in range(1, n):
            rel = np.linalg.inv(gt[i - 1]) @ gt[i]
            noise = np.asarray(
                lie.se3_exp(jnp.asarray(RNG.normal(0, 0.01, 6) + [0.02, 0, 0, 0, 0, 0.01]))
            )
            drifted.append(drifted[-1] @ rel @ noise)
        drifted = np.stack(drifted)
        drift_before = np.linalg.norm(drifted[-1][:3, 3] - gt[-1][:3, 3])
        assert drift_before > 0.1  # drift actually present

        g = backend.create(max_keyframes=32, max_edges=64)
        g = backend.add_odometry_chain(g, jnp.asarray(drifted))
        # ground-truth loop closure: first-to-last relative pose
        loop_meas = jnp.asarray(np.linalg.inv(gt[0]) @ gt[-1])
        g = backend.add_edge(g, 0, n - 1, loop_meas, weight=10.0)

        e0 = float(backend.graph_error(g))
        g = backend.optimize_jit(g, iterations=15)
        e1 = float(backend.graph_error(g))
        assert e1 < e0 * 0.1, f"error {e0} -> {e1}"
        drift_after = np.linalg.norm(
            np.asarray(g.poses[n - 1][:3, 3]) - gt[-1][:3, 3]
        )
        assert drift_after < drift_before * 0.5

    def test_anchor_fixed(self):
        gt = _square_trajectory(3)
        g = backend.create(max_keyframes=16, max_edges=32)
        g = backend.add_odometry_chain(g, jnp.asarray(gt[:13]))
        g = backend.optimize_jit(g, iterations=3)
        np.testing.assert_allclose(np.asarray(g.poses[0]), gt[0], atol=1e-6)


class TestLoopClosure:
    def test_candidates_detected(self):
        gt = _square_trajectory(4)  # returns near start
        g = backend.create(max_keyframes=32, max_edges=64)
        g = backend.add_odometry_chain(g, jnp.asarray(gt))
        cands = backend.find_loop_candidates(
            g, radius=0.75, min_index_gap=8, max_candidates=8
        )
        assert bool(jnp.any(cands.mask))
        i, j = int(cands.idx_i[0]), int(cands.idx_j[0])
        assert j - i > 8
        d = np.linalg.norm(gt[i][:3, 3] - gt[j][:3, 3])
        assert d < 0.75

    def test_verify_loop_with_icp(self):
        cfg = MapConfig(voxel_size=0.5, max_points_per_voxel=10, max_range=50.0, capacity=1 << 12)
        world = RNG.uniform(-10, 10, (2000, 3)).astype(np.float32)
        # two keyframes near each other with known relative pose
        T_i = np.eye(4)
        T_j = np.asarray(lie.se3_exp(jnp.asarray([0.3, 0.1, 0.0, 0.0, 0.0, 0.05])))
        cloud_i = (world - T_i[:3, 3]) @ T_i[:3, :3]
        cloud_j = ((world - T_j[:3, 3]) @ T_j[:3, :3]).astype(np.float32)

        g = backend.create(max_keyframes=4, max_edges=8)
        g = backend.add_node(g, jnp.asarray(T_i))
        g = backend.add_node(g, jnp.asarray(T_j @ np.asarray(
            lie.se3_exp(jnp.asarray([0.05, -0.02, 0, 0, 0, 0.01]))
        )))  # drifted estimate of j
        cands = backend.LoopCandidates(
            idx_i=jnp.asarray([0], jnp.int32),
            idx_j=jnp.asarray([1], jnp.int32),
            dist=jnp.asarray([0.3]),
            mask=jnp.asarray([True]),
        )
        clouds = jnp.stack([jnp.asarray(cloud_i, jnp.float32), jnp.asarray(cloud_j)])
        masks = jnp.ones((2, 2000), bool)
        g2 = backend.verify_and_add_loops(g, cands, clouds, masks, cfg)
        assert int(g2.num_edges) == 1
        # verified edge close to the true relative pose
        np.testing.assert_allclose(
            np.asarray(g2.edge_meas[0]), np.linalg.inv(T_i) @ T_j, atol=0.02
        )
