"""Map-parallel odometry: one stream's voxel map sharded across the 8-device
virtual mesh (VERDICT round 1, next-round #9 — sharding beyond dp-streams).

With zero hash drops the sharded pipeline stores exactly the same per-voxel
content as a single map of D x capacity, and the cross-shard NN argmin picks
the same winner points — so the trajectories must agree to float noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lidar_imu_slam_tpu import config as cfgmod, parallel
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.models import kiss_icp
from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan
from lidar_imu_slam_tpu.parallel import sharded_map

N_SHARDS = 8


def _make_drive(n):
    cfg = cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(max_range=30.0, min_range=0.5, max_points=4096),
        # per-shard capacity 2^12; the single-map control gets 2^15 = 8 x
        map=cfgmod.MapConfig(voxel_size=0.5, max_range=30.0, capacity=1 << 12),
        icp=cfgmod.IcpConfig(
            max_map_points=4096, max_source_points=1024,
            batch_unroll_outer=2, batch_unroll_inner=4,
        ),
    )
    world = synthetic.make_world(seed=4, n_points=100_000, extent=(40.0, 12.0, 5.0))
    gt = synthetic.make_trajectory(n_poses=n, speed=1.5, yaw_rate=0.02, dt=0.1)
    scans = []
    for i, pose in enumerate(gt):
        pts = synthetic.render_scan(world, pose, 3000, 0.5, 30.0, noise=0.01, seed=i)
        scans.append(preprocess_scan(
            pack_raw_scan(pts, stamp=i * 0.1, max_points=4096), cfg.lidar
        ))
    return cfg, scans, gt


def test_sharded_matches_single_map():
    n = 10
    cfg, scans, gt = _make_drive(n)

    # single-map control at D x capacity, same unrolled schedule
    import dataclasses
    ctrl_cfg = cfg.replace(
        map=dataclasses.replace(cfg.map, capacity=cfg.map.capacity * N_SHARDS)
    )
    ctrl = kiss_icp.init_state(ctrl_cfg)
    ctrl_poses = []
    for s in scans:
        ctrl, out = kiss_icp.register_frame_jit(ctrl, s, ctrl_cfg)
        ctrl_poses.append(np.asarray(out.pose))

    # sharded run on the 8-device mesh
    mesh = parallel.mesh.stream_mesh(jax.devices()[:N_SHARDS], axis="mp")
    state = sharded_map.init_state(cfg, N_SHARDS)
    state = sharded_map.shard_state(state, mesh, axis="mp")
    poses = []
    drops = 0
    for s in scans:
        state, pose, metrics = sharded_map.register_frame_jit(
            state, s, cfg, N_SHARDS
        )
        poses.append(np.asarray(pose))
        drops = int(metrics["drops"])
    assert drops == 0

    for k, (a, b) in enumerate(zip(ctrl_poses, poses)):
        d = np.linalg.norm(a[:3, 3] - b[:3, 3])
        assert d < 1e-6, (k, d)

    # the sharded map really is distributed: every shard holds voxels
    per_shard = np.asarray(
        jax.vmap(lambda k: jnp.sum(k >= 0))(state.map.keys)
    )
    assert (per_shard > 0).all()
    # and the shard loads are roughly balanced (salted hash)
    assert per_shard.max() < 3 * max(per_shard.min(), 1)


def test_sharded_tracks_ground_truth():
    n = 12
    cfg, scans, gt = _make_drive(n)
    mesh = parallel.mesh.stream_mesh(jax.devices()[:N_SHARDS], axis="mp")
    state = sharded_map.init_state(cfg, N_SHARDS)
    state = sharded_map.shard_state(state, mesh, axis="mp")
    poses = []
    for s in scans:
        state, pose, metrics = sharded_map.register_frame_jit(
            state, s, cfg, N_SHARDS
        )
        poses.append(np.asarray(pose))
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    err = np.linalg.norm(poses[-1][:3, 3] - gt_rel[-1][:3, 3])
    assert err < 0.1, err
