"""Monte-Carlo multi-stream SLAM (BASELINE.json config 5 at test scale):
perturbed copies of one scan stream diverge per-stream but all track."""

import jax
import jax.numpy as jnp
import numpy as np

from lidar_imu_slam_tpu import config as cfgmod, parallel
from lidar_imu_slam_tpu.host import synthetic
from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan

CFG = cfgmod.PipelineConfig(
    lidar=cfgmod.LidarConfig(max_range=30.0, min_range=0.5, max_points=4096),
    map=cfgmod.MapConfig(voxel_size=0.5, max_range=30.0, capacity=1 << 14, max_probes=16),
    icp=cfgmod.IcpConfig(max_map_points=4096, max_source_points=1024, max_iterations=50),
)


class TestMonteCarlo:
    def test_perturbed_ensemble_tracks(self):
        world = synthetic.make_world(seed=0, n_points=120_000, extent=(30.0, 10.0, 5.0))
        gt = synthetic.make_trajectory(n_poses=6, speed=1.0, dt=0.1)
        n_streams = 8
        states = parallel.streams.init_batched_state(CFG, n_streams)
        key = jax.random.PRNGKey(0)
        poses = None
        for i, pose in enumerate(gt):
            pts = synthetic.render_scan(world, pose, 3500, 0.5, 30.0, noise=0.0, seed=i)
            raw = pack_raw_scan(pts, stamp=i * 0.1, max_points=4096)
            scan = preprocess_scan(raw, CFG.lidar)
            key, sub = jax.random.split(key)
            scans = parallel.streams.perturb_scans(scan, sub, n_streams, noise_sigma=0.01)
            states, outs = parallel.streams.batched_register_frame_jit(states, scans, CFG)
            poses = np.asarray(outs.pose)
        gt_rel = np.linalg.inv(gt[0]) @ gt[-1]
        errs = np.linalg.norm(poses[:, :3, 3] - gt_rel[:3, 3], axis=1)
        # every perturbed stream tracks; noise makes them distinct
        assert (errs < 0.15).all(), errs
        spread = np.std(poses[:, :3, 3], axis=0)
        assert float(spread.max()) > 1e-6  # genuinely distinct streams
