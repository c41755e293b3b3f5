"""Component-level timing of the odometry step on the live chip.

Times each stage of register_frame in isolation on a WARM map state (21
scans inserted), so the big while-loops in the trace can be attributed:
fetch vs ICP-inner vs insert-contest. Usage: python tools/lab2.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)

from lab import make_cfg, load_scans, warm_state  # noqa: E402

from lidar_imu_slam_tpu.models import kiss_icp  # noqa: E402
from lidar_imu_slam_tpu.ops import icp as icp_ops  # noqa: E402
from lidar_imu_slam_tpu.ops import lie, stats, voxel_map  # noqa: E402


def t(f, *args, n=30, label=""):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{ms:8.3f} ms  {label}")
    return out


def main():
    cfg = make_cfg()
    scans = load_scans(cfg)
    state = warm_state(cfg, scans)
    scan = scans[21]

    # replicate the step's internals
    init_guess = jax.jit(
        lambda st: lie.compose(st.pose, kiss_icp.get_prediction_model(st))
    )(state)
    np.asarray(init_guess)

    @jax.jit
    def world_ds(scan, guess):
        Rg = guess[:3, :3].astype(jnp.float32)
        tg = guess[:3, 3].astype(jnp.float32)
        world = lie.rotate_points(Rg, scan.xyz) + tg
        return voxel_map.fused_downsample(
            world, scan.mask, cfg.map.voxel_size, cfg.icp.max_map_points
        )

    g = t(world_ds, scan, init_guess, label="world transform + fused_downsample")

    @jax.jit
    def src_ds(g, guess):
        tg = guess[:3, 3].astype(jnp.float32)
        source, source_mask, _ = voxel_map.first_point_per_voxel(
            g.points, g.mask, 1.5 * cfg.map.voxel_size, cfg.icp.max_source_points
        )
        d_sq = jnp.sum((source - tg[None, :]) ** 2, axis=-1)
        return source, stats.iqr_inlier_mask(d_sq.astype(jnp.float64), source_mask)

    source, source_mask = t(src_ds, g, init_guess, label="source downsample + IQR")

    @jax.jit
    def fetch(m, source, source_mask):
        cand, cand_valid = voxel_map.gather_candidates(m, source, source_mask, cfg.map)
        cx, cy, cz = voxel_map.deinterleave_candidates(cand)
        return cx, cy, cz, cand_valid

    cx, cy, cz, cand_valid = t(
        fetch, state.map, source, source_mask, label="gather_candidates + deinterleave"
    )

    @jax.jit
    def nn_only(cx, cy, cz, cand_valid, source, source_mask):
        return voxel_map.nn_from_candidates_soa(
            cx, cy, cz, cand_valid, source[:, 0], source[:, 1], source[:, 2],
            source_mask,
        )

    t(nn_only, cx, cy, cz, cand_valid, source, source_mask, label="nn reduce (1x)")

    @jax.jit
    def gn_once(cx, cy, cz, cand_valid, source, source_mask):
        tx, ty, tz, d2, found = voxel_map.nn_from_candidates_soa(
            cx, cy, cz, cand_valid, source[:, 0], source[:, 1], source[:, 2],
            source_mask,
        )
        corr = found & (d2 < 4.0)
        return icp_ops._align_soa(
            source[:, 0].astype(jnp.float64), source[:, 1].astype(jnp.float64),
            source[:, 2].astype(jnp.float64),
            tx.astype(jnp.float64), ty.astype(jnp.float64), tz.astype(jnp.float64),
            corr, 0.5,
        )

    t(gn_once, cx, cy, cz, cand_valid, source, source_mask,
      label="nn + one full GN iteration (align+chol+exp)")

    @jax.jit
    def icp_full(m, source, source_mask, guess):
        return icp_ops.icp_registration(
            m, source, source_mask, jnp.eye(4, dtype=jnp.float64),
            3.0 * 0.5, 0.5 / 3.0, cfg.map,
            cfg.icp.max_iterations, cfg.icp.estimation_threshold,
        )

    t(icp_full, state.map, source, source_mask, init_guess, label="icp_registration (full while)")

    @jax.jit
    def ins(m, g):
        pre_keys = voxel_map.pack_key(voxel_map.voxel_of(g.points, cfg.map.voxel_size))
        return voxel_map.insert_grouped(m, g, cfg.map, keys=pre_keys)

    m2 = t(ins, state.map, g, label="insert_grouped")

    @jax.jit
    def ev(m, guess):
        return voxel_map.evict_far(m, guess[:3, 3], cfg.map)

    t(ev, m2, init_guess, label="evict_far")

    @jax.jit
    def noop(x):
        return x + 1.0

    t(noop, jnp.float32(1.0), label="dispatch overhead (trivial jit)")

    # full step for reference
    t(lambda s, sc: kiss_icp.register_frame_jit(s, sc, cfg), state, scan,
      n=30, label="FULL register_frame")


if __name__ == "__main__":
    main()
