"""Round-3 TPU timing: fused-kernel pipeline vs round-2 XLA pipeline.

Times, on the warm 64-beam lab state: the new fetch, the fused ICP, the
grid-index insert, the full step (both backends), and the chained
(lax.scan) mode that amortizes the ~2.3 ms dispatch floor.

Usage: python tools/lab3.py
"""

import dataclasses
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
    print(f"{ms:8.3f} ms  {label}", flush=True)
    return out


def main():
    cfg = make_cfg()
    pcfg = cfg.replace(icp=dataclasses.replace(cfg.icp, gn_backend="pallas"))
    scans = load_scans(cfg)
    state = warm_state(cfg, scans)
    scan = scans[21]

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

    g = world_ds(scan, init_guess)

    @jax.jit
    def src_ds(g, guess):
        tg = guess[:3, 3].astype(jnp.float32)
        source, source_mask, _ = voxel_map.first_point_per_voxel(
            g.points, g.mask, 1.5 * cfg.map.voxel_size, cfg.icp.max_source_points
        )
        d_sq = jnp.sum((source - tg[None, :]) ** 2, axis=-1)
        return source, stats.iqr_inlier_mask(d_sq.astype(jnp.float64), source_mask)

    source, source_mask = src_ds(g, init_guess)

    @jax.jit
    def fetch_flat(m, source, source_mask):
        cand, cand_valid = voxel_map.gather_candidates(m, source, source_mask, cfg.map)
        return voxel_map.deinterleave_candidates(cand)

    t(fetch_flat, state.map, source, source_mask,
      label="fetch v3 flat (grid lookup + i64 gather + deinterleave)")

    @jax.jit
    def fetch_planes(m, source, source_mask, guess):
        anchor = guess[:3, 3].astype(jnp.float32)
        return voxel_map.gather_candidate_planes(
            m, source, source_mask, cfg.map, anchor
        )

    t(fetch_planes, state.map, source, source_mask, init_guess,
      label="fetch v3 planes (kernel layout)")

    @jax.jit
    def icp_fused(m, source, source_mask):
        return icp_ops.icp_registration_fused(
            m, source, source_mask, jnp.eye(4, dtype=jnp.float64),
            1.5, 0.5 / 3.0, cfg.map, cfg.icp.max_iterations, 5e-4,
        )

    r = t(icp_fused, state.map, source, source_mask,
          label="icp_registration_fused (while)")
    print(f"          iters={int(r.iterations)} conv={bool(r.converged)}")

    @jax.jit
    def icp_xla(m, source, source_mask):
        return icp_ops.icp_registration(
            m, source, source_mask, jnp.eye(4, dtype=jnp.float64),
            1.5, 0.5 / 3.0, cfg.map, cfg.icp.max_iterations, 5e-4,
        )

    r = t(icp_xla, state.map, source, source_mask,
          label="icp_registration XLA (while)")
    print(f"          iters={int(r.iterations)} conv={bool(r.converged)}")

    @jax.jit
    def ins(m, g):
        pre_keys = voxel_map.pack_key(voxel_map.voxel_of(g.points, cfg.map.voxel_size))
        return voxel_map.insert_grouped(m, g, cfg.map, keys=pre_keys)

    m2 = t(ins, state.map, g, label="insert_grouped (grid find)")

    @jax.jit
    def ev(m, guess):
        return voxel_map.evict_far(m, guess[:3, 3], cfg.map)

    t(ev, m2, init_guess, label="evict_far")

    # full steps
    t(lambda s, sc: kiss_icp.register_frame_jit(s, sc, cfg), state, scan,
      label="FULL step XLA backend")
    t(lambda s, sc: kiss_icp.register_frame_jit(s, sc, pcfg), state, scan,
      label="FULL step PALLAS backend")

    # chained scan (k=8) with donation, pallas backend
    k = 8
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *([scan] * k))

    def chain(cfgx):
        def run(st, stacked):
            def body(s, sc):
                s, out = kiss_icp.register_frame(s, sc, cfgx)
                return s, out.pose

            return jax.lax.scan(body, st, stacked)

        return jax.jit(run, donate_argnums=(0,))

    for cfgx, lbl in ((cfg, "xla"), (pcfg, "pallas")):
        fn = chain(cfgx)
        s = jax.tree.map(lambda x: x.copy(), state)
        s, poses = fn(s, stacked)
        np.asarray(poses)
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            s, poses = fn(s, stacked)
        np.asarray(poses)
        ms = (time.perf_counter() - t0) / (n * k) * 1e3
        print(f"{ms:8.3f} ms  chained scan k=8 donated ({lbl})", flush=True)


if __name__ == "__main__":
    main()
