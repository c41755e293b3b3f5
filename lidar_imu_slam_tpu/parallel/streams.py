"""Batched Monte-Carlo / multi-stream SLAM via vmap.

The reference's only parallelism is TBB threads inside one scan (SURVEY §2);
here the whole odometry step vmaps over independent streams — the
256-way Monte-Carlo configuration of BASELINE.json (config 5) runs as one
XLA program on one chip, and shards across chips via `parallel.mesh`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..models import kiss_icp
from ..ops.preprocess import Scan


def batch_config(cfg: PipelineConfig, outer: int = 2, inner: int = 4) -> PipelineConfig:
    """Config for batched streams: fixed-unroll ICP (outer fetches x inner
    GN iterations, early-exit masking) instead of the while loop — a vmapped
    while_loop runs every stream to the slowest stream's iteration count."""
    import dataclasses

    return cfg.replace(
        icp=dataclasses.replace(
            cfg.icp, batch_unroll_outer=outer, batch_unroll_inner=inner
        ),
        # no conditional in-step rebuild under vmap: the per-stream
        # predicate would lower lax.cond to select and run the compaction
        # every scan for every stream. Batched streams size capacity with
        # headroom and rely on the host's periodic rebuild instead.
        map=dataclasses.replace(cfg.map, auto_rebuild=False),
    )


def init_batched_state(cfg: PipelineConfig, num_streams: int) -> kiss_icp.KissState:
    """Replicate a fresh KissState across a leading stream axis."""
    s = kiss_icp.init_state(cfg)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_streams,) + x.shape).copy(), s
    )


def batched_register_frame(states, scans: Scan, cfg: PipelineConfig):
    """vmapped register_frame over the leading stream axis."""
    return jax.vmap(lambda st, sc: kiss_icp.register_frame(st, sc, cfg))(states, scans)


@partial(jax.jit, static_argnames=("cfg",))
def batched_register_frame_jit(states, scans: Scan, cfg: PipelineConfig):
    return batched_register_frame(states, scans, cfg)


# donating variant (batched maps are S x the single-stream slabs; callers
# must not reuse `states` after the call)
batched_register_frame_step = jax.jit(
    lambda states, scans, cfg: batched_register_frame(states, scans, cfg),
    static_argnames=("cfg",),
    donate_argnums=(0,),
)


def perturb_scans(scan: Scan, key, num_streams: int, noise_sigma: float) -> Scan:
    """Monte-Carlo helper: replicate one scan across streams with iid point
    noise (perturbed-seed SLAM ensembles)."""
    keys = jax.random.split(key, num_streams)

    def one(k):
        noise = jax.random.normal(k, scan.xyz.shape, dtype=scan.xyz.dtype) * noise_sigma
        return scan._replace(xyz=scan.xyz + noise * scan.mask[:, None])

    return jax.vmap(one)(keys)
