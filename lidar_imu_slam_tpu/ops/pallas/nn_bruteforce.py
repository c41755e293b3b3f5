"""Pallas TPU kernel: streaming brute-force nearest neighbor.

The hash-map NN path is bound by random HBM row gathers (~20 ns/row). This
kernel takes the opposite, TPU-native route: stream the WHOLE map point pool
through VMEM in big sequential tiles (full HBM bandwidth, no random access)
and keep a running (min distance, argmin) per query — the flash-attention
accumulation pattern applied to nearest-neighbor search.

Layout: the pool is (3, M) — coordinate-major so the M axis lands on TPU
lanes; invalid/padding entries carry +inf coordinates and can never win the
argmin. Queries are processed in VMEM-resident tiles of QT; each grid step
loads an (3, MT) pool tile and updates the running best via a (QT, MT)
VPU distance block.

Exact global NN (superset of the reference's 27-neighborhood search —
correspondences are still distance-gated by the caller). Useful when the
source is dense or the map pool is small enough that streaming beats
gathering; `ops.voxel_map.nearest_neighbors` remains the hash backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 256  # queries per tile (sublane-friendly)
MT = 8192  # pool points per tile (lane-major)


def _kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
            best_d2_ref, best_idx_ref, acc_d2, acc_idx):
    m_step = pl.program_id(1)
    n_m = pl.num_programs(1)

    @pl.when(m_step == 0)
    def _init():
        acc_d2[:] = jnp.full((QT, 1), jnp.inf, jnp.float32)
        acc_idx[:] = jnp.zeros((QT, 1), jnp.int32)

    dx = px_ref[0, :][None, :] - qx_ref[:, 0][:, None]  # (QT, MT)
    dy = py_ref[0, :][None, :] - qy_ref[:, 0][:, None]
    dz = pz_ref[0, :][None, :] - qz_ref[:, 0][:, None]
    d2 = dx * dx + dy * dy + dz * dz

    tile_min = jnp.min(d2, axis=1)  # (QT,)
    tile_arg = jax.lax.argmin(d2, axis=1, index_dtype=jnp.int32)
    # keep all scalar index math in int32: under jax_enable_x64 a promoted
    # int64 scalar fails Mosaic legalization
    offset = m_step.astype(jnp.int32) * jnp.int32(MT)

    better = tile_min < acc_d2[:, 0]
    acc_d2[:, 0] = jnp.where(better, tile_min, acc_d2[:, 0])
    acc_idx[:, 0] = jnp.where(better, tile_arg + offset, acc_idx[:, 0])

    @pl.when(m_step == n_m - 1)
    def _flush():
        best_d2_ref[:, 0] = acc_d2[:, 0]
        best_idx_ref[:, 0] = acc_idx[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_bruteforce(queries, pool, interpret: bool = False):
    """queries (N, 3) f32; pool (3, M) f32 with +inf for invalid entries.

    Returns (d2 (N,) f32, idx (N,) i32): squared distance and pool index of
    each query's global nearest neighbor. N must be a multiple of QT and M a
    multiple of MT (pad queries with anything — masked by the caller — and
    the pool with +inf).
    """
    n = queries.shape[0]
    m = pool.shape[1]
    assert n % QT == 0, f"pad queries to a multiple of {QT} (got {n})"
    assert m % MT == 0, f"pad pool to a multiple of {MT} (got {m})"

    q = queries.astype(jnp.float32)
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]  # (N, 1) each
    px = pool[0:1, :]
    py = pool[1:2, :]
    pz = pool[2:3, :]

    grid = (n // QT, m // MT)
    q_spec = pl.BlockSpec((QT, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, MT), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((QT, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    # Mosaic fails to legalize grid scalars when jax_enable_x64 is on
    # (i64 func.return); the kernel is pure f32/i32, so trace it with x64
    # locally disabled.
    with jax.enable_x64(False):
        return _call(grid, q_spec, p_spec, out_spec, n, interpret,
                     qx, qy, qz, px, py, pz)


def _call(grid, q_spec, p_spec, out_spec, n, interpret, qx, qy, qz, px, py, pz):
    d2, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[q_spec, q_spec, q_spec, p_spec, p_spec, p_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((QT, 1), jnp.float32),
            pltpu.VMEM((QT, 1), jnp.int32),
        ],
        interpret=interpret,
    )(qx, qy, qz, px, py, pz)
    return d2[:, 0], idx[:, 0]


def pool_from_map(m, cfg):
    """Build the (3, M) +inf-padded pool from a VoxelMap (M = capacity * K,
    rounded up to a multiple of MT)."""
    k = cfg.max_points_per_voxel
    c = cfg.capacity
    pts = m.points.reshape(c * k, 3)
    live = (
        jnp.arange(c * k, dtype=jnp.int32) % k
    ) < jnp.repeat(m.npts, k)
    occ = jnp.repeat(m.keys >= 0, k)
    valid = live & occ
    total = ((c * k + MT - 1) // MT) * MT
    pool = jnp.full((3, total), jnp.inf, jnp.float32)
    coords = jnp.where(valid[:, None], pts, jnp.inf).astype(jnp.float32)
    pool = pool.at[:, : c * k].set(coords.T)
    return pool
