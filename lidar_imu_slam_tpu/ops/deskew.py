"""Motion compensation kernels.

Constant-velocity deskew replaces the reference's TBB per-point loop
(reference src/sensors/lidar/helpers/deskew.cpp:10-29): every point moves by
exp((tau_i - 0.5) * twist) where twist = log(T_start^-1 T_end) and tau is the
normalized in-scan time. Here the per-point SE(3) exponential is evaluated
batched on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie


def constant_velocity_deskew(
    points: jnp.ndarray,  # (N, 3) f32, sensor frame
    tau: jnp.ndarray,  # (N,) f32 normalized time in [0, 1]
    pose_start: jnp.ndarray,  # (4, 4) f64
    pose_end: jnp.ndarray,  # (4, 4) f64
    mid_pose_timestamp: float = 0.5,  # reference deskew.hpp ctor
) -> jnp.ndarray:
    """Batched exp((tau - mid) * twist) @ p (reference deskew.cpp:20-26)."""
    twist = lie.delta_pose(pose_start, pose_end)  # (6,) f64
    scale = (tau.astype(jnp.float64) - mid_pose_timestamp)[:, None]
    motions = lie.se3_exp(scale * twist[None, :])  # (N, 4, 4)
    p = points.astype(jnp.float64)
    out = (motions[:, :3, :3] @ p[:, :, None])[:, :, 0] + motions[:, :3, 3]
    return out.astype(points.dtype)
