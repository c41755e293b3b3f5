"""IMU preprocessing and static initialization.

Replaces the reference's `frame::Imu` callback accumulator
(reference src/sensors/imu/frame.cpp) with functional running statistics:

  * NED/ENU axis remap of raw acceleration (imu/frame.cpp:21-30)
  * running mean of acceleration + sample-period estimate over the first
    `reset` samples (imu/frame.cpp:17-46)
  * static initialization over `max_init_count` samples: running mean and
    variance of acc and gyro, gravity direction estimate
    (imu/frame.cpp:72-118, max_init_count=200 at :6)
  * lidar-imu time compensation is a host-side subtraction when packing
    packets (imu/frame.cpp:52-55)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GRAVITY, ImuConfig


def remap_axes(acc: jnp.ndarray, coordinate: str) -> jnp.ndarray:
    """NED keeps (x,y,z); ENU remaps to (y, x, -z) (imu/frame.cpp:21-30)."""
    if coordinate == "enu":
        return jnp.stack([acc[..., 1], acc[..., 0], -acc[..., 2]], axis=-1)
    return acc


class ImuInitState(NamedTuple):
    count: jnp.ndarray  # () i32 — samples consumed (init_iter_num)
    mean_acc: jnp.ndarray  # (3,) f64
    mean_gyro: jnp.ndarray  # (3,) f64
    cov_acc: jnp.ndarray  # (3,) f64 diagonal
    cov_gyro: jnp.ndarray  # (3,) f64 diagonal
    done: jnp.ndarray  # () bool


def init_state() -> ImuInitState:
    # distinct buffers per field (donation rejects aliased arguments)
    return ImuInitState(
        count=jnp.int32(0),
        mean_acc=jnp.zeros(3, jnp.float64),
        mean_gyro=jnp.zeros(3, jnp.float64),
        cov_acc=jnp.zeros(3, jnp.float64),
        cov_gyro=jnp.zeros(3, jnp.float64),
        done=jnp.asarray(False),
    )


def accumulate(state: ImuInitState, gyro, acc, mask, cfg: ImuConfig) -> ImuInitState:
    """Consume a padded packet of samples with the reference's running
    mean/variance recursion (imu/frame.cpp:94-111):

      mean += (x - mean) / N
      cov   = cov (N-1)/N + (x - mean)^2 (N-1)/N^2
    """

    def step(s, inp):
        g, a, ok = inp
        n = s.count + 1
        nf = n.astype(jnp.float64)
        mean_acc = s.mean_acc + (a - s.mean_acc) / nf
        mean_gyro = s.mean_gyro + (g - s.mean_gyro) / nf
        cov_acc = s.cov_acc * (nf - 1.0) / nf + (a - mean_acc) ** 2 * (nf - 1.0) / nf**2
        cov_gyro = s.cov_gyro * (nf - 1.0) / nf + (g - mean_gyro) ** 2 * (nf - 1.0) / nf**2
        s2 = ImuInitState(n, mean_acc, mean_gyro, cov_acc, cov_gyro, s.done)
        return jax.tree.map(lambda new, old: jnp.where(ok & ~s.done, new, old), s2, s), None

    state, _ = jax.lax.scan(step, state, (gyro, acc, mask))
    done = state.count >= cfg.max_init_count
    # on completion the acc covariance is rescaled to unit gravity
    # (imu/frame.cpp:131)
    scale = (GRAVITY / jnp.linalg.norm(state.mean_acc)) ** 2
    cov_acc = jnp.where(done & ~state.done, state.cov_acc * scale, state.cov_acc)
    return state._replace(done=done, cov_acc=cov_acc)


def gravity_estimate(state: ImuInitState) -> jnp.ndarray:
    """calc_grav = -mean_acc / |mean_acc| * g (imu/frame.cpp:114)."""
    return -state.mean_acc / jnp.linalg.norm(state.mean_acc) * GRAVITY
