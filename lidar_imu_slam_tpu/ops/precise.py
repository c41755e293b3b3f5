"""Precision-safe scalar transcendentals.

XLA lowers rank-0 / size-1 f64 transcendentals (sin, cos, tan, exp, arctan2,
arccos, ...) through a float32 fast path on CPU (~1e-8..1e-7 abs error — one
f32 ulp), while arrays of size >= 2 take the accurate vectorized lowering.
The estimation core composes thousands of scalar rotations per trajectory, so
everything here pads scalar operands to size 2 before dispatch. Cost: one
extra lane per call — free on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _scalar_safe(fn, pad_value=0.0):
    def wrapped(x):
        if jnp.ndim(x) == 0:
            return fn(jnp.stack([x, jnp.full_like(x, pad_value)]))[0]
        if x.size == 1:
            flat = x.reshape(-1)
            pad = jnp.concatenate([flat, jnp.full_like(flat, pad_value)])
            return fn(pad)[0].reshape(x.shape)
        return fn(x)

    return wrapped


sin_ = _scalar_safe(jnp.sin)
cos_ = _scalar_safe(jnp.cos)
tan_ = _scalar_safe(jnp.tan)
exp_ = _scalar_safe(jnp.exp)
arccos_ = _scalar_safe(jnp.arccos, pad_value=1.0)
arcsin_ = _scalar_safe(jnp.arcsin)


def atan2_(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    if jnp.ndim(y) == 0:
        yy = jnp.stack([y, jnp.zeros_like(y)])
        xx = jnp.stack([x, jnp.ones_like(x)])
        return jnp.arctan2(yy, xx)[0]
    if y.size == 1:
        fy, fx = y.reshape(-1), x.reshape(-1)
        yy = jnp.concatenate([fy, jnp.zeros_like(fy)])
        xx = jnp.concatenate([fx, jnp.ones_like(fx)])
        return jnp.arctan2(yy, xx)[0].reshape(y.shape)
    return jnp.arctan2(y, x)
