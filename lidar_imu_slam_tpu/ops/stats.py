"""Masked order statistics (replaces reference include/common.hpp:18-64).

The reference computes IQR with the "median of halves" method:
  q1 = median(a[0 : n/2]),  q3 = median(a[n/2 + n%2 : n])
on the sorted data, where median of an even-length range averages the two
middle elements (common.hpp:22-38). Implemented here exactly, on padded
arrays with validity masks (invalid entries sort to +inf and are excluded
by construction because indices are computed from the valid count).
"""

from __future__ import annotations

import jax.numpy as jnp

IQR_TUKEY = 1.25  # reference common.hpp:15 (IQR_TUCHEY)


def _median_of_sorted_range(a: jnp.ndarray, start: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Median of a[start : start+size] for sorted `a`; size is a traced scalar >= 1."""
    half = size // 2
    mid = jnp.take(a, start + half, mode="clip")
    lo = jnp.take(a, start + jnp.maximum(half - 1, 0), mode="clip")
    even = (size % 2) == 0
    return jnp.where(even, 0.5 * (lo + mid), mid)


def masked_iqr(values: jnp.ndarray, mask: jnp.ndarray):
    """Return (q1, q3, iqr) of `values[mask]` with reference median-of-halves semantics.

    values: (N,) float array; mask: (N,) bool. Requires at least one valid entry;
    with a single valid entry returns (0, v, v) to match common.hpp:50-52.
    """
    big = jnp.asarray(jnp.inf, dtype=values.dtype)
    a = jnp.sort(jnp.where(mask, values, big))
    n = jnp.sum(mask).astype(jnp.int32)

    half = n // 2
    q1 = _median_of_sorted_range(a, jnp.zeros_like(n), jnp.maximum(half, 1))
    q3_start = half + n % 2
    q3 = _median_of_sorted_range(a, q3_start, jnp.maximum(n - q3_start, 1))

    single = n <= 1
    v0 = a[0]
    q1 = jnp.where(single, jnp.zeros_like(v0), q1)
    q3 = jnp.where(single, v0, q3)
    return q1, q3, q3 - q1


def iqr_inlier_mask(values: jnp.ndarray, mask: jnp.ndarray, k: float = IQR_TUKEY) -> jnp.ndarray:
    """Tukey-fence inlier mask (reference icp.cpp:88-124): low <= v <= high."""
    q1, q3, iqr = masked_iqr(values, mask)
    low = q1 - k * iqr
    high = q3 + k * iqr
    return mask & (values >= low) & (values <= high)
