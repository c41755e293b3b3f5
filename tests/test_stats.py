"""IQR semantics vs a numpy reimplementation of the reference's
median-of-halves method (common.hpp:22-63)."""

import jax.numpy as jnp
import numpy as np

from lidar_imu_slam_tpu.ops import stats


def ref_median(a):
    # nth_element median semantics (common.hpp:22-38) on sorted data
    n = len(a)
    half = n // 2
    if n % 2 == 0:
        return 0.5 * (a[half - 1] + a[half])
    return a[half]


def ref_iqr(vals):
    a = np.sort(vals)
    n = len(a)
    if n == 1:
        return 0.0, a[0], a[0]
    half = n // 2
    q1 = ref_median(a[:half])
    q3 = ref_median(a[half + n % 2:])
    return q1, q3, q3 - q1


class TestMaskedIqr:
    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(0)
        for n in (1, 2, 3, 4, 5, 10, 31, 100):
            vals = rng.uniform(0, 100, n)
            padded = np.concatenate([vals, np.full(16, 999.0)])
            mask = np.zeros(n + 16, bool)
            mask[:n] = True
            q1, q3, iqr = stats.masked_iqr(jnp.asarray(padded), jnp.asarray(mask))
            rq1, rq3, riqr = ref_iqr(vals)
            np.testing.assert_allclose(
                [float(q1), float(q3), float(iqr)], [rq1, rq3, riqr], atol=1e-12,
                err_msg=f"n={n}",
            )

    def test_inlier_mask_tukey(self):
        vals = np.array([1.0, 2, 3, 4, 5, 6, 7, 8, 9, 1000.0])
        mask = np.ones(10, bool)
        inliers = stats.iqr_inlier_mask(jnp.asarray(vals), jnp.asarray(mask))
        assert not bool(inliers[-1])  # the outlier is fenced out
        assert bool(jnp.all(inliers[:-1]))

    def test_mask_excludes_padding(self):
        vals = np.array([1.0, 2, 3, 1e12, 1e12])
        mask = np.array([True, True, True, False, False])
        q1, q3, iqr = stats.masked_iqr(jnp.asarray(vals), jnp.asarray(mask))
        assert float(q3) <= 3.0
