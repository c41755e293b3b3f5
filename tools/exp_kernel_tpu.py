"""Minimal real-TPU smoke test for the fused GN kernel (single + batched).

Iterating on Mosaic lowering restrictions costs one run per error; this
repro compiles in seconds (tiny shapes) vs minutes for the full lab.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)

from lidar_imu_slam_tpu.ops.pallas import icp_gn  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    qr, nc = 2, 8
    n = qr * 128
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 5.0
    q = jnp.asarray(pts.T.reshape(3, qr, 128))
    qmask = jnp.ones((qr, 128), jnp.float32)
    # candidates: the true points jittered, one good candidate per slot
    cand = np.full((3, nc, qr, 128), np.inf, np.float32)
    for j in range(nc):
        cand[:, j] = pts.T.reshape(3, qr, 128) + rng.normal(
            size=(3, qr, 128)
        ).astype(np.float32) * (0.01 if j == 0 else 3.0)
    cand = jnp.asarray(cand)
    scal = jnp.asarray([0.3, 1.0, 1e-4, 20.0, 2.0, 0.25, 0.0, 0.0], jnp.float32)

    out = icp_gn.fused_gn(q, qmask, cand, scal, 4, False)
    print("single:", [np.asarray(o) for o in out[2:]])
    print("R=", np.asarray(out[0]).round(4))
    print("t=", np.asarray(out[1]).round(4))

    s = 3
    qb = jnp.broadcast_to(q[None], (s,) + q.shape)
    qmb = jnp.broadcast_to(qmask[None], (s,) + qmask.shape)
    cb = jnp.broadcast_to(cand[None], (s,) + cand.shape)
    sb = jnp.broadcast_to(scal[None], (s, 8))
    outb = icp_gn.fused_gn_batched(qb, qmb, cb, sb, 4, False)
    print("batched ncorr:", np.asarray(outb[2]))
    print("OK")


if __name__ == "__main__":
    main()
