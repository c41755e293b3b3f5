"""Pallas TPU feasibility probes for the round-3 fused ICP kernel.

Answers (empirically, on the live chip):
  1. gather  — does Mosaic lower a vectorized VMEM gather (jnp.take /
               take_along_axis) and at what cost?
  2. gn      — timing of a fused inner-GN-loop kernel prototype vs the
               current XLA chain (distance reduce + one-hot + 16-sum + f64
               chol6/exp/compose per iteration).

Usage: python tools/exp_pallas.py {gather,gn} [--interpret]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, n=50):
    r = jax.block_until_ready(f(*args))
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / n * 1e3, r


# ---------------------------------------------------------------------------
# 1. gather probes
# ---------------------------------------------------------------------------


def probe_gather(interpret=False):
    C, W = 8192, 128  # table rows x lanes
    N = 2048  # queries

    table = jnp.arange(C * W, dtype=jnp.float32).reshape(C, W)
    idx = jnp.asarray(np.random.randint(0, C, size=(N,)), jnp.int32)

    # (a) jnp.take along axis 0 (row gather from VMEM)
    def k_take(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:, 0], axis=0)

    def run_take(table, idx):
        with jax.enable_x64(False):
            return pl.pallas_call(
                k_take,
                out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(table, idx[:, None])

    try:
        ms, out = timeit(jax.jit(run_take), table, idx)
        ok = np.allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])
        print(f"take(axis=0) VMEM row gather: {ms:.3f} ms  correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"take(axis=0) FAILED: {type(e).__name__}: {str(e)[:200]}")

    # (b) lane gather: table (8, C) gather along lanes with (8, N) idx
    table2 = jnp.arange(8 * C, dtype=jnp.float32).reshape(8, C)
    idx2 = jnp.asarray(np.random.randint(0, C, size=(8, N)), jnp.int32)

    def k_lane(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    def run_lane(table2, idx2):
        with jax.enable_x64(False):
            return pl.pallas_call(
                k_lane,
                out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(table2, idx2)

    try:
        ms, out = timeit(jax.jit(run_lane), table2, idx2)
        ok = np.allclose(
            np.asarray(out),
            np.take_along_axis(np.asarray(table2), np.asarray(idx2), axis=1),
        )
        print(f"take_along_axis(axis=1) lane gather: {ms:.3f} ms  correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"lane gather FAILED: {type(e).__name__}: {str(e)[:200]}")

    # (c) XLA baseline for the same row gather
    ms, _ = timeit(jax.jit(lambda t, i: t[i]), table, idx)
    print(f"XLA row gather baseline: {ms:.3f} ms")


# ---------------------------------------------------------------------------
# 2. fused GN inner loop prototype
# ---------------------------------------------------------------------------

NQ = 4096  # queries (multiple of 128)
NC = 80  # candidates per query (8 voxels x K=10)
QR = NQ // 128


def _gn_kernel(n_inner: int, kth_ref, maxd2_ref, qx_ref, qy_ref, qz_ref,
               qm_ref, cx_ref, cy_ref, cz_ref, out_ref):
    """Fused GN: n_inner iterations of NN + weighted 6x6 solve + exp + compose,
    entirely in VMEM/registers. All f32; coordinates are pre-centered."""
    kth = kth_ref[0]
    maxd2 = maxd2_ref[0]
    qx, qy, qz = qx_ref[:], qy_ref[:], qz_ref[:]
    qm = qm_ref[:]

    def iteration(carry):
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2, conv) = carry
        wx = r00 * qx + r01 * qy + r02 * qz + t0
        wy = r10 * qx + r11 * qy + r12 * qz + t1
        wz = r20 * qx + r21 * qy + r22 * qz + t2

        best = jnp.full((QR, 128), jnp.inf, jnp.float32)
        bx = jnp.zeros((QR, 128), jnp.float32)
        by = jnp.zeros((QR, 128), jnp.float32)
        bz = jnp.zeros((QR, 128), jnp.float32)
        for j in range(NC):
            cx = cx_ref[j]
            cy = cy_ref[j]
            cz = cz_ref[j]
            d2 = (cx - wx) ** 2 + (cy - wy) ** 2 + (cz - wz) ** 2
            hit = d2 < best
            best = jnp.where(hit, d2, best)
            bx = jnp.where(hit, cx, bx)
            by = jnp.where(hit, cy, by)
            bz = jnp.where(hit, cz, bz)

        corr = qm & (best < maxd2)
        rx = jnp.where(corr, wx - bx, 0.0)
        ry = jnp.where(corr, wy - by, 0.0)
        rz = jnp.where(corr, wz - bz, 0.0)
        res2 = rx * rx + ry * ry + rz * rz
        w = jnp.where(corr, (kth * kth) / (kth + res2) ** 2, 0.0)

        sx = jnp.where(corr, wx, 0.0)
        sy = jnp.where(corr, wy, 0.0)
        sz = jnp.where(corr, wz, 0.0)
        wsx, wsy, wsz = w * sx, w * sy, w * sz
        sw = jnp.sum(w)
        Sx, Sy, Sz = jnp.sum(wsx), jnp.sum(wsy), jnp.sum(wsz)
        sxx, syy, szz = jnp.sum(wsx * sx), jnp.sum(wsy * sy), jnp.sum(wsz * sz)
        sxy, sxz, syz = jnp.sum(wsx * sy), jnp.sum(wsx * sz), jnp.sum(wsy * sz)
        trx, try_, trz = jnp.sum(w * rx), jnp.sum(w * ry), jnp.sum(w * rz)
        bxs = jnp.sum(wsy * rz - wsz * ry)
        bys = jnp.sum(wsz * rx - wsx * rz)
        bzs = jnp.sum(wsx * ry - wsy * rx)

        # 6x6 normal equations, unrolled f32 Cholesky solve of A xi = -b
        A = [
            [sw, 0.0, 0.0, 0.0, Sz, -Sy],
            [0.0, sw, 0.0, -Sz, 0.0, Sx],
            [0.0, 0.0, sw, Sy, -Sx, 0.0],
            [0.0, -Sz, Sy, syy + szz, -sxy, -sxz],
            [Sz, 0.0, -Sx, -sxy, sxx + szz, -syz],
            [-Sy, Sx, 0.0, -sxz, -syz, sxx + syy],
        ]
        b = [-trx, -try_, -trz, -bxs, -bys, -bzs]
        dmax = jnp.maximum(
            jnp.maximum(jnp.maximum(A[0][0], A[3][3]),
                        jnp.maximum(A[4][4], A[5][5])), 1.0)
        ridge = 1e-7 * dmax
        L = [[None] * 6 for _ in range(6)]
        for jj in range(6):
            d = A[jj][jj] + ridge
            for kk in range(jj):
                d = d - L[jj][kk] * L[jj][kk]
            L[jj][jj] = jnp.sqrt(jnp.maximum(d, 1e-20))
            inv = 1.0 / L[jj][jj]
            for ii in range(jj + 1, 6):
                s = A[ii][jj]
                for kk in range(jj):
                    s = s - L[ii][kk] * L[jj][kk]
                L[ii][jj] = s * inv
        y = [None] * 6
        for ii in range(6):
            acc = b[ii]
            for kk in range(ii):
                acc = acc - L[ii][kk] * y[kk]
            y[ii] = acc / L[ii][ii]
        xi = [None] * 6
        for ii in reversed(range(6)):
            acc = y[ii]
            for kk in range(ii + 1, 6):
                acc = acc - L[kk][ii] * xi[kk]
            xi[ii] = acc / L[ii][ii]

        vx, vy, vz, ox, oy, oz = xi
        ncorr = jnp.sum(corr.astype(jnp.float32))
        ok = ncorr >= 20.0
        step2 = vx * vx + vy * vy + vz * vz + ox * ox + oy * oy + oz * oz
        # freeze on starvation or convergence
        upd = ok & (conv < 0.5)
        scale = jnp.where(upd, 1.0, 0.0)
        vx, vy, vz = vx * scale, vy * scale, vz * scale
        ox, oy, oz = ox * scale, oy * scale, oz * scale

        # Rodrigues (f32, tiny angles): R = I + a W + b2 W^2
        sq = ox * ox + oy * oy + oz * oz
        th = jnp.sqrt(jnp.maximum(sq, 1e-30))
        small = sq < 1e-12
        a = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(th) / th)
        b2 = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(sq, 1e-30))
        c3 = jnp.where(small, 1.0 / 6.0, (1.0 - a) / jnp.maximum(sq, 1e-30))
        e00 = 1.0 + b2 * (ox * ox - sq)
        e01 = a * -oz + b2 * ox * oy
        e02 = a * oy + b2 * ox * oz
        e10 = a * oz + b2 * ox * oy
        e11 = 1.0 + b2 * (oy * oy - sq)
        e12 = a * -ox + b2 * oy * oz
        e20 = a * -oy + b2 * ox * oz
        e21 = a * ox + b2 * oy * oz
        e22 = 1.0 + b2 * (oz * oz - sq)
        # V @ v for translation (left Jacobian)
        v00 = 1.0 + c3 * (ox * ox - sq)
        v01 = b2 * -oz + c3 * ox * oy
        v02 = b2 * oy + c3 * ox * oz
        v10 = b2 * oz + c3 * ox * oy
        v11 = 1.0 + c3 * (oy * oy - sq)
        v12 = b2 * -ox + c3 * oy * oz
        v20 = b2 * -oy + c3 * ox * oz
        v21 = b2 * ox + c3 * oy * oz
        v22 = 1.0 + c3 * (oz * oz - sq)
        dt0 = v00 * vx + v01 * vy + v02 * vz
        dt1 = v10 * vx + v11 * vy + v12 * vz
        dt2 = v20 * vx + v21 * vy + v22 * vz

        # compose: new = E @ old
        n00 = e00 * r00 + e01 * r10 + e02 * r20
        n01 = e00 * r01 + e01 * r11 + e02 * r21
        n02 = e00 * r02 + e01 * r12 + e02 * r22
        n10 = e10 * r00 + e11 * r10 + e12 * r20
        n11 = e10 * r01 + e11 * r11 + e12 * r21
        n12 = e10 * r02 + e11 * r12 + e12 * r22
        n20 = e20 * r00 + e21 * r10 + e22 * r20
        n21 = e20 * r01 + e21 * r11 + e22 * r21
        n22 = e20 * r02 + e21 * r12 + e22 * r22
        m0 = e00 * t0 + e01 * t1 + e02 * t2 + dt0
        m1 = e10 * t0 + e11 * t1 + e12 * t2 + dt1
        m2 = e20 * t0 + e21 * t1 + e22 * t2 + dt2

        conv = jnp.where(
            (~ok) | (jnp.sqrt(step2) < 5e-4), 1.0, conv
        )
        return (n00, n01, n02, n10, n11, n12, n20, n21, n22, m0, m1, m2, conv)

    carry = (
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0),
    )
    for _ in range(n_inner):
        carry = iteration(carry)
    (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2, conv) = carry
    vals = jnp.stack([r00, r01, r02, r10, r11, r12, r20, r21, r22,
                      t0, t1, t2, conv])
    out_ref[0, :13] = vals


def probe_gn(interpret=False):
    rng = np.random.default_rng(0)
    q = rng.uniform(-40, 40, size=(NQ, 3)).astype(np.float32)
    # candidates: the true point + noise in slot 0..NC
    cand = q[None, :, :] + rng.normal(0, 0.3, size=(NC, NQ, 3)).astype(np.float32)
    cx = jnp.asarray(cand[:, :, 0].reshape(NC, QR, 128))
    cy = jnp.asarray(cand[:, :, 1].reshape(NC, QR, 128))
    cz = jnp.asarray(cand[:, :, 2].reshape(NC, QR, 128))
    qx = jnp.asarray(q[:, 0].reshape(QR, 128)) + 0.3
    qy = jnp.asarray(q[:, 1].reshape(QR, 128)) - 0.2
    qz = jnp.asarray(q[:, 2].reshape(QR, 128)) + 0.1
    qm = jnp.ones((QR, 128), bool)
    kth = jnp.full((1,), 0.5, jnp.float32)
    maxd2 = jnp.full((1,), 4.0, jnp.float32)

    n_inner = 8

    def run(kth, maxd2, qx, qy, qz, qm, cx, cy, cz):
        with jax.enable_x64(False):
            return pl.pallas_call(
                functools.partial(_gn_kernel, n_inner),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(kth, maxd2, qx, qy, qz, qm, cx, cy, cz)

    f = jax.jit(run)
    try:
        ms, out = timeit(f, kth, maxd2, qx, qy, qz, qm, cx, cy, cz, n=100)
        o = np.asarray(out)[0]
        print(f"fused GN kernel ({n_inner} iters): {ms:.3f} ms")
        print(f"  t=({o[9]:+.4f},{o[10]:+.4f},{o[11]:+.4f}) expect ~(-0.3,+0.2,-0.1)")
        print(f"  conv={o[12]}")
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        print(f"fused GN FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gather"
    interp = "--interpret" in sys.argv
    if which == "gather":
        probe_gather(interp)
    elif which == "gn":
        probe_gn(interp)
    else:
        probe_gather(interp)
        probe_gn(interp)
