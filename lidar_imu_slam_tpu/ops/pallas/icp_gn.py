"""Fused Gauss-Newton ICP inner loop as ONE Pallas TPU kernel.

Replaces the XLA inner loop of `ops.icp.icp_registration` (per iteration:
NN distance reduce -> one-hot winner extraction -> 16 masked reductions ->
f64 unrolled Cholesky -> polynomial exp -> compose, each a separate fusion
with dispatch/sync overhead; profiled ~0.5 ms/GN-iteration on a v5e) with a
single kernel that keeps the candidate blocks in VMEM and runs `n_inner`
complete GN iterations back to back (measured 0.63 ms for 8 iterations at
4096 queries x 80 candidates — ~6x per iteration, one dispatch).

This is the TPU re-design of the reference's hot loop
(reference src/sensors/lidar/helpers/registration.cpp:43-130 +
voxel_hash_map.cpp:104-130): the TBB parallel_reduce becomes VPU reductions
over VMEM-resident tiles, the Eigen LDLT a fully unrolled scalar Cholesky,
Sophus exp a scalar Rodrigues — all fused, zero HBM traffic after the
initial candidate load.

Precision: everything is f32 on CENTERED coordinates (the caller subtracts
an anchor near the data from queries and candidates, so coordinates are
local ~+-range). The 6x6 normal equations are Jacobi-preconditioned (the
rotational block scales with coordinate^2; a raw f32 Cholesky at 80 m
coordinates loses ~4 digits). Validated against the f64 XLA path
(tests/test_pallas_gn.py).

Layouts (QR = n_queries // 128):
  q      (3, QR, 128) f32   centered query coordinates (x, y, z planes)
  qmask  (QR, 128)    f32   1.0 = valid query
  cand   (3, NC, QR, 128) f32  candidate coordinates; +inf = invalid slot
  scal   (8,) f32: [kernel_th, max_d2, est_th, min_corr, max_step,
                    stale_d2, unused, unused]
Output row (128,) f32: [R row-major (9), t (3), n_corr, rms, iters, flags]
  flags = converged + 2 * stale; `stale` means the accumulated translation
  drifted beyond stale_d2 (candidates need a refetch) — further iterations
  freeze, mirroring the XLA path's inner-loop exit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _gn_iterations(n_inner, nc, scal, qx, qy, qz, qm, cand_at,
                   track_m: bool = False):
    """n_inner GN iterations. `cand_at(k, j)` reads candidate plane k
    (0=x,1=y,2=z) for slot j, shaped like qx. Returns the 16 output scalars
    as one stacked (16,) f32 — plus, with `track_m`, the 9 entries of
    M = I - R_total accumulated exactly from the small Rodrigues parts
    (M @ anchor de-centers the translation without the catastrophic
    I - R cancellation at f32: entries of M are O(theta), so the relative
    error stays ~1e-7 of theta instead of ~1e-7 of 1)."""
    kth, maxd2, est_th = scal[0], scal[1], scal[2]
    min_corr, max_step, stale_d2 = scal[3], scal[4], scal[5]

    def iteration(carry):
        (r00, r01, r02, r10, r11, r12, r20, r21, r22,
         t0, t1, t2, conv, stale, ncorr_o, rms_o, iters, M) = carry
        active = (conv < 0.5) & (stale < 0.5)

        wx = r00 * qx + r01 * qy + r02 * qz + t0
        wy = r10 * qx + r11 * qy + r12 * qz + t1
        wz = r20 * qx + r21 * qy + r22 * qz + t2

        def nn_body(j, nn):
            best, bx, by, bz = nn
            cx = cand_at(0, j)
            cy = cand_at(1, j)
            cz = cand_at(2, j)
            d2 = (cx - wx) ** 2 + (cy - wy) ** 2 + (cz - wz) ** 2
            hit = d2 < best
            return (
                jnp.where(hit, d2, best),
                jnp.where(hit, cx, bx),
                jnp.where(hit, cy, by),
                jnp.where(hit, cz, bz),
            )

        shape = wx.shape
        best, bx, by, bz = jax.lax.fori_loop(
            0, nc, nn_body,
            (jnp.full(shape, jnp.inf, jnp.float32),
             jnp.zeros(shape, jnp.float32),
             jnp.zeros(shape, jnp.float32),
             jnp.zeros(shape, jnp.float32)),
        )

        corr = (qm > 0.5) & (best < maxd2)
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
        g0, g1, g2 = jnp.sum(w * rx), jnp.sum(w * ry), jnp.sum(w * rz)
        g3 = jnp.sum(wsy * rz - wsz * ry)
        g4 = jnp.sum(wsz * rx - wsx * rz)
        g5 = jnp.sum(wsx * ry - wsy * rx)

        ncorr = jnp.sum(corr.astype(jnp.float32))
        rms = jnp.sqrt(jnp.sum(jnp.where(corr, best, 0.0))
                       / jnp.maximum(ncorr, 1.0))

        # Jacobi preconditioning with s = RMS coordinate magnitude:
        # solve (D A D) y = D b, xi = D y with D = diag(1,1,1,1/s,1/s,1/s)
        s2 = (sxx + syy + szz) / jnp.maximum(sw, 1e-20)
        inv_s = jax.lax.rsqrt(jnp.maximum(s2, 1e-12))
        z = sw * 0.0  # traced zero

        # B = -hat([Sx,Sy,Sz]); D = tr(ss) I - ss
        A = [
            [sw, z, z, z, Sz * inv_s, -Sy * inv_s],
            [z, sw, z, -Sz * inv_s, z, Sx * inv_s],
            [z, z, sw, Sy * inv_s, -Sx * inv_s, z],
            [z, -Sz * inv_s, Sy * inv_s,
             (syy + szz) * inv_s * inv_s, -sxy * inv_s * inv_s,
             -sxz * inv_s * inv_s],
            [Sz * inv_s, z, -Sx * inv_s,
             -sxy * inv_s * inv_s, (sxx + szz) * inv_s * inv_s,
             -syz * inv_s * inv_s],
            [-Sy * inv_s, Sx * inv_s, z,
             -sxz * inv_s * inv_s, -syz * inv_s * inv_s,
             (sxx + syy) * inv_s * inv_s],
        ]
        b = [-g0, -g1, -g2, -g3 * inv_s, -g4 * inv_s, -g5 * inv_s]

        dmax = jnp.maximum(jnp.maximum(A[0][0], A[3][3]),
                           jnp.maximum(A[4][4], A[5][5]))
        ridge = 1e-6 * jnp.maximum(dmax, 1e-12)
        L = [[None] * 6 for _ in range(6)]
        for jj in range(6):
            d = A[jj][jj] + ridge
            for kk in range(jj):
                d = d - L[jj][kk] * L[jj][kk]
            L[jj][jj] = jnp.sqrt(jnp.maximum(d, 1e-25))
            inv = 1.0 / L[jj][jj]
            for ii in range(jj + 1, 6):
                acc = A[ii][jj]
                for kk in range(jj):
                    acc = acc - L[ii][kk] * L[jj][kk]
                L[ii][jj] = acc * inv
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
        vx, vy, vz = xi[0], xi[1], xi[2]
        ox, oy, oz = xi[3] * inv_s, xi[4] * inv_s, xi[5] * inv_s

        ok = ncorr >= min_corr
        step = jnp.sqrt(vx * vx + vy * vy + vz * vz
                        + ox * ox + oy * oy + oz * oz)
        clamp = jnp.where(
            step > max_step, max_step / jnp.maximum(step, 1e-20), 1.0
        )
        upd = active & ok
        scale = jnp.where(upd, clamp, 0.0)
        vx, vy, vz = vx * scale, vy * scale, vz * scale
        ox, oy, oz = ox * scale, oy * scale, oz * scale

        # Rodrigues R = I + a W + b2 W^2 and left Jacobian V (scalar f32)
        sq = ox * ox + oy * oy + oz * oz
        th = jnp.sqrt(jnp.maximum(sq, 1e-30))
        small = sq < 1e-12
        safe_sq = jnp.maximum(sq, 1e-30)
        a = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(th) / th)
        b2 = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(th)) / safe_sq)
        c3 = jnp.where(small, 1.0 / 6.0, (1.0 - a) / safe_sq)
        e00 = 1.0 + b2 * (ox * ox - sq)
        e01 = a * -oz + b2 * ox * oy
        e02 = a * oy + b2 * ox * oz
        e10 = a * oz + b2 * ox * oy
        e11 = 1.0 + b2 * (oy * oy - sq)
        e12 = a * -ox + b2 * oy * oz
        e20 = a * -oy + b2 * ox * oz
        e21 = a * ox + b2 * oy * oz
        e22 = 1.0 + b2 * (oz * oz - sq)
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

        if track_m:
            # M' = M + D @ R_prev with D = I - E = -(a W + b2 W^2); the
            # diagonal 1 - e_ii is exact by Sterbenz (e_ii near 1), the
            # off-diagonals are the small Rodrigues terms directly
            d00, d11, d22 = 1.0 - e00, 1.0 - e11, 1.0 - e22
            D = ((d00, -e01, -e02), (-e10, d11, -e12), (-e20, -e21, d22))
            Rp = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))
            M = tuple(
                tuple(
                    M[i][j]
                    + D[i][0] * Rp[0][j] + D[i][1] * Rp[1][j]
                    + D[i][2] * Rp[2][j]
                    for j in range(3)
                )
                for i in range(3)
            )

        ncorr_o = jnp.where(active, ncorr, ncorr_o)
        rms_o = jnp.where(active, rms, rms_o)
        iters = iters + jnp.where(active, 1.0, 0.0)
        conv = jnp.where(
            active & ((~ok) | (jnp.minimum(step, max_step) < est_th)),
            1.0, conv,
        )
        drift2 = m0 * m0 + m1 * m1 + m2 * m2
        stale = jnp.where((conv < 0.5) & (drift2 > stale_d2), 1.0, stale)
        return (n00, n01, n02, n10, n11, n12, n20, n21, n22,
                m0, m1, m2, conv, stale, ncorr_o, rms_o, iters, M)

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    m_init = ((zero, zero, zero),) * 3
    carry = (one, zero, zero, zero, one, zero, zero, zero, one,
             zero, zero, zero, zero, zero, zero, zero, zero, m_init)
    for _ in range(n_inner):
        carry = iteration(carry)
    (r00, r01, r02, r10, r11, r12, r20, r21, r22,
     t0, t1, t2, conv, stale, ncorr, rms, iters, M) = carry
    vals = jnp.stack([r00, r01, r02, r10, r11, r12, r20, r21, r22,
                      t0, t1, t2, ncorr, rms, iters, conv + 2.0 * stale])
    if track_m:
        return vals, M
    return vals


def _kernel(n_inner, nc, scal_ref, q_ref, qm_ref, c_ref, out_ref):
    # SMEM only supports scalar loads on real TPU (Mosaic): index per element
    scal = tuple(scal_ref[i] for i in range(6))
    vals = _gn_iterations(
        n_inner, nc, scal,
        q_ref[0], q_ref[1], q_ref[2], qm_ref[:],
        lambda k, j: c_ref[k, j],
    )
    out_ref[0, :16] = vals


@functools.partial(jax.jit, static_argnames=("n_inner", "interpret"))
def fused_gn(q, qmask, cand, scal, n_inner: int, interpret: bool = False):
    """Run `n_inner` fused GN iterations (see module docstring for layouts).

    Returns (R (3,3) f32, t (3,) f32, n_corr f32, rms f32, iters f32,
             converged bool, stale bool).
    """
    nc = cand.shape[1]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, n_inner, nc),
            out_shape=jax.ShapeDtypeStruct((1, LANE), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(scal.astype(jnp.float32), q, qmask, cand)
    return _unpack(out[0])


def _unpack(row):
    R = row[:9].reshape(3, 3)
    t = row[9:12]
    flags = row[15]
    return (R, t, row[12], row[13], row[14],
            flags % 2.0 >= 1.0, flags >= 2.0)


def _kernel_batched(n_inner, nc, scal_ref, q_ref, qm_ref, c_ref, out_ref):
    # scal and out ride as FULL arrays indexed by the grid position: their
    # natural (1, 8)/(1, 128) blocks violate Mosaic's (8, 128)-divisible
    # block rule for non-minor-complete shapes
    s = pl.program_id(0)
    scal = tuple(scal_ref[s, i] for i in range(6))
    vals = _gn_iterations(
        n_inner, nc, scal,
        q_ref[0, 0], q_ref[0, 1], q_ref[0, 2], qm_ref[0],
        lambda k, j: c_ref[0, k, j],
    )
    out_ref[s, 0, :16] = vals


def _kernel_carry(n_inner, nc, scal_ref, carry_ref, q_ref, qm_ref, c_ref,
                  out_ref):
    """`_kernel` plus in-kernel de-centering and composition with a carried
    world pose — the whole ICP outer-round pose update in one dispatch.

    carry (18,) f32 SMEM: [R_carry row-major 9 | t_carry hi 3 | t_carry lo 3
    | anchor 3]. Queries/candidates arrive CENTERED on `anchor`; the carried
    translation rides as a float-float pair (ops/pallas/ffmath.py) so km-
    scale world positions keep ~2^-48 relative precision through the
    per-round composition (T_world = Trans(a) T_centered Trans(-a) followed
    by T_out = T_delta @ T_carry)."""
    from . import ffmath as ff

    scal = tuple(scal_ref[i] for i in range(6))
    vals, M = _gn_iterations(
        n_inner, nc, scal,
        q_ref[0], q_ref[1], q_ref[2], qm_ref[:],
        lambda k, j: c_ref[k, j],
        track_m=True,
    )
    Rc = [[carry_ref[0], carry_ref[1], carry_ref[2]],
          [carry_ref[3], carry_ref[4], carry_ref[5]],
          [carry_ref[6], carry_ref[7], carry_ref[8]]]
    tc_h = [carry_ref[9], carry_ref[10], carry_ref[11]]
    tc_l = [carry_ref[12], carry_ref[13], carry_ref[14]]
    anchor = [carry_ref[15], carry_ref[16], carry_ref[17]]

    Rd = [[vals[0], vals[1], vals[2]],
          [vals[3], vals[4], vals[5]],
          [vals[6], vals[7], vals[8]]]
    # de-center: t_world_delta = t_centered + M @ anchor (M = I - R_delta)
    twd = [
        vals[9 + i]
        + M[i][0] * anchor[0] + M[i][1] * anchor[1] + M[i][2] * anchor[2]
        for i in range(3)
    ]
    # compose with the carried pose: R_out = R_d @ R_c, t_out = R_d t_c + twd
    R_out = [
        [Rd[i][0] * Rc[0][j] + Rd[i][1] * Rc[1][j] + Rd[i][2] * Rc[2][j]
         for j in range(3)]
        for i in range(3)
    ]
    rt_h, rt_l = ff.mat3_apply_ff(Rd, tc_h, tc_l)
    to_h, to_l = [], []
    for i in range(3):
        h, l = ff.add_f(rt_h[i], rt_l[i], twd[i])
        to_h.append(h)
        to_l.append(l)
    out_ref[0, :19] = jnp.stack(
        [R_out[0][0], R_out[0][1], R_out[0][2],
         R_out[1][0], R_out[1][1], R_out[1][2],
         R_out[2][0], R_out[2][1], R_out[2][2],
         to_h[0], to_h[1], to_h[2], to_l[0], to_l[1], to_l[2],
         vals[12], vals[13], vals[14], vals[15]]
    )


def fused_gn_carry(q, qmask, cand, scal, carry, n_inner: int,
                   interpret: bool = False):
    """`fused_gn` with the outer-round pose composition fused in-kernel.

    carry (18,) f32: [R 9, t_hi 3, t_lo 3, anchor 3] — the accumulated
    world pose and the centering anchor of this round's queries/candidates.
    Returns (R9 (9,), t_hi (3,), t_lo (3,), n_corr f32, rms f32, iters f32,
    converged bool, stale bool) with (R9, t) already composed:
    T_out = T_delta @ T_carry.
    """
    nc = cand.shape[1]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel_carry, n_inner, nc),
            out_shape=jax.ShapeDtypeStruct((1, LANE), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(scal.astype(jnp.float32), carry.astype(jnp.float32), q, qmask, cand)
    row = out[0]
    flags = row[18]
    return (row[:9], row[9:12], row[12:15], row[15], row[16], row[17],
            flags % 2.0 >= 1.0, flags >= 2.0)


@functools.partial(jax.jit, static_argnames=("n_inner", "interpret"))
def fused_gn_batched(q, qmask, cand, scal, n_inner: int,
                     interpret: bool = False):
    """Batched `fused_gn` over a leading stream axis via the kernel grid.

    q (S, 3, QR, 128), qmask (S, QR, 128), cand (S, 3, NC, QR, 128),
    scal (S, 8) — per-stream scalars (each stream has its own adaptive
    sigma). Returns the `fused_gn` tuple with a leading S axis.
    """
    s_dim, _, qr, _ = q.shape
    nc = cand.shape[2]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel_batched, n_inner, nc),
            grid=(s_dim,),
            out_shape=jax.ShapeDtypeStruct((s_dim, 1, LANE), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (S, 8) whole
                pl.BlockSpec((1, 3, qr, LANE), lambda s: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qr, LANE), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, nc, qr, LANE), lambda s: (s, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # whole
            interpret=interpret,
        )(scal.astype(jnp.float32), q, qmask, cand)
    return jax.vmap(_unpack)(out[:, 0])
