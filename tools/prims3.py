"""Round-3 primitive costs on the live chip: sorts, gathers, scatters,
transposes at pipeline shapes. Informs the downsample/insert/fetch redesign.

Usage: python tools/prims3.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)


def t(f, *args, n=50, label=""):
    f(*args)
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{ms:8.3f} ms  {label}", flush=True)


def main():
    rng = np.random.default_rng(0)

    # --- sorts -------------------------------------------------------------
    for n in (1 << 15, 1 << 17, 1 << 18):
        x64 = jnp.asarray(rng.integers(0, 1 << 62, size=n, dtype=np.int64))
        t(jax.jit(jnp.sort), x64, label=f"sort i64 {n}")
    for n in (1 << 15, 1 << 17):
        x32 = jnp.asarray(rng.integers(0, 1 << 30, size=n, dtype=np.int32))
        t(jax.jit(jnp.sort), x32, label=f"sort i32 {n}")
    x32f = jnp.asarray(rng.random(1 << 17), jnp.float32)
    t(jax.jit(jnp.sort), x32f, label="sort f32 131072")

    # --- gathers -----------------------------------------------------------
    C, K = 1 << 17, 10
    slab = jnp.asarray(rng.random((C, K * 3)), jnp.float32)
    slab_soa = jnp.asarray(rng.random((3, C, K)), jnp.float32)
    idx32k = jnp.asarray(rng.integers(0, C, size=1 << 15, dtype=np.int32))

    def g_rows(s, i):  # (32k, 30) f32 row gather
        return s[i]

    t(jax.jit(g_rows), slab, idx32k, label="gather rows (32k,30) f32")

    def g_soa(s, i):  # 3 gathers of (32k, K)
        return s[0][i], s[1][i], s[2][i]

    t(jax.jit(g_soa), slab_soa, idx32k, label="gather SoA 3x(32k,10) f32")

    def g_soa4(s, i):  # 3 gathers of (32k, 4) prefix
        return s[0][i, :4], s[1][i, :4], s[2][i, :4]

    t(jax.jit(g_soa4), slab_soa, idx32k, label="gather SoA 3x(32k,4) f32")

    slab64 = jax.lax.bitcast_convert_type(slab.reshape(C, K * 3 // 2, 2), jnp.int64)
    t(jax.jit(g_rows), slab64, idx32k, label="gather rows (32k,15) i64")

    # element gather (grid lookup shape)
    grid = jnp.asarray(rng.integers(0, C, size=1 << 21, dtype=np.int32))
    qi = jnp.asarray(rng.integers(0, 1 << 21, size=1 << 15, dtype=np.int32))
    t(jax.jit(lambda g, i: g[i]), grid, qi, label="gather elem (32k,) from 2M")

    # --- scatters ----------------------------------------------------------
    n = 1 << 17
    tgt = jnp.zeros((1 << 15,), jnp.int32)
    si = jnp.asarray(rng.integers(0, 1 << 15, size=n, dtype=np.int32))
    sv = jnp.asarray(rng.integers(0, 1 << 30, size=n, dtype=np.int32))
    t(jax.jit(lambda t_, i, v: t_.at[i].min(v)), tgt, si, sv,
      label="scatter-min i32 131k -> 32k")
    tgt64 = jnp.zeros((1 << 18,), jnp.int64)
    si2 = jnp.asarray(rng.integers(0, 1 << 18, size=n, dtype=np.int32))
    sv64 = jnp.asarray(rng.integers(0, 1 << 62, size=n, dtype=np.int64))
    t(jax.jit(lambda t_, i, v: t_.at[i].min(v)), tgt64, si2, sv64,
      label="scatter-min i64 131k -> 262k")
    t(jax.jit(lambda t_, i, v: t_.at[i].set(v)), tgt, si, sv,
      label="scatter-set i32 131k -> 32k")
    fv = jnp.asarray(rng.random((n,)), jnp.float32)
    ftgt = jnp.zeros((1 << 15,), jnp.float32)
    t(jax.jit(lambda t_, i, v: t_.at[i].set(v)), ftgt, si, fv,
      label="scatter-set f32 131k -> 32k")

    # --- transposes / relayouts -------------------------------------------
    a = jnp.asarray(rng.random((4096, 64)), jnp.float32)
    t(jax.jit(lambda x: x.T.copy()), a, label="transpose (4096,64)->(64,4096)")
    b = jnp.asarray(rng.random((4096, 80, 3)), jnp.float32)
    t(jax.jit(lambda x: jnp.transpose(x, (2, 1, 0)).copy()), b,
      label="transpose (4096,80,3)->(3,80,4096)")
    c = jnp.asarray(rng.random((4096, 240)), jnp.float32)
    t(jax.jit(lambda x: (x[:, 0::3].copy(), x[:, 1::3].copy(), x[:, 2::3].copy())),
      c, label="deinterleave (4096,240) stride-3")

    # --- cumsum / segment ops ---------------------------------------------
    m = jnp.asarray(rng.random(1 << 17) < 0.3)
    t(jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32))), m, label="cumsum i32 131k")

    # --- window rows: vmapped dynamic_slice vs explicit gather -------------
    keys = jnp.asarray(rng.integers(-1, 1 << 30, size=C, dtype=np.int32))
    h0 = jnp.asarray(rng.integers(0, C, size=1 << 14, dtype=np.int32))

    def wr_vmap(k, h):
        padded = jnp.concatenate([k, k[:16]])
        return jax.vmap(lambda hh: jax.lax.dynamic_slice(padded, (hh,), (16,)))(h)

    def wr_gather(k, h):
        idx = (h[:, None] + jnp.arange(16, dtype=jnp.int32)[None, :]) & (C - 1)
        return k[idx]

    t(jax.jit(wr_vmap), keys, h0, label="window rows 16k x16 vmap dyn-slice")
    t(jax.jit(wr_gather), keys, h0, label="window rows 16k x16 explicit gather")


if __name__ == "__main__":
    main()
