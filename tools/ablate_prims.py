"""Primitive costs on the live TPU: sorts, gathers, scatters, i32 vs i64 hash.

Times chained self-feeding loops; each op at two sizes so the per-dispatch
floor cancels: cost(op) ~ (t_big - t_small) / (n_big - n_small) * n.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


REPS = 8  # op applications fused per dispatch — amortizes tunnel latency


def chain(name, fn, init, n_iter=12, n_warm=2):
    """Times REPS chained applications of fn inside ONE jitted call."""

    @jax.jit
    def multi(x):
        for _ in range(REPS):
            x = fn(x)
        return x

    x = init
    for _ in range(n_warm):
        x = multi(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0])
    t0 = time.perf_counter()
    for _ in range(n_iter):
        x = multi(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0])
    dt = (time.perf_counter() - t0) / (n_iter * REPS) * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    C = 1 << 17

    for n in (32768, 131072):
        k64 = jnp.asarray(rng.integers(0, 1 << 45, (n,)), jnp.int64)
        chain(f"sort i64 n={n}", lambda k: jnp.sort(k) ^ 1, k64)
        k32 = jnp.asarray(rng.integers(0, 1 << 30, (n,)), jnp.int32)
        chain(f"sort i32 n={n}", lambda k: jnp.sort(k) ^ 1, k32)
        f32 = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
        chain(f"sort f32 n={n}", lambda k: jnp.sort(k) + 1e-9, f32)
        kb = jnp.asarray(rng.integers(0, 1 << 45, (32, n // 32)), jnp.int64)
        chain(f"sort i64 batched (32,{n//32})", lambda k: jnp.sort(k, axis=1) ^ 1, kb)

    # hash math i64 vs i32 at table scale
    k64 = jnp.asarray(rng.integers(0, 1 << 45, (C,)), jnp.int64)
    k32 = jnp.asarray(rng.integers(0, 1 << 30, (C,)), jnp.int32)

    def h64(k):
        u = k.astype(jnp.uint64)
        u = (u ^ (u >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
        u = (u ^ (u >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
        u = u ^ (u >> jnp.uint64(31))
        return (u & jnp.uint64(C - 1)).astype(jnp.int64)

    def h32(k):
        u = k.astype(jnp.uint32)
        u = (u ^ (u >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
        u = (u ^ (u >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
        u = u ^ (u >> jnp.uint32(16))
        return (u & jnp.uint32(C - 1)).astype(jnp.int32)

    chain("hash u64 x2mul C=131k", lambda k: h64(k).astype(jnp.int64) ^ k, k64)
    chain("hash u32 x2mul C=131k", lambda k: h32(k) ^ k, k32)

    # fps_wide-style: fingerprint + 8 rolls, i32
    def fpsw32(k):
        fp = h32(k)
        w = jnp.stack([jnp.roll(fp, -j) for j in range(8)], axis=1)
        return w[:, 3] ^ k
    chain("fps_wide i32 (C,8)", fpsw32, k32)

    # gathers: random row gathers at various widths
    tbl30 = jnp.asarray(rng.uniform(size=(C, 30)), jnp.float32)
    tbl8 = jnp.asarray(rng.integers(0, 100, (C, 8)), jnp.int32)
    for q in (4096, 32768, 110592):
        idx = jnp.asarray(rng.integers(0, C, (q,)), jnp.int32)
        chain(f"gather {q} rows x 120B", lambda i: (tbl30[i].sum(1).astype(jnp.int32) + i) % C, idx)
        chain(f"gather {q} rows x 32B", lambda i: (tbl8[i].sum(1) + i) % C, idx)

    # scatters
    for q in (32768, 131072):
        idx = jnp.asarray(rng.integers(0, C * 30, (q,)), jnp.int32)
        vals = jnp.asarray(rng.uniform(size=(q,)), jnp.float32)
        flat = jnp.zeros((C * 30,), jnp.float32)
        chain(f"scatter-set {q} rows f32 (flat)",
              lambda i: (flat.at[i].set(vals).sum().astype(jnp.int32) + i) % (C * 30), idx)
        idx2 = jnp.asarray(rng.integers(0, C, (q,)), jnp.int32)
        chain(f"scatter-min {q} into (C,) i32",
              lambda i: (jnp.full((C,), q, jnp.int32).at[i].min(jnp.arange(q, dtype=jnp.int32))[i % C] + i) % C, idx2)

    # big elementwise: 131k f64 vs f32 transform
    pts32 = jnp.asarray(rng.uniform(size=(131072, 3)), jnp.float32)
    T = jnp.asarray(np.eye(4))
    def tf64(p):
        w = p.astype(jnp.float64) @ T[:3, :3].T + T[:3, 3]
        return w.astype(jnp.float32)
    chain("transform 131k pts f64", tf64, pts32)
    def tf32(p):
        w = p @ T[:3, :3].T.astype(jnp.float32) + T[:3, 3].astype(jnp.float32)
        return w
    chain("transform 131k pts f32", tf32, pts32)

    # cumsum at 131k (i32)
    m = jnp.asarray(rng.integers(0, 2, (131072,)), jnp.int32)
    chain("cumsum 131k i32", lambda x: jnp.cumsum(x) % 7 + x % 2, m)


if __name__ == "__main__":
    main()
