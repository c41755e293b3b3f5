"""Round 2 of in-kernel gather probes: take_along_axis-shaped forms.

Mosaic's dynamic_gather wants out[i, j] = in[idx[i, j], j] (per-lane sublane
gather). Probes:
  a) take_along_axis(table (C,128), idx (N,128), axis=0)
  b) same but table (C, 512) wider than one lane tile
  c) i32 keys-table variant (the hash-probe window use case)
  d) XLA element-gather baselines for comparison
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, n=100):
    r = jax.block_until_ready(f(*args))
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / n * 1e3, r


def probe(name, kernel, out_shape, inputs, check):
    def run(*a):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret="--interpret" in sys.argv,
            )(*a)

    try:
        ms, out = timeit(jax.jit(run), *inputs)
        ok = check(np.asarray(out))
        print(f"{name}: {ms:.3f} ms  correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}")


def main():
    C, N = 8192, 2048
    rng = np.random.default_rng(0)

    # (a) take_along_axis axis=0, (C,128) table, (N,128) idx
    table = jnp.asarray(rng.normal(size=(C, 128)).astype(np.float32))
    idx1 = rng.integers(0, C, size=(N,)).astype(np.int32)
    idx = jnp.asarray(np.broadcast_to(idx1[:, None], (N, 128)).copy())

    def k_taa(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    tnp = np.asarray(table)
    probe(
        "taa axis=0 (C,128)->(N,128)",
        k_taa,
        jax.ShapeDtypeStruct((N, 128), jnp.float32),
        (table, idx),
        lambda o: np.allclose(o, tnp[idx1]),
    )

    # (b) wider rows: (C, 512)
    table2 = jnp.asarray(rng.normal(size=(C, 512)).astype(np.float32))
    idxw = jnp.asarray(np.broadcast_to(idx1[:, None], (N, 512)).copy())
    t2np = np.asarray(table2)
    probe(
        "taa axis=0 (C,512)->(N,512)",
        k_taa,
        jax.ShapeDtypeStruct((N, 512), jnp.float32),
        (table2, idxw),
        lambda o: np.allclose(o, t2np[idx1]),
    )

    # (c) i32 variant (probe windows): idx broadcast inside the kernel
    ktab = jnp.asarray(rng.integers(0, 1 << 30, size=(C, 128)).astype(np.int32))

    def k_i32(t_ref, i_ref, o_ref):
        ii = jnp.broadcast_to(i_ref[:, 0:1], (N, 128))
        o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=0)

    knp = np.asarray(ktab)
    probe(
        "taa axis=0 i32 + in-kernel broadcast",
        k_i32,
        jax.ShapeDtypeStruct((N, 128), jnp.int32),
        (ktab, jnp.asarray(idx1[:, None])),
        lambda o: np.array_equal(o, knp[idx1]),
    )

    # (d) XLA baselines
    ms, _ = timeit(jax.jit(lambda t, i: t[i]), table, jnp.asarray(idx1))
    print(f"XLA gather (C,128) rows: {ms:.3f} ms")
    tab30 = jnp.asarray(rng.normal(size=(C, 30)).astype(np.float32))
    big_idx = jnp.asarray(rng.integers(0, C, size=(32768,)).astype(np.int32))
    ms, _ = timeit(jax.jit(lambda t, i: t[i]), tab30, big_idx)
    print(f"XLA gather 32k x (30,) f32 rows [the fetch]: {ms:.3f} ms")
    tab15 = jnp.asarray(rng.integers(0, 1 << 60, size=(C, 15)).astype(np.int64))
    ms, _ = timeit(jax.jit(lambda t, i: t[i]), tab15, big_idx)
    print(f"XLA gather 32k x (15,) i64 rows [bitcast trick]: {ms:.3f} ms")


if __name__ == "__main__":
    main()
