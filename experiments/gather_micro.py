"""Micro-experiment: can Mosaic do fast per-lane gathers from a VMEM table?

Tries several formulations of `out[i] = table[idx[i]]` inside a Pallas TPU
kernel. This determines the design of the production match kernel.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TABLE_N = 66049          # pair table size (257*257)
TABLE_PAD = 66560        # padded to 520*128
ROWS, COLS = 520, 128
TILE = 8 * 1024          # lanes per kernel invocation block


def bench(fn, *args, iters=20):
    out = fn(*args)
    out.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


def try_take_flat():
    """jnp.take on a flat VMEM table."""
    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    table = jnp.arange(TABLE_PAD, dtype=jnp.int32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, TABLE_N, size=(TILE,)), dtype=jnp.int32)
    t, out = bench(run, table, idx)
    ok = bool(jnp.all(out == idx))
    return t, ok


def try_take_2d():
    """table as (ROWS,128) + idx decomposed: row gather then lane select."""
    def kernel(table_ref, idx_ref, out_ref):
        idx = idx_ref[:]  # (R, 128) block of indices
        out_ref[:] = jnp.take(table_ref[:].reshape(-1), idx, axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    table = jnp.arange(TABLE_PAD, dtype=jnp.int32).reshape(ROWS, COLS)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, TABLE_N, size=(TILE // 128, 128)),
        dtype=jnp.int32,
    )
    t, out = bench(run, table, idx)
    ok = bool(jnp.all(out == idx))
    return t, ok


def try_xla_take_baseline():
    """plain XLA jnp.take (no pallas), same shapes, for comparison."""
    @jax.jit
    def run(table, idx):
        return jnp.take(table, idx, axis=0)

    table = jnp.arange(TABLE_PAD, dtype=jnp.int32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, TABLE_N, size=(TILE,)), dtype=jnp.int32)
    t, out = bench(run, table, idx)
    ok = bool(jnp.all(out == idx))
    return t, ok


def try_big():
    """bigger lane count to amortize dispatch: 4M lanes via grid."""
    N = 4 << 20
    G = N // TILE

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
            in_specs=[
                pl.BlockSpec((TABLE_PAD,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        )(table, idx)

    table = jnp.arange(TABLE_PAD, dtype=jnp.int32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, TABLE_N, size=(N,)), dtype=jnp.int32)
    t, out = bench(run, table, idx)
    ok = bool(jnp.all(out == idx))
    return t, ok, N


if __name__ == "__main__":
    for name, fn in [("take_flat", try_take_flat), ("take_2d", try_take_2d),
                     ("xla_take", try_xla_take_baseline)]:
        try:
            t, ok = fn()
            print(f"{name:12s}: {t*1e6:9.1f} us  ok={ok}  ({TILE/t/1e9:.2f} G gathers/s)")
        except Exception as e:
            print(f"{name:12s}: FAILED — {type(e).__name__}: {str(e)[:300]}")
    try:
        t, ok, n = try_big()
        print(f"{'take_grid_4M':12s}: {t*1e6:9.1f} us  ok={ok}  ({n/t/1e9:.2f} G gathers/s)")
    except Exception as e:
        print(f"{'take_grid_4M':12s}: FAILED — {type(e).__name__}: {str(e)[:300]}")
