"""Measure tpu.dynamic_gather throughput: out[i,j] = table[idx[i,j], j]
with a lane-replicated table (all columns equal)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=30):
    out = fn(*args)
    out.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


def run_case(rows: int, n_idx: int, tile_rows: int, chain: int = 1):
    """n_idx gathers against a (rows,128) replicated table, grid over tiles.
    chain > 1 re-gathers through the result (dependent chain, like a walk)."""
    TR = tile_rows
    G = n_idx // (TR * 128)

    def kernel(table_ref, idx_ref, out_ref):
        t = table_ref[:]
        v = idx_ref[:]
        for _ in range(chain):
            v = jnp.take_along_axis(t, v, axis=0)
        out_ref[:] = v

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct((G * TR, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec((rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(table, idx)

    rng = np.random.default_rng(0)
    # table[v] = some permutation value < rows so chains stay in range
    col = rng.integers(0, rows, size=rows).astype(np.int32)
    table = jnp.asarray(np.broadcast_to(col[:, None], (rows, 128)).copy())
    idx = jnp.asarray(rng.integers(0, rows, size=(G * TR, 128)).astype(np.int32))
    t, out = bench(run, table, idx)
    # correctness spot check
    exp = col[np.asarray(idx[:2])]
    for _ in range(chain - 1):
        exp = col[exp]
    ok = bool(np.array_equal(np.asarray(out[:2]), exp))
    return t, ok


if __name__ == "__main__":
    N = 16 << 20  # 16M gathers
    for rows in (264, 1024, 4096, 8192, 16384):
        for tr in (256, 1024):
            try:
                t, ok = run_case(rows, N, tr)
                print(f"rows={rows:6d} tile={tr:5d}: {t*1e3:7.3f} ms  ok={ok}  "
                      f"{N/t/1e9:7.2f} G gathers/s")
            except Exception as e:
                print(f"rows={rows:6d} tile={tr:5d}: FAILED {type(e).__name__}: {str(e)[:200]}")
    # dependent chain (walk-like): 4 chained gathers
    t, ok = run_case(4096, N, 1024, chain=4)
    print(f"chain=4 rows=4096: {t*1e3:7.3f} ms ok={ok}  {4*N/t/1e9:7.2f} G gathers/s")
