"""Device reduce A/B: sorted scatter-max pack vs chunked rank-select
row-gather, on 64 MB dense results across match densities (round 3).

The scatter-max path's cost model is O(n) streaming (cumsum + two sorted
scatter passes); the row-gather path costs ~4 gathered 128-wide rows per
output rank (~25 ms floor at 2M matches). Verifies parity on-device.
"""
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 64 << 20
K = 8


def timeit(fn, arg):
    out = fn(arg)
    _ = np.asarray(out[2])

    def once(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(arg)
        _ = np.asarray(o[2])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(K) for _ in range(3))
    return (tk - t1) / (K - 1)


def main():
    import jax.numpy as jnp
    from pfac_tpu.backends.xla import (_reduce_rowgather,
                                       _reduce_scatter_max, _prefix_1d)

    # cumsum lowering micro: XLA's 1-D cumsum is a reduce-window ladder
    # (O(n log n) HBM passes); _prefix_1d is two linear passes + MXU
    # lane prefixes. This delta is the round-4 scatter-max fix.
    dev = jax.devices()[0]
    ones = jax.device_put(np.ones(N, np.int32), dev)
    for name, f in (("jnp.cumsum", jax.jit(jnp.cumsum)),
                    ("_prefix_1d", jax.jit(_prefix_1d))):
        g = lambda x, f=f: (None, None, f(x)[-1:])
        t = timeit(g, ones)
        print(f"prefix 64M i32 {name:12s}: {t*1e3:7.2f} ms", flush=True)

    rng = np.random.default_rng(0)

    def scatter_max_rawcumsum(m):
        # the pre-round-4 form: full-length jnp.cumsum
        flags = m > 0
        csum = jnp.cumsum(flags.astype(jnp.int32))
        count = csum[-1]
        dest = csum - 1
        iota = jnp.arange(m.shape[0], dtype=jnp.int32)
        zero = jnp.zeros(m.shape[0], jnp.int32)
        ids = zero.at[dest].max(jnp.where(flags, m, 0), mode="drop",
                                indices_are_sorted=True)
        pos1 = zero.at[dest].max(jnp.where(flags, iota + 1, 0), mode="drop",
                                 indices_are_sorted=True)
        return ids, jnp.maximum(pos1 - 1, 0), count

    for density in (0.0003, 0.03, 0.15):
        dense = np.where(rng.random(N) < density,
                         rng.integers(1, 2000, size=N), 0).astype(np.int32)
        dd = jax.device_put(dense, dev)
        exp_pos = np.flatnonzero(dense)
        fns = {"scatter_max": jax.jit(_reduce_scatter_max),
               "scatter_max_rawcumsum": jax.jit(scatter_max_rawcumsum),
               "rowgather": jax.jit(lambda r: _reduce_rowgather(r))}
        for name, f in fns.items():
            ids, pos, count = f(dd)
            c = int(count)
            assert c == exp_pos.shape[0], (name, c, exp_pos.shape[0])
            sl = np.asarray(pos[:min(c, 100000)])
            assert np.array_equal(sl, exp_pos[:sl.shape[0]]), name
            t = timeit(f, dd)
            print(f"density={density:7.4f} matches={c:8d} {name:12s}: "
                  f"{t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
