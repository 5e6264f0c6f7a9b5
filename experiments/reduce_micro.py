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
    from pfac_tpu.backends.xla import _reduce_rowgather, _reduce_scatter_max

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    for density in (0.0003, 0.03, 0.15):
        dense = np.where(rng.random(N) < density,
                         rng.integers(1, 2000, size=N), 0).astype(np.int32)
        dd = jax.device_put(dense, dev)
        exp_pos = np.flatnonzero(dense)
        fns = {"scatter_max": jax.jit(_reduce_scatter_max),
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
