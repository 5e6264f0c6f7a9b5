"""Scatter lowering micro-benchmark: sorted/unique vs default, by index
count, into a 512 MB dense result (round 3)."""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NPAD = 128 << 20
K = 8


def timeit(fn, *args):
    out = fn(*args)
    _ = np.asarray(out[:1])

    def once(k):
        t0 = time.perf_counter()
        o = args[0]
        for _ in range(k):
            o = fn(o, *args[1:])
        _ = np.asarray(o[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(K) for _ in range(3))
    return (tk - t1) / (K - 1)


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    res = jax.device_put(np.zeros(NPAD, np.int32), dev)
    for cap in (4096, 65536, 1 << 20):
        pos = np.sort(rng.choice(NPAD, size=cap, replace=False)).astype(np.int32)
        vals = rng.integers(1, 1000, size=cap).astype(np.int32)
        posd = jax.device_put(pos, dev)
        vd = jax.device_put(vals, dev)

        @jax.jit
        def f_sorted(r, p, v):
            return r.at[p].set(v, mode="drop", indices_are_sorted=True,
                               unique_indices=True)

        @jax.jit
        def f_plain(r, p, v):
            return r.at[p].set(v, mode="drop")

        for name, f in (("sorted", f_sorted), ("plain", f_plain)):
            t = timeit(f, res, posd, vd)
            print(f"cap={cap:6d} {name:6s}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
