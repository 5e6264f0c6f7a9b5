"""Kernel cost decomposition: assembly/fixed vs m123 probes vs alive filter.

Times kernel_only variants built from pattern subsets of the bench
ruleset; differences attribute milliseconds to each probe family.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS_MB = 128
K = 8


def timeit(fn, data_dev, args):
    out = fn(*args)[0]
    _ = np.asarray(out[:1])

    def once(k):
        t0 = time.perf_counter()
        d = data_dev
        o = None
        for _ in range(k):
            o = fn(args[0], args[1], d, args[3])[0]
            d = d.at[0].set((o[0] & 1).astype(jnp.uint8))
        _ = np.asarray(o[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(K) for _ in range(3))
    return (tk - t1) / (K - 1)


def main():
    from bench import snort_like_patterns
    from pfac_tpu import Automaton
    from pfac_tpu.backends import pallas_sieve as S
    from pfac_tpu.backends.xla import dense_device_table

    dev = jax.devices()[0]
    pats = snort_like_patterns()
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    npad = S.npad_for(n)
    data = rng.integers(0, 256, size=npad, dtype=np.uint8)
    data_dev = jax.device_put(data, dev)
    n_arr = jnp.full((1,), n, jnp.int32)

    variants = [
        ("full", pats),
        ("alive-only(len>=4)", [p for p in pats if len(p) >= 4]),
        ("m123-only(len<=3)", [p for p in pats if len(p) <= 3] + [b"\x00\x01\x02"]),
        ("near-empty", [bytes([0])]),
    ]
    for name, ps in variants:
        a = Automaton.from_patterns(ps)
        tables = S.SieveTables.build(a)
        targs = [jax.device_put(jnp.asarray(x), dev) for x in tables.arrays]
        dense_flat = jax.device_put(
            jnp.asarray(dense_device_table(a).reshape(-1)), dev)
        fn = jax.jit(S.build_pipeline(a, tables, npad=npad, cap=1 << 12,
                                      aligned=True, kernel_only=True))
        print(f"compiling {name}...", flush=True)
        t = timeit(fn, data_dev, (targs, dense_flat, data_dev, n_arr))
        planes = {
            "m1": 0 if tables.m1 is None else tables.m1.shape[0] // 8,
            "m2": 0 if tables.m2 is None else sum(x.shape[0] // 8 for x in tables.m2.arrays),
            "m3": 0 if tables.m3 is None else sum(x.shape[0] // 8 for x in tables.m3.arrays),
            "alive": 0 if tables.alive is None else sum(x.shape[0] // 8 for x in tables.alive.arrays),
        }
        print(f"{name:20s}: {t*1e3:8.2f} ms   planes={planes}", flush=True)


if __name__ == "__main__":
    main()
