"""Amortized timing of the sieve KERNEL alone (kernel_only pipeline).

Used to iterate on kernel economics (round 3): prints kernel ms/128 MB and
GB/s. Method per axon-timing-traps: K dependency-chained dispatches, one
tiny D2H barrier, (t_K - t_1)/(K - 1).
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


def main():
    from bench import snort_like_patterns
    from pfac_tpu import Automaton
    from pfac_tpu.backends import pallas_sieve as sieve

    dev = jax.devices()[0]
    a = Automaton.from_patterns(snort_like_patterns())
    tables = sieve.SieveTables.build(a)
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    npad = sieve.npad_for(n)
    data = rng.integers(0, 256, size=npad, dtype=np.uint8)
    data_dev = jax.device_put(data, dev)
    table_args = [jax.device_put(jnp.asarray(x), dev) for x in tables.arrays]
    from pfac_tpu.backends.xla import dense_device_table
    dense_flat = jax.device_put(
        jnp.asarray(dense_device_table(a).reshape(-1)), dev)
    n_arr = jnp.full((1,), n, jnp.int32)

    fn = jax.jit(sieve.build_pipeline(a, tables, npad=npad, cap=1 << 12,
                                      aligned=True, kernel_only=True))

    def run(d):
        out, bits = fn(table_args, dense_flat, d, n_arr)
        return out

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    out = run(data_dev)
    _ = np.asarray(out[:1])
    print(f"warmup done in {time.perf_counter()-t0:.1f}s", flush=True)
    nsurv = int(np.asarray(
        jax.jit(lambda b: jax.lax.population_count(b).sum())(
            fn(table_args, dense_flat, data_dev, n_arr)[1])))

    def once(k):
        t0 = time.perf_counter()
        d = data_dev
        o = None
        for _ in range(k):
            o = run(d)
            d = d.at[0].set((o[0] & 1).astype(jnp.uint8))
        _ = np.asarray(o[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(K) for _ in range(3))
    t = (tk - t1) / (K - 1)
    print(f"kernel_only: {t*1e3:8.2f} ms/{CORPUS_MB} MB   "
          f"{n/t/1e9:6.2f} GB/s   survivors={nsurv}")


if __name__ == "__main__":
    main()
