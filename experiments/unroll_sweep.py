"""Sweep the sieve kernel's row-group unroll factor (round 3)."""
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
    from pfac_tpu.backends import pallas_sieve as S
    from pfac_tpu.backends.xla import dense_device_table

    dev = jax.devices()[0]
    a = Automaton.from_patterns(snort_like_patterns())
    tables = S.SieveTables.build(a)
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    npad = S.npad_for(n)
    data = rng.integers(0, 256, size=npad, dtype=np.uint8)
    data_dev = jax.device_put(data, dev)
    targs = [jax.device_put(jnp.asarray(x), dev) for x in tables.arrays]
    dense_flat = jax.device_put(
        jnp.asarray(dense_device_table(a).reshape(-1)), dev)
    n_arr = jnp.full((1,), n, jnp.int32)

    for unroll in (8, 2):
        fn = jax.jit(S.build_pipeline(a, tables, npad=npad, cap=1 << 12,
                                      aligned=True, kernel_only=True,
                                      unroll=unroll))
        print(f"compiling unroll={unroll}...", flush=True)

        def run(d, fn=fn):
            return fn(targs, dense_flat, d, n_arr)[0]

        out = run(data_dev)
        _ = np.asarray(out[:1])

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
        print(f"unroll={unroll}: {t*1e3:8.2f} ms/{CORPUS_MB} MB", flush=True)


if __name__ == "__main__":
    main()
