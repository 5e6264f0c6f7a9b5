"""Sieve kernel A/B: m1 compare-chain vs 2-plane table (round 3).

The kernel is issue-bound (~82 cy/row-group ~= its ~86 VPU ops), so an
8-entry m1 chain (16 compare+select ops) should LOSE to the 2-plane
table (~5 ops incl. 2 gathers). Measures kernel-only time on 64 MB for
both on the bench ruleset (8 len-1 patterns).
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS_MB = 64
K = 8


def chained_kernel(pipeline, table_args, dense_flat, data_dev, n_arr):
    out, bits = pipeline(table_args, dense_flat, data_dev, n_arr)
    _ = np.asarray(out[:1])

    def once(k):
        t0 = time.perf_counter()
        d = data_dev
        for _ in range(k):
            out, bits = pipeline(table_args, dense_flat, d, n_arr)
            d = d.at[0].set((out[0] & 1).astype(jnp.uint8))
        _ = np.asarray(out[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(5))
    tk = min(once(K) for _ in range(3))
    return (tk - t1) / (K - 1)


def main():
    from bench import snort_like_patterns
    from pfac_tpu import Automaton
    import pfac_tpu.backends.pallas_sieve as S

    dev = jax.devices()[0]
    patterns = snort_like_patterns()
    a = Automaton.from_patterns(patterns)
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    data_dev = jax.device_put(rng.integers(0, 256, size=n, dtype=np.uint8),
                              dev)
    n_arr = jnp.full((1,), n, jnp.int32)

    npad = S.npad_for(n)
    for label, chain_max in (("m1 table", 2), ("m1 chain(8)", 12)):
        S._M1_CHAIN_MAX = chain_max
        t = S.SieveTables.build(a)
        pipe = jax.jit(S.build_pipeline(
            a, t, npad=npad, cap=4096, kernel_only=True, aligned=True))
        args = [jax.device_put(x, dev) for x in t.arrays]
        dense = jax.device_put(np.zeros(1, np.int32), dev)
        tt = chained_kernel(pipe, args, dense, data_dev, n_arr)
        print(f"{label:14s}: kernel {tt*1e3:7.2f} ms/{CORPUS_MB} MB "
              f"({n/1e9/tt:6.2f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
