"""Honest (amortized, dependency-chained) profiling of the match engines.

On this platform a tiny D2H transfer costs ~31 ms round-trip and
block_until_ready can return early, so single-dispatch timing is garbage.
Method: run K dependency-chained dispatches ending in ONE barrier; report
(t_K - t_1) / (K - 1).
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


def chained(fn, data_dev, iters_outer=3, k=K):
    """fn: u8[N] -> int32[*]. Chains by folding 1 bit of out back into data."""
    out = fn(data_dev)
    _ = np.asarray(out[:1])

    def once(k):
        t0 = time.perf_counter()
        d = data_dev
        out = None
        for _ in range(k):
            out = fn(d)
            d = d.at[0].set((out[0] & 1).astype(jnp.uint8))
        _ = np.asarray(out[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(iters_outer + 2))
    tk = min(once(k) for _ in range(iters_outer))
    return (tk - t1) / (k - 1)


def main():
    from bench import snort_like_patterns
    from pfac_tpu import Automaton

    dev = jax.devices()[0]
    patterns = snort_like_patterns()
    a = Automaton.from_patterns(patterns)
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    data_dev = jax.device_put(data, dev)
    gb = n / 1e9

    # --- production path: sieve kernel + survivor-walk engine
    from pfac_tpu.backends.pallas_sieve import SieveMatcher
    sm = SieveMatcher(a)
    t = chained(sm.match_device, data_dev)
    sm.flush_checks()
    print(f"sieve+walk full  : {t*1e3:8.2f} ms  {gb/t:6.2f} GB/s")

    # --- XLA matcher (dense)
    from pfac_tpu.backends.xla import XlaMatcher
    xm = XlaMatcher(a, perf_mode="dense")
    t = chained(xm.match_device, data_dev)
    print(f"xla dense        : {t*1e3:8.2f} ms  {gb/t:6.2f} GB/s")

    xmh = XlaMatcher(a, perf_mode="hash")
    t = chained(xmh.match_device, data_dev)
    print(f"xla hash         : {t*1e3:8.2f} ms  {gb/t:6.2f} GB/s")

    # --- raw gather throughput from HBM tables of various sizes
    for tab_n, label in ((66049, "pair 258KB"), (1 << 22, "16MB"),
                         (a.num_states * 257, "dense 40MB")):
        tab = jax.device_put(
            jnp.asarray(rng.integers(0, 1 << 20, size=tab_n, dtype=np.int64)
                        .astype(np.int32)), dev)

        def mk(tab=tab, tab_n=tab_n):
            @jax.jit
            def g(d):
                idx = d.astype(jnp.int32) * 257 % tab_n
                return jnp.take(tab, idx)
            return g

        t = chained(mk(), data_dev)
        print(f"xla take {label:11s}: {t*1e3:8.2f} ms "
              f" {n/t/1e9:6.2f} G gathers/s")


if __name__ == "__main__":
    main()
