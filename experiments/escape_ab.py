"""Round-4 regression bisect: dense-block escape arming cost.

bench.py r4 captured 7.48 GB/s (17.9 ms/128 MB) vs round-3's 11.25 ms
kernel_ms — a ~5-6 ms regression that landed with the offline round-4
kernel changes. Prime suspect: the dense-block escape (commit 85d9068)
whose NOT-TAKEN cost is the per-block bitmap SWAR popcount + the esc
branch skeleton (its own comment estimates ~60 vector ops/block vs the
kernel's ~86-op budget).

Arms (kernel-only, 64 MB random, flagship ruleset — same harness shape
as kernel_ab2 so numbers are directly comparable):
  esc_on   DENSE_ESCAPE_DIV=4 (production default, = kernel_ab2 "main")
  esc_off  DENSE_ESCAPE_DIV=0 (escape disarmed; walk tables still ride
           along unused, so VMEM layout stays production-like)
  esc_off_nowt  walk_tables=None entirely (also drops the walk-table
           VMEM residency and scratch refs)

Flip rule: if esc_off recovers the round-3 per-byte cost (~5.6 ms/64MB)
the escape check must move off the hot path (e.g. popcount from the
already-reduced per-block survivor count, or a coarser SWAR); if not,
bisect continues into the 8b6644b tree/split refactor.
"""
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS_MB = 64
K = 8


def timeit(fn, args) -> float:
    out, bits = fn(*args)
    _ = np.asarray(out[:1])

    def once(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out, bits = fn(*args)
        _ = np.asarray(out[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(K) for _ in range(3))
    return (tk - t1) / (K - 1)


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pfac_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import snort_like_patterns
    from pfac_tpu import Automaton
    import pfac_tpu.backends.pallas_sieve as S

    dev = jax.devices()[0]
    a = Automaton.from_patterns(snort_like_patterns())
    t = S.SieveTables.build(a)
    wt = S.build_walk_tables_gated(a, t)
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    data_dev = jax.device_put(rng.integers(0, 256, size=n, dtype=np.uint8),
                              dev)
    n_arr = jnp.full((1,), n, jnp.int32)
    npad = S.npad_for(n)
    args_wt = ([jax.device_put(x, dev) for x in t.arrays]
               + [jax.device_put(np.asarray(x), dev) for x in wt.arrays],
               jax.device_put(np.zeros(1, np.int32), dev),
               data_dev, n_arr)
    args_nowt = ([jax.device_put(x, dev) for x in t.arrays],
                 args_wt[1], data_dev, n_arr)

    def fp(pipe, args):
        out, bits = pipe(*args)
        return int(np.asarray(jnp.sum(out.astype(jnp.uint32)
                                      * (jnp.arange(out.size,
                                                    dtype=jnp.uint32)
                                         % 8191 + 1))[None])[0])

    ref = None
    for tag, div, wtab, args in (
            ("esc_on", 4, wt, args_wt),
            ("esc_check_only", 4, wt, args_wt),
            ("esc_off", 0, wt, args_wt),
            ("esc_off_nowt", 0, None, args_nowt)):
        S.DENSE_ESCAPE_DIV = div
        S._ESC_CHECK_ONLY = tag == "esc_check_only"
        try:
            pipe = jax.jit(S.build_pipeline(
                a, t, npad=npad, cap=4096, kernel_only=True, aligned=True,
                walk_tables=wtab))
            ms = timeit(pipe, args) * 1e3
            got = fp(pipe, args)
            rec = {"variant": tag, "kernel_ms_64mb": round(ms, 3)}
            if ref is not None:
                rec["parity"] = got == ref
            ref = ref if ref is not None else got
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"variant": tag, "error": repr(e)[:160]}),
                  flush=True)
    S.DENSE_ESCAPE_DIV = 4
    S._ESC_CHECK_ONLY = False


if __name__ == "__main__":
    main()
