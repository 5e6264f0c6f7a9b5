"""Time the ROUND-3 sieve kernel (snapshot at 940aab3, extracted into
.bisect_r3/) on the same 64 MB corpus/geometry as kernel_ab2/escape_ab.

Purpose: pin the round-4 kernel regression (16.9 vs 11.25 ms/128 MB) to
either the round-4 kernel code (escape arming / tree-split refactor) or
to chip/day variance — the r3 snapshot run TODAY removes the day
variable. Run AFTER escape_ab in the same window.
"""
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / ".bisect_r3"))

CORPUS_MB = 64
K = 8


def timeit(fn, args) -> float:
    out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(first[:1])

    def once(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        _ = np.asarray(first[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(K) for _ in range(3))
    return (tk - t1) / (K - 1)


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pfac_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import snort_like_patterns  # root bench.py is r4 but the
    # pattern generator is seed-stable across rounds (seed 42)
    from pfac_tpu import Automaton          # resolves to .bisect_r3 copy
    import pfac_tpu.backends.pallas_sieve as S
    assert ".bisect_r3" in S.__file__, S.__file__

    dev = jax.devices()[0]
    a = Automaton.from_patterns(snort_like_patterns())
    t = S.SieveTables.build(a)
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    data_dev = jax.device_put(rng.integers(0, 256, size=n, dtype=np.uint8),
                              dev)
    n_arr = jnp.full((1,), n, jnp.int32)
    npad = S.npad_for(n)
    args = ([jax.device_put(x, dev) for x in t.arrays],
            jax.device_put(np.zeros(1, np.int32), dev), data_dev, n_arr)
    pipe = jax.jit(S.build_pipeline(a, t, npad=npad, cap=4096,
                                    kernel_only=True, aligned=True))
    ms = timeit(pipe, args) * 1e3
    print(json.dumps({"variant": "r3_snapshot_940aab3",
                      "kernel_ms_64mb": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
