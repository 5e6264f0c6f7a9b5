"""Round-4 sieve kernel A/B: select-tree lookup x split-loops x unroll.

The round-3 verdict: kernel_ms stuck at 11.25/128 MB (~82 cy per 1024
positions for ~86 VPU ops, 14 gathers). Round-4 hypotheses:

  * tree:   _lookup plane merge as a select TREE (log2 P bit tests) vs
            the linear scan (P-1 compares) — fewer ops, but all P
            gathered planes live at once (register pressure risk).
  * split:  separate m123 / alive passes over the staged k4 tile —
            smaller live set per loop, so the scheduler can pipeline
            gathers deeper (and possibly sustain unroll=8).
  * unroll: re-sweep 2/4/8 under each structure (round-2's U=8
            regression was measured on the fused loop with linear scan).

Prints one JSON line per variant (amortized kernel-only ms on 64 MB,
min of 3) plus correctness vs the default variant's output.
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
    # walk tables ride along so the kernel carries the dense-block escape
    # exactly as production does (its not-taken cost is part of kernel_ms)
    wt = S.build_walk_tables_gated(a, t)
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    data_dev = jax.device_put(rng.integers(0, 256, size=n, dtype=np.uint8),
                              dev)
    n_arr = jnp.full((1,), n, jnp.int32)
    npad = S.npad_for(n)
    args_dev = ([jax.device_put(x, dev) for x in t.arrays]
                + [jax.device_put(np.asarray(x), dev) for x in wt.arrays])
    dense = jax.device_put(np.zeros(1, np.int32), dev)

    ref_out = None
    variants = []
    for tree in (False, True):
        for split in (False, True):
            for unroll in (2, 4, 8):
                variants.append((tree, split, unroll))
    for tree, split, unroll in variants:
        S.LOOKUP_TREE_MIN = 4 if tree else (1 << 30)
        try:
            pipe = jax.jit(S.build_pipeline(
                a, t, npad=npad, cap=4096, kernel_only=True, aligned=True,
                unroll=unroll, split_loops=split, walk_tables=wt))
            ms = timeit(pipe, (args_dev, dense, data_dev, n_arr)) * 1e3
            out, bits = pipe(args_dev, dense, data_dev, n_arr)
            fp = int(np.asarray(jnp.sum(out.astype(jnp.uint32)
                                        * (jnp.arange(out.size,
                                                      dtype=jnp.uint32)
                                           % 8191 + 1))[None])[0])
            bfp = int(np.asarray(jnp.sum(
                jax.lax.population_count(bits))[None])[0])
            if ref_out is None:
                ref_out = (fp, bfp)
            ok = (fp, bfp) == ref_out
            print(json.dumps({"tree": tree, "split": split, "unroll": unroll,
                              "kernel_ms_64mb": round(ms, 3),
                              "parity": ok}), flush=True)
        except Exception as e:
            print(json.dumps({"tree": tree, "split": split, "unroll": unroll,
                              "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
