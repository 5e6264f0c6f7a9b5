"""Round-5 escape A/B: XLA-side dense-block escape vs none.

Round 4 shipped the dense-block escape INSIDE the sieve kernel and its
not-taken cost regressed the headline 35% (logs_r4/escape_ab.log:
esc_on 8.437 vs esc_off 6.238 ms/64 MB). Round 5 moved the decision to
XLA (popcounts the compaction needs anyway) and the walk to a separate
block-walk kernel dispatched only over dense blocks
(pallas_sieve.build_block_walk).

Arms (64 MB, flagship ruleset):
  kernel_only      the sieve kernel alone — escape-free by construction
                   now; must match r4's esc_off 6.238 ms/64 MB
  e2e_esc_on       full pipeline, random corpus, DENSE_ESCAPE_DIV=4:
                   the not-taken escape must cost ~0 vs e2e_esc_off
  e2e_esc_off      full pipeline, random corpus, escape disabled
  allmatch_esc_on  full pipeline on an all-'a' corpus (aaaa + deep
                   patterns): every block escapes
  allmatch_esc_off same corpus, per-survivor walker rounds only

Parity is cross-checked between on/off arms via a weighted fingerprint
of the full dense result (identical inputs, identical contract).
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


def timeit(fn, args, k=K, reps=3, first=1):
    out = fn(*args)
    _ = np.asarray(out[0].reshape(-1)[:1])

    def once(j):
        t0 = time.perf_counter()
        for _ in range(j):
            out = fn(*args)
        _ = np.asarray(out[0].reshape(-1)[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(reps + 1))
    tk = min(once(k) for _ in range(reps))
    return (tk - t1) / (k - 1)


def fp(out):
    r = out.reshape(-1)
    return int(np.asarray(jnp.sum(
        r.astype(jnp.uint32)
        * (jnp.arange(r.size, dtype=jnp.uint32) % 8191 + 1))[None])[0])


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
    rand_dev = jax.device_put(
        rng.integers(0, 256, size=n, dtype=np.uint8), dev)
    n_arr = jnp.full((1,), n, jnp.int32)
    npad = S.npad_for(n)
    targs = ([jax.device_put(x, dev) for x in t.arrays]
             + [jax.device_put(np.asarray(x), dev) for x in wt.arrays])
    dense0 = jax.device_put(np.zeros(1, np.int32), dev)

    # ---- kernel-only (escape-free by construction now)
    pipe_k = jax.jit(S.build_pipeline(
        a, t, npad=npad, cap=4096, kernel_only=True, aligned=True,
        walk_tables=wt))
    ms = timeit(pipe_k, (targs, dense0, rand_dev, n_arr)) * 1e3
    print(json.dumps({"variant": "kernel_only",
                      "kernel_ms_64mb": round(ms, 3)}), flush=True)

    # ---- all-match corpus on an aaaa+deep ruleset (blocks escape)
    a2 = Automaton.from_patterns([b"aaaa", b"a" * 37])
    t2 = S.SieveTables.build(a2)
    wt2 = S.build_walk_tables_gated(a2, t2)
    am_dev = jax.device_put(np.full(n, ord("a"), np.uint8), dev)
    targs2 = ([jax.device_put(x, dev) for x in t2.arrays]
              + [jax.device_put(np.asarray(x), dev) for x in wt2.arrays])

    for corpus, aa, tt, wtt, ta, dd in (
            ("random", a, t, wt, targs, rand_dev),
            ("allmatch", a2, t2, wt2, targs2, am_dev)):
        ref = None
        for div in (4, 0):
            S.DENSE_ESCAPE_DIV = div
            pipe = jax.jit(S.build_pipeline(
                aa, tt, npad=npad, cap=4096, aligned=True, walk_tables=wtt))
            args = (ta, dense0, dd, n_arr)
            out = pipe(*args)[0]
            got = fp(out)
            ms = timeit(pipe, args,
                        k=3 if (corpus == "allmatch" and div == 0) else K,
                        reps=1 if (corpus == "allmatch" and div == 0) else 2)
            rec = {"variant": f"e2e_{corpus}_div{div}",
                   "ms_64mb": round(ms * 1e3, 3),
                   "GBps": round(n / ms / 1e9, 3)}
            if ref is not None:
                rec["parity"] = got == ref
            ref = got if ref is None else ref
            print(json.dumps(rec), flush=True)
    S.DENSE_ESCAPE_DIV = 4


if __name__ == "__main__":
    main()
