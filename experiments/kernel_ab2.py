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
  * resid8: force the alive filter to 8-bit residuals (VERDICT r3 lever
            b): the flagship ~1.9K-key table drops from 8 to 4 word
            planes (~12 of the ~86 VPU ops). Kernel out gains ~2^-8
            false alive bits, so parity is checked within the resid8
            family only (the full pipeline stays exact either way).
  * diag:   cost-share probes — kernel with m2+m3 dropped, alive
            dropped, and m1-only. NOT production output; the deltas
            attribute kernel_ms to probe families for the next design
            round.

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

    def fingerprint(pipe, args):
        out, bits = pipe(*args)
        fp = int(np.asarray(jnp.sum(out.astype(jnp.uint32)
                                    * (jnp.arange(out.size,
                                                  dtype=jnp.uint32)
                                       % 8191 + 1))[None])[0])
        bfp = int(np.asarray(jnp.sum(
            jax.lax.population_count(bits))[None])[0])
        return fp, bfp

    def measure(tag, tabs, wtabs, args, ref, extra):
        try:
            pipe = jax.jit(S.build_pipeline(
                a, tabs, npad=npad, cap=4096, kernel_only=True,
                aligned=True, unroll=extra["unroll"],
                split_loops=extra["split"], walk_tables=wtabs))
            ms = timeit(pipe, args) * 1e3
            got = fingerprint(pipe, args)
            rec = dict(extra)
            rec.update({"variant": tag, "kernel_ms_64mb": round(ms, 3)})
            if ref is not None:
                rec["parity"] = got == ref
            print(json.dumps(rec), flush=True)
            return got
        except Exception as e:
            rec = dict(extra)
            rec.update({"variant": tag, "error": repr(e)[:160]})
            print(json.dumps(rec), flush=True)
            return None

    args = (args_dev, dense, data_dev, n_arr)
    ref_out = None
    for tree in (False, True):
        for split in (False, True):
            for unroll in (2, 4, 8):
                S.LOOKUP_TREE_MIN = 4 if tree else (1 << 30)
                got = measure("main", t, wt, args, ref_out,
                              {"tree": tree, "split": split,
                               "unroll": unroll})
                if ref_out is None:
                    ref_out = got

    # --- resid8 arm (lever b): rebuild with 8-bit alive residuals.
    # Kernel out differs from resid16 by ~2^-8 extra alive bits, so
    # parity is within-family (the pipeline output stays exact).
    S._RESID8_THRESHOLD = 0
    t8 = S.SieveTables.build(a)
    wt8 = S.build_walk_tables_gated(a, t8)
    args8 = ([jax.device_put(x, dev) for x in t8.arrays]
             + [jax.device_put(np.asarray(x), dev) for x in wt8.arrays],
             dense, data_dev, n_arr)
    ref8 = None
    for tree in (False, True):
        for unroll in (4, 8):
            S.LOOKUP_TREE_MIN = 4 if tree else (1 << 30)
            got = measure("resid8", t8, wt8, args8, ref8,
                          {"tree": tree, "split": False, "unroll": unroll})
            if ref8 is None:
                ref8 = got
    S._RESID8_THRESHOLD = 8192
    S.LOOKUP_TREE_MIN = 1 << 30

    # --- resid8 END-TO-END arm: the kernel-only delta is only half the
    # trade. resid8's ~2^-8 false alive bits are CORPUS-sized survivors
    # (64 MB random traffic: ~262K extra, ~4 extra 64K heavy walker
    # rounds) — a cost the kernel-only arm can't see. The
    # _RESID8_THRESHOLD flip is decided HERE, on the full pipeline at
    # production cap; both families are exact end-to-end, so parity is
    # cross-family and must hold.
    def measure_e2e(tag, tabs, wtabs, args, ref):
        try:
            pipe = jax.jit(S.build_pipeline(
                a, tabs, npad=npad, cap=4096, aligned=True,
                walk_tables=wtabs))

            def fn(ta, df, du, na):
                out, cnt, ovf = pipe(ta, df, du, na)
                return out, cnt
            ms = timeit(jax.jit(fn), args) * 1e3
            out, cnt, ovf = pipe(*args)
            fp = int(np.asarray(jnp.sum(
                out.astype(jnp.uint32)
                * (jnp.arange(out.size, dtype=jnp.uint32) % 8191 + 1)
            )[None])[0])
            rec = {"variant": tag, "e2e_ms_64mb": round(ms, 3),
                   "matches": int(np.asarray(cnt[None])[0]),
                   "overflow": int(np.asarray(ovf[None])[0])}
            if ref is not None:
                rec["parity"] = fp == ref
            print(json.dumps(rec), flush=True)
            return fp
        except Exception as e:
            print(json.dumps({"variant": tag, "error": repr(e)[:160]}),
                  flush=True)
            return None

    ref_fp = measure_e2e("e2e_resid16", t, wt, args, None)
    measure_e2e("e2e_resid8", t8, wt8, args8, ref_fp)

    # --- cost-share diagnostics: drop probe families. Output is NOT the
    # production contract (missing match families / alive bits); the
    # kernel_ms deltas attribute cost per family.
    import dataclasses
    for tag, mod in (("diag_no_m23", dict(m2=None, m3=None)),
                     ("diag_no_alive", dict(alive=None)),
                     ("diag_m1_only", dict(m2=None, m3=None, alive=None))):
        td = dataclasses.replace(t, **mod)
        argsd = ([jax.device_put(x, dev) for x in td.arrays]
                 + [jax.device_put(np.asarray(x), dev) for x in wt.arrays],
                 dense, data_dev, n_arr)
        measure(tag, td, wt, argsd, None,
                {"tree": False, "split": False, "unroll": 4})


if __name__ == "__main__":
    main()
