"""Alive-filter structure A/B (round 5): two-level CHD vs one-level
bucket-fingerprint.

The r4 probe-family split (MEASUREMENTS.md) showed the alive filter is
64% of the sieve kernel and LATENCY-bound on its disp->word dependent
gather chain (~73 cy each level). The bucket2 structure
(chd.build_bucket2) has ONE gather on the critical path (bucket word =
two fp16) plus a small independent overflow CHD whose latency hides
under it — it trades ~2x the plane-scan issue ops for a full gather
level of latency.

Arms (64 MB random corpus, flagship snort-like ruleset):
  chd     production two-level fused CHD (resid16)
  b2_0    bucket2, m = pow2(n) buckets  (~16 main planes, ~8% overflow)
  b2_m1   bucket2, m = pow2(n)/2        (~8 main planes, ~27% overflow)
  b2_p1   bucket2, m = pow2(n)*2        (~32 main planes, ~2% overflow)

Each arm reports kernel-only ms and e2e ms; e2e fingerprints must MATCH
across arms (alive false positives die in the exact walker, so the final
result is structure-independent). Flip rule: min e2e_ms with parity True
sets ALIVE_BUCKET2_MAX / ALIVE_B2_LGM_DELTA.
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


def timeit(fn, args, k=K, reps=3):
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
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    dd = jax.device_put(rng.integers(0, 256, size=n, dtype=np.uint8), dev)
    n_arr = jnp.full((1,), n, jnp.int32)
    npad = S.npad_for(n)
    dense0 = jax.device_put(np.zeros(1, np.int32), dev)

    def fp(out):
        r = out.reshape(-1)
        return int(np.asarray(jnp.sum(
            r.astype(jnp.uint32)
            * (jnp.arange(r.size, dtype=jnp.uint32) % 8191 + 1))[None])[0])

    ref = None
    for tag, b2max, delta in (("chd", 0, 0), ("b2_0", 1 << 20, 0),
                              ("b2_m1", 1 << 20, -1),
                              ("b2_p1", 1 << 20, 1)):
        S.ALIVE_BUCKET2_MAX = b2max
        S.ALIVE_B2_LGM_DELTA = delta
        try:
            t = S.SieveTables.build(a)
            wt = S.build_walk_tables_gated(a, t)
            targs = ([jax.device_put(x, dev) for x in t.arrays]
                     + [jax.device_put(np.asarray(x), dev)
                        for x in wt.arrays])
            n_ovf = (0 if t.alive_ovf is None
                     else t.alive_ovf.words.shape[0] // 8 * 128)
            kfn = jax.jit(S.build_pipeline(
                a, t, npad=npad, cap=4096, kernel_only=True, aligned=True,
                walk_tables=wt))
            kms = timeit(kfn, (targs, dense0, dd, n_arr)) * 1e3
            efn = jax.jit(S.build_pipeline(
                a, t, npad=npad, cap=4096, aligned=True, walk_tables=wt))
            out, cnt, _ = efn(targs, dense0, dd, n_arr)
            got = fp(out)
            ems = timeit(efn, (targs, dense0, dd, n_arr)) * 1e3
            rec = {"variant": tag, "kernel_ms_64mb": round(kms, 3),
                   "e2e_ms_64mb": round(ems, 3),
                   "survivors": int(cnt),
                   "main_planes": t.alive.words.shape[0] // 8,
                   "ovf_slots": n_ovf}
            if ref is not None:
                rec["parity"] = got == ref
            ref = got if ref is None else ref
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"variant": tag, "error": repr(e)[:200]}),
                  flush=True)
    S.ALIVE_BUCKET2_MAX = 0
    S.ALIVE_B2_LGM_DELTA = 0


if __name__ == "__main__":
    main()
