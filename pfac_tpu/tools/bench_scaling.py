"""Multi-chip scaling harness — ready to run the moment hardware appears.

Runs the sharded sieve engine over an N-chip mesh (default: every
addressable chip) and reports per-chip throughput + parallel efficiency
vs the single-device engine, one JSON line per mesh size. On this image
only one real chip is reachable, so the interesting deployment numbers
come from running this unchanged on a pod slice; the 1-chip-mesh line
measures shard_map overhead (should be within ~10% of bench.py).

Reference analog: the multi-GPU chunk+halo verification loop in
PFAC/test/omp_PFAC.cpp:343-439 (which measured per-GPU chunks serially).

Run:  python -m pfac_tpu.tools.bench_scaling [--mb 64] [--mesh 1,2,4,8]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def amortized(dispatch, k: int = 6, reps: int = 3) -> float:
    """(t_K - t_1)/(K-1) amortized seconds per dispatch (the only honest
    timing on tunneled runtimes; see DESIGN_NOTES.md). The barrier MUST
    slice on device before np.asarray — a full-array transfer rides the
    ~11 MB/s tunnel and swamps the measurement."""
    out = dispatch()
    _ = np.asarray(jax_leaf(out)[:1])

    def batch(j):
        t0 = time.perf_counter()
        o = None
        for _ in range(j):
            o = dispatch()
        _ = np.asarray(jax_leaf(o)[:1])
        return time.perf_counter() - t0

    t1 = min(batch(1) for _ in range(reps + 1))
    tk = min(batch(k) for _ in range(reps))
    return (tk - t1) / (k - 1)


def jax_leaf(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return x


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64, help="corpus MB (global)")
    ap.add_argument("--mesh", type=str, default="",
                    help="comma-separated mesh sizes (default: 1..ndev)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pfac_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import sys
    sys.path.insert(0, os.getcwd())     # bench.py lives at the repo root
    from bench import snort_like_patterns
    from pfac_tpu import Automaton
    from pfac_tpu.backends import golden
    from pfac_tpu.backends.pallas_sieve import SieveMatcher
    from pfac_tpu.dist.sharding import ShardedMatcher, make_data_mesh

    ndev = len(jax.devices())
    sizes = ([int(x) for x in args.mesh.split(",") if x]
             if args.mesh else
             sorted({s for s in (1, 2, 4, 8, 16, 32, ndev) if s <= ndev}))

    rng = np.random.default_rng(args.seed)
    pats = snort_like_patterns()
    a = Automaton.from_patterns(pats)
    n = args.mb << 20
    data = rng.integers(0, 256, size=n, dtype=np.uint8)

    # parity gate on a slice before any timing
    s = bytes(data[: 1 << 18].tobytes())
    single = SieveMatcher(a)
    assert np.array_equal(single.match(s), golden.match_dense(a, s)), \
        "single-device parity failed"

    # single-device baseline (the bench.py engine)
    dd = jax.device_put(data)
    t_single = amortized(lambda: single.match_device(dd))
    single.flush_checks()
    base_gbps = n / t_single / 1e9
    print(json.dumps({
        "harness": "scaling", "mesh": 0, "engine": "single",
        "bytes": n, "GBps": round(base_gbps, 3),
        "GBps_per_chip": round(base_gbps, 3), "efficiency": 1.0,
    }))

    for nd in sizes:
        mesh = make_data_mesh(nd)
        sm = ShardedMatcher(a, mesh=mesh, engine="sieve",
                            interpret=jax.default_backend() != "tpu")
        # shard-boundary parity on the slice (halo exchange correctness)
        assert np.array_equal(sm.match(s), golden.match_dense(a, s)), \
            f"sharded parity failed at mesh={nd}"
        shard_len = sm._shard_len(n)
        dg = sm._put(data, shard_len)
        fn, _ = sm._fn_for(n)
        mfn = fn[0] if isinstance(fn, tuple) else fn
        t = amortized(lambda: mfn(sm._tables, sm._dense_flat, dg))
        gbps = n / t / 1e9
        per_chip = gbps / nd
        print(json.dumps({
            "harness": "scaling", "mesh": nd, "engine": "sieve",
            "bytes": n, "GBps": round(gbps, 3),
            "GBps_per_chip": round(per_chip, 3),
            "efficiency": round(per_chip / base_gbps, 3),
        }))


if __name__ == "__main__":
    main()
