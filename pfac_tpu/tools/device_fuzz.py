"""On-device randomized differential fuzz: compiled engines vs golden.

The pytest suite runs on a CPU mesh (kernels in interpret mode); this tool
drives the COMPILED paths on the attached accelerator across randomized
rule sets and corpora — the only way to catch Mosaic lowering divergences.

Usage:  python -m pfac_tpu.tools.device_fuzz [--cases N] [--seed S]
Exits nonzero on the first mismatch, printing a reproducer.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _random_case(rng: np.random.Generator, heavy: bool = False,
                 wide: bool = False, allmatch: bool = False):
    if allmatch:
        # dense-block escape coverage (pallas_sieve DENSE_ESCAPE_DIV):
        # nearly every position survives, so whole kernel blocks take the
        # in-kernel walk — compiled, incl. block-boundary straddles
        ch = int(rng.integers(97, 123))
        deep = int(rng.integers(5, 60))
        pats = [bytes([ch]) * 4, bytes([ch]) * deep,
                bytes([ch, ch, 123, 124])]
        n = int(rng.integers(1_500_000, 2_500_000))
        data = bytearray(bytes([ch]) * n)
        for _ in range(30):                    # breaks + near-end edges
            off = int(rng.integers(0, n))
            data[off] = int(rng.integers(0, 97))
        return pats, bytes(data)
    alpha = int(rng.integers(2, 257))
    k = int(rng.integers(1, 200))
    pats, seen = [], set()
    for _ in range(k):
        # heavy cases use the Snort length range (1-243): walker steps past
        # depth 48/112 run COMPILED here, not just in interpret tests
        ln = (int(np.clip(rng.gamma(2.2, 9.0) + 4, 4, 243)) if heavy
              else int(np.clip(rng.gamma(1.8, 4.0) + 1, 1, 64)))
        p = bytes(rng.integers(0, alpha, size=ln).astype(np.uint8))
        if p not in seen:
            seen.add(p)
            pats.append(p)
    if wide:
        # > 32767 pattern IDs: wide m2/m3 encodings + the CSR row-gather
        # deep tier on the compiled path
        keys = rng.choice(1 << 16, size=33000, replace=False)
        wpats = [bytes([kk >> 8, kk & 0xFF]) for kk in keys]
        pats = wpats + [p for p in pats if len(p) >= 4][:50]
        n = int(rng.integers(100_000, 400_000))
        data = bytearray(rng.integers(0, 256, size=n)
                         .astype(np.uint8).tobytes())
        for _ in range(40):
            p = pats[int(rng.integers(0, len(pats)))]
            off = int(rng.integers(0, n - len(p) + 1))
            data[off:off + len(p)] = p
        return pats, bytes(data)
    if heavy:
        # virus-dense: the corpus is mostly pattern content; sized so the
        # survivor count spans several compiled walker rounds (64K each)
        n = int(rng.integers(1_500_000, 3_000_000))
        chunks, sz = [], 0
        while sz < n:
            p = pats[int(rng.integers(0, len(pats)))]
            chunks.append(p)
            sz += len(p)
        return pats, b"".join(chunks)[:n]
    n = int(rng.integers(1, 400_000))
    data = bytearray(rng.integers(0, alpha, size=n).astype(np.uint8).tobytes())
    # plant pattern occurrences, including at the very end
    for _ in range(min(20, n)):
        p = pats[int(rng.integers(0, len(pats)))]
        if len(p) <= n:
            off = int(rng.integers(0, n - len(p) + 1))
            data[off:off + len(p)] = p
    p = pats[0]
    if len(p) <= n:
        data[n - len(p):] = p
    return pats, bytes(data)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sharded", action="store_true",
                    help="also fuzz the sharded path on the local mesh")
    ap.add_argument("--heavy", action="store_true",
                    help="ALL cases virus-dense (default: every 5th case)")
    ap.add_argument("--windows-bitcast", action="store_true",
                    help="fuzz with the u8-bitcast prepare_windows variant")
    args = ap.parse_args(argv)

    if args.windows_bitcast:
        from ..backends import pallas_walk
        pallas_walk.WINDOWS_U8_BITCAST = True

    import os

    import jax

    # honor JAX_PLATFORMS=cpu even when a baked sitecustomize imported
    # jax before the env var could take effect (the config update is the
    # authoritative override on such images)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # the remote-compile helper costs ~100 s/program on tunneled runtimes;
    # fuzz compiles one pipeline per case, so cache hits matter
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pfac_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from ..core.automaton import Automaton
    from ..backends import golden
    from ..runtime.handle import Matcher

    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(args.seed)
    for case in range(args.cases):
        # every 5th case is virus-dense at a size whose survivor count
        # spans several heavy walker rounds; every 7th is a wide-ID
        # (CSR-tier) case; every 9th is all-match (dense-block escape) —
        # all run COMPILED, no monkeypatched constants
        heavy = args.heavy or case % 5 == 4
        wide = (not heavy) and case % 7 == 3
        allmatch = (not heavy) and (not wide) and case % 9 == 5
        pats, data = _random_case(rng, heavy=heavy, wide=wide,
                                  allmatch=allmatch)
        a = Automaton.from_patterns(pats)
        m = Matcher(automaton=a)
        got = m.match(data)
        exp = golden.match_dense_batch(a, data)
        if not np.array_equal(got, exp):
            bad = np.nonzero(got != exp)[0][:5]
            print(f"MISMATCH case={case} seed={args.seed} "
                  f"k={len(pats)} n={len(data)} at {bad.tolist()}")
            for b in bad:
                print(f"  pos {b}: got {got[b]} expected {exp[b]}")
            return 1
        ids, pos, cnt = m.match_reduce(data)
        gi, gp, gc = golden.reduce_result(exp)
        if not (cnt == gc and np.array_equal(pos[:cnt], gp)
                and np.array_equal(ids[:cnt], gi)):
            print(f"REDUCE MISMATCH case={case} seed={args.seed}")
            return 1
        if not heavy and not wide and len(data) < 500_000 and case % 4 == 2:
            # DEVICE-side reduce on BOTH engines: round 4 shipped a
            # wrong-on-TPU scatter-max on XlaMatcher.match_reduce_device
            # (duplicate sorted scatter indices mis-lower); keep the
            # compiled path covered on every engine tier
            from ..backends.xla import XlaMatcher
            d_dev = jax.device_put(np.frombuffer(data, np.uint8))
            for eng in (m._engine(), XlaMatcher(a, perf_mode="dense")):
                rd = eng.match_reduce_device(d_dev)
                di, dp, dc = (np.asarray(x) for x in rd)
                dc = int(dc)
                if not (dc == gc and np.array_equal(dp[:dc], gp)
                        and np.array_equal(di[:dc], gi)):
                    print(f"REDUCE-DEVICE MISMATCH case={case} "
                          f"engine={type(eng).__name__} seed={args.seed} "
                          f"count={dc} expected={gc}")
                    return 1
        if args.sharded:
            from ..dist.sharding import ShardedMatcher
            sm = ShardedMatcher(a)
            got2 = sm.match(data)
            if not np.array_equal(got2, exp):
                print(f"SHARDED MISMATCH case={case} seed={args.seed}")
                return 1
        nm = int((exp > 0).sum())
        kind = " heavy" if heavy else " wide" if wide else ""
        print(f"case {case:3d}: ok{kind}  "
              f"engine={type(m._engine()).__name__} "
              f"k={len(pats)} n={len(data)} matches={nm}", flush=True)
    print("all cases passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
