"""Flagship benchmark: dense-table match throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, ...}

Baseline: the reference's headline number — 208.53 Gbps (26.07 GB/s) raw
match throughput on a GTX480 for Snort-scale patterns over 192 MB of
"pure" (random payload) packets (reference: PFAC/doc/PFAC_algorithm.pdf
Table 2; BASELINE.md). vs_baseline = ours / 26.07.

Workload mirrors the paper's setup statistics: ~2,000 patterns /
~42K pattern chars (Snort V2.8 scale), random-byte corpus, device-resident
input, dense (time-driven) table. Parity is asserted against the golden
model on a sample before timing.
"""
from __future__ import annotations

import json
import time

import numpy as np

CORPUS_MB = 128
K_BATCH = 8
BASELINE_GBPS = 208.53 / 8.0  # 26.07 GB/s


def snort_like_patterns(seed: int = 42, k: int = 2000) -> list[bytes]:
    """Synthetic rule set with Snort-paper statistics: k patterns, lengths
    1..243 skewed short (avg ~21), mixed text/binary bytes."""
    rng = np.random.default_rng(seed)
    pats = []
    for _ in range(k):
        ln = int(np.clip(rng.gamma(shape=2.2, scale=9.0) + 1, 1, 243))
        if rng.random() < 0.7:  # text-ish
            p = rng.integers(32, 127, size=ln, dtype=np.int64)
        else:  # binary
            p = rng.integers(0, 256, size=ln, dtype=np.int64)
        pats.append(bytes(p.astype(np.uint8)))
    # dedupe while keeping order (duplicate rules are rare in real sets)
    seen, out = set(), []
    for p in pats:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def main() -> None:
    import os

    import jax

    # persistent compile cache: the remote-compile helper costs ~100 s
    # per program on this runtime; cache hits skip part of that
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pfac_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from pfac_tpu import Automaton
    from pfac_tpu.backends import golden
    from pfac_tpu.runtime.handle import Matcher

    # device acquisition hangs indefinitely when the tunnel relay's
    # remote end is down; emit an honest failure line instead of hanging
    # the driver (the claim normally completes in seconds)
    import threading

    acquired = threading.Event()

    def _watchdog():
        if not acquired.wait(timeout=900):
            print(json.dumps({
                "metric": "dense_match_throughput_1chip", "value": 0.0,
                "unit": "GB/s", "vs_baseline": 0.0,
                "error": "device acquisition timed out (tunnel down)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    dev = jax.devices()[0]
    acquired.set()

    patterns = snort_like_patterns()
    automaton = Automaton.from_patterns(patterns)

    # --- correctness gate: conformance corpus parity before timing
    conf = Matcher([b"AB", b"ABG", b"BEDE", b"ED"], tile=256)
    assert conf.match(b"ABEDEDABG").tolist() == [1, 3, 4, 0, 4, 0, 2, 0, 0], (
        "conformance corpus parity failed"
    )

    # --- sample parity of the flagship automaton vs the golden model
    rng = np.random.default_rng(0)
    sample = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes())
    m = Matcher(automaton=automaton)
    assert m.match(sample).tolist() == golden.match_dense(automaton, sample).tolist(), (
        "flagship automaton parity failed"
    )

    # --- timed run: device-resident input, dense table
    n = CORPUS_MB * (1 << 20)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    data_dev = jax.device_put(data, dev)

    eng = m._engine()
    # full-corpus parity gate: the ENTIRE timed corpus is verified against
    # the vectorized oracle before any number is reported. The dense
    # result stays on device (the tunnel moves ~11 MB/s); a position-
    # weighted fingerprint + an exact 4 MB slice compare stand in for the
    # 512 MB transfer — any divergence perturbs the fingerprint.
    import jax.numpy as jnp

    out_dev = eng.match_device(data_dev)
    if hasattr(eng, "flush_checks"):
        eng.flush_checks()

    @jax.jit
    def fingerprint(r):
        r = r[:n].astype(jnp.uint32)
        w = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
        return jnp.stack([jnp.sum(r), jnp.sum(r * w),
                          jnp.sum(r > 0).astype(jnp.uint32)])

    got_fp = np.asarray(fingerprint(out_dev), dtype=np.uint64)
    expected_full = golden.match_dense_batch(automaton, data)
    ew = (np.arange(n, dtype=np.uint64) * 2654435761) & 0xFFFFFFFF
    ef = expected_full.astype(np.uint64)
    exp_fp = np.array([ef.sum() & 0xFFFFFFFF,
                       ((ef * ew) & 0xFFFFFFFF).sum() & 0xFFFFFFFF,
                       int((ef > 0).sum()) & 0xFFFFFFFF], dtype=np.uint64)
    assert np.array_equal(got_fp & 0xFFFFFFFF, exp_fp), \
        f"full-corpus parity fingerprint failed: {got_fp} != {exp_fp}"
    sl = 4 << 20
    assert np.array_equal(np.asarray(out_dev[:sl]), expected_full[:sl]), \
        "slice parity failed"
    del expected_full
    out = eng.match_device(data_dev)          # compile + warmup
    _ = np.asarray(out[:8])
    if hasattr(eng, "flush_checks"):
        # the unified pipeline handles every survivor density in one
        # program; an overflow here (extremely deep + dense ruleset) cannot
        # be cleared by re-dispatch, so let the PfacError surface
        eng.flush_checks()

    # NB: on this platform block_until_ready() can return before execution
    # completes, and a tiny D2H transfer costs a ~30 ms tunnel round trip.
    # Honest per-iteration time therefore comes from amortization: time K
    # dispatches ending in ONE barrier vs 1 dispatch + barrier, and report
    # (t_K - t_1) / (K - 1). TPU programs execute in order, so the final
    # barrier implies completion of the whole batch.
    def batch(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = eng.match_device(data_dev)
        _ = np.asarray(out[:8])
        return time.perf_counter() - t0

    # variance discipline (round-4): one amortized estimate is not
    # trustworthy — run-to-run noise is 5-10% on this runtime. Collect
    # independent estimates until three of them sit within 10% of their
    # median (up to 8 tries), and report that median plus the spread.
    estimates = []
    spread = None
    for _ in range(8):
        t1 = min(batch(1) for _ in range(2))
        tk = min(batch(K_BATCH) for _ in range(2))
        estimates.append((tk - t1) / (K_BATCH - 1))
        if len(estimates) >= 3:
            se = sorted(estimates)
            best3 = min((se[i:i + 3] for i in range(len(se) - 2)),
                        key=lambda w: w[-1] - w[0])
            spread = (best3[-1] - best3[0]) / best3[1]
            if spread <= 0.10:
                dt = best3[1]
                break
    else:
        dt = float(np.median(estimates))
    if hasattr(eng, "flush_checks"):
        eng.flush_checks()                    # validate deferred survivor caps
    gbps = n / dt / 1e9

    n_matched = int(np.asarray((out > 0).sum()))
    print(json.dumps({
        "metric": "dense_match_throughput_1chip",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        "corpus_mb": CORPUS_MB,
        "num_patterns": len(patterns),
        "num_states": automaton.num_states,
        "matches": n_matched,
        "iters": len(estimates),
        "time_s": round(dt, 4),
        "estimates_ms": [round(e * 1e3, 2) for e in estimates],
        "spread": None if spread is None else round(spread, 4),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
