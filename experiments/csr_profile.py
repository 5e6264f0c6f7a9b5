"""Big-tier (CSR) cost decomposition + alive-resid width A/B (round 5).

The r5 stage split (logs_r5/big_tier_split.log) proved per-position XLA
gathers are ROW-RATE-bound (~0.16 G rows/s): the keys-only entry filter
costs 423 ms/64 MB — worse than any in-kernel plane scan. This harness
decides the big tier's real shape:

  kernel_resid8    in-kernel alive, 8-bit residuals (256+disp planes,
                   FP ~2^-8 -> ~750K dud survivors -> ~23 CSR rounds)
  kernel_resid16   in-kernel alive, 16-bit residuals (512+disp planes,
                   FP ~2^-16 -> ~true survivors only)
  one CSR round at production cap, stage-by-stage:
                   compact / +windowsA / +entry / +stageA / full round

Flip rule: min total (kernel + expected rounds x round_ms) sets the CSR
tier's resid width; the stage split directs the round-cost attack.
"""
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def amort(fn, args, k=3, reps=2):
    o = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])

    def batch(j):
        t0 = time.perf_counter()
        for _ in range(j):
            o = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])
        return time.perf_counter() - t0

    t1 = min(batch(1) for _ in range(reps + 1))
    tk = min(batch(k) for _ in range(reps))
    return (tk - t1) / (k - 1)


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pfac_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pfac_tpu import Automaton
    import pfac_tpu.backends.pallas_sieve as S
    from pfac_tpu.backends import xla_csr as C
    from pfac_tpu.backends.pallas_walk import GROUP, build_align
    from pfac_tpu.backends.xla import _prefix_1d

    dev = jax.devices()[0]
    rng = np.random.default_rng(42)
    kbig = 100_000
    lens = np.clip(rng.gamma(3.0, 18.0, size=kbig) + 8, 8, 200).astype(int)
    raw = rng.integers(0, 256, size=int(lens.sum()), dtype=np.uint8)
    off, bpats, seenb = 0, [], set()
    for ln in lens:
        p = raw[off:off + ln].tobytes(); off += ln
        if p not in seenb:
            seenb.add(p); bpats.append(p)
    a = Automaton.from_patterns(bpats)
    n = 64 << 20
    text = rng.integers(32, 127, size=n, dtype=np.uint8)
    buf = bytearray(text.tobytes())
    budget, placed = int(n * 0.002), 0
    while placed < budget:
        p = bpats[int(rng.integers(0, len(bpats)))]
        o = int(rng.integers(0, n - len(p)))
        buf[o:o + len(p)] = p; placed += len(p)
    dd = jax.device_put(np.frombuffer(bytes(buf), np.uint8), dev)
    n_arr = jnp.full((1,), n, jnp.int32)
    npad = S.npad_for(n)
    dense0 = jax.device_put(np.zeros(1, np.int32), dev)
    ct = C.build_csr_tables(a)

    # ---- kernel-only, resid8 vs resid16 alive (in-kernel CHD)
    saved_max, saved_r8 = S._ALIVE_CHD_MAX, S._RESID8_THRESHOLD
    results = {}
    for tag, r8_thresh in (("kernel_resid8", 8192),
                           ("kernel_resid16", 1 << 30)):
        S._ALIVE_CHD_MAX = 1 << 30
        S._RESID8_THRESHOLD = r8_thresh
        t = S.SieveTables.build(a)
        targs = ([jax.device_put(x, dev) for x in t.arrays]
                 + [jax.device_put(np.asarray(x), dev) for x in ct.arrays])
        kfn = jax.jit(S.build_pipeline(a, t, npad=npad, cap=4096,
                                       aligned=True, kernel_only=True,
                                       csr_tables=ct))
        ms = amort(lambda *x: kfn(*x)[0], (targs, dense0, dd, n_arr)) * 1e3
        out, bits = kfn(targs, dense0, dd, n_arr)
        surv = int(np.asarray(jax.jit(
            lambda b: jax.lax.population_count(b).sum())(bits)))
        rec = {"variant": tag, "kernel_ms_64mb": round(ms, 3),
               "survivors": surv,
               "alive_words_planes": t.alive.words.shape[0] // 8}
        print(json.dumps(rec), flush=True)
        results[tag] = (targs, t, bits)

    # ---- CSR round stage split (resid16 bits: true survivors)
    targs, t, bits = results["kernel_resid16"]
    walk_args = [jax.device_put(np.asarray(x), dev) for x in ct.arrays]
    rowcnt = jax.jit(lambda b: jax.lax.population_count(b).sum(axis=1))(bits)
    bcum = jax.jit(_prefix_1d)(rowcnt)
    hc = min(-(-S.HEAVY_CAP // GROUP) * GROUP, npad)
    data2d = dd.reshape(-1, 128)
    out2d0 = jnp.zeros((npad // 128, 128), jnp.int32)

    wA = C._stage_wout(min(ct.max_len, S._HEAVY_D1) + 4)
    alignA = build_align(cap=hc, w_out=wA)
    entry_dev = walk_args[0]

    def mk_compact():
        @jax.jit
        def f(bits, bcum):
            pos, _, kv = S._compact(bits, hc, npad, rank_offset=0,
                                    bcum=bcum, vals2d=out2d0)
            return pos
        return f

    def mk_align():
        @jax.jit
        def f(bits, bcum, data2d):
            pos, _, kv = S._compact(bits, hc, npad, rank_offset=0,
                                    bcum=bcum, vals2d=out2d0)
            return alignA(data2d, pos)
        return f

    def mk_entry():
        @jax.jit
        def f(bits, bcum, data2d, n_arr):
            pos, _, kv = S._compact(bits, hc, npad, rank_offset=0,
                                    bcum=bcum, vals2d=out2d0)
            al = alignA(data2d, pos)
            byteA = C._byte_reader(al, pos & 3, hc // GROUP, wA)
            b0, b1, b2, b3 = byteA(0), byteA(1), byteA(2), byteA(3)
            key4 = (((((b0 << 8) | b1) << 8) | b2) << 8) | b3
            st, m = C._entry_probe(entry_dev, ct.entry_lgb, ct.entry_width,
                                   key4, n_arr[0] - pos)
            return st + m
        return f

    def mk_full():
        wfn = C.build_csr_walker(ct, cap=hc)

        @jax.jit
        def f(bits, bcum, data2d, n_arr):
            pos, _, kv = S._compact(bits, hc, npad, rank_offset=0,
                                    bcum=bcum, vals2d=out2d0)
            merged, o = wfn(walk_args, data2d, pos, n_arr)
            return merged
        return f

    prev = 0.0
    for name, fn, args in (
            ("compact", mk_compact(), (bits, bcum)),
            ("(+)windowsA", mk_align(), (bits, bcum, data2d)),
            ("(+)entry", mk_entry(), (bits, bcum, data2d, n_arr)),
            ("full_round", mk_full(), (bits, bcum, data2d, n_arr))):
        ms = amort(fn, args) * 1e3
        print(json.dumps({"stage": name, "ms": round(ms, 3),
                          "marginal_ms": round(ms - prev, 3)}), flush=True)
        prev = ms

    S._ALIVE_CHD_MAX, S._RESID8_THRESHOLD = saved_max, saved_r8


if __name__ == "__main__":
    main()
