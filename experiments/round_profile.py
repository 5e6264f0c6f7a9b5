"""Walker-round cost decomposition on a DEFCON-like corpus (round 3).

Builds the component chain compact -> +windows -> +walk -> +scatter as
separate programs over REAL kernel bits, each timed amortized; successive
differences give per-component cost per 64K-survivor round.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS_MB = 128
ROUNDS = 4
CAP = 1 << 16


def amortized(fn, args, k=6, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])

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
    from bench import snort_like_patterns
    from pfac_tpu import Automaton
    from pfac_tpu.backends import pallas_sieve as S
    from pfac_tpu.backends.pallas_walk import (GROUP, build_walker,
                                               prepare_windows,
                                               window_geometry,
                                               build_walk_tables)
    from pfac_tpu.backends.xla import dense_device_table

    dev = jax.devices()[0]
    pats = snort_like_patterns()
    a = Automaton.from_patterns(pats)
    tables = S.SieveTables.build(a)
    wt = build_walk_tables(a)
    print("walk vmem:", wt.vmem_bytes, flush=True)

    rng = np.random.default_rng(42)
    n = CORPUS_MB << 20
    npad = S.npad_for(n)
    text = rng.integers(32, 127, size=npad, dtype=np.uint8)
    buf = bytearray(text.tobytes())
    budget = int(n * 0.015)
    placed = 0
    while placed < budget:
        p = pats[int(rng.integers(0, len(pats)))]
        off = int(rng.integers(0, n - len(p)))
        buf[off:off + len(p)] = p
        placed += len(p)
    data = np.frombuffer(bytes(buf), dtype=np.uint8)
    dd = jax.device_put(data, dev)
    n_arr = jnp.full((1,), n, jnp.int32)
    targs = [jax.device_put(jnp.asarray(x), dev) for x in tables.arrays]
    wargs = [jax.device_put(jnp.asarray(x), dev) for x in wt.arrays]
    dense_flat = jax.device_put(
        jnp.asarray(dense_device_table(a).reshape(-1)), dev)

    # kernel bits, device-resident
    kfn = jax.jit(S.build_pipeline(a, tables, npad=npad, cap=1 << 12,
                                   aligned=True, kernel_only=True))
    print("compiling kernel...", flush=True)
    out, bits = kfn(targs, dense_flat, dd, n_arr)
    nsurv = int(np.asarray(jax.jit(
        lambda b: jax.lax.population_count(b).sum())(bits)))
    print("survivors:", nsurv, flush=True)
    t = amortized(lambda d: kfn(targs, dense_flat, d, n_arr)[0], (dd,))
    print(f"kernel_only      : {t*1e3:8.2f} ms", flush=True)

    data2d = dd.reshape(npad // 128, 128)
    w_out, w_raw = window_geometry(wt.max_len)
    from pfac_tpu.backends.pallas_walk import _n_m123_refs
    m123 = targs[:_n_m123_refs(tables)]
    walkfn = build_walker(wt, cap=CAP, sieve_tables=tables)

    bcum_fn = jax.jit(lambda b: jnp.cumsum(
        jax.lax.population_count(b).sum(axis=1)))
    bcum = bcum_fn(bits)

    def mk_compact():
        @jax.jit
        def f(bits, bcum):
            acc = jnp.int32(0)
            for i in range(ROUNDS):
                pos, _ = S._compact(bits, CAP, npad, rank_offset=i * CAP,
                                    bcum=bcum)
                acc += jnp.sum(pos)
            return acc
        return f

    def mk_windows():
        @jax.jit
        def f(bits, bcum, data2d):
            acc = jnp.int32(0)
            for i in range(ROUNDS):
                pos, _ = S._compact(bits, CAP, npad, rank_offset=i * CAP,
                                    bcum=bcum)
                raw = prepare_windows(data2d, pos, w_raw)
                acc += jnp.sum(raw[:1]) + jnp.sum(pos)
            return acc
        return f

    def mk_walk():
        @jax.jit
        def f(bits, bcum, data2d):
            acc = jnp.int32(0)
            for i in range(ROUNDS):
                pos, _ = S._compact(bits, CAP, npad, rank_offset=i * CAP,
                                    bcum=bcum)
                merged = walkfn(list(m123) + list(wargs), data2d, pos, n_arr)
                acc += jnp.sum(merged)
            return acc
        return f

    def mk_scatter():
        @jax.jit
        def f(bits, bcum, data2d, res):
            for i in range(ROUNDS):
                pos, _ = S._compact(bits, CAP, npad, rank_offset=i * CAP,
                                    bcum=bcum)
                merged = walkfn(list(m123) + list(wargs), data2d, pos, n_arr)
                res = res.at[pos].set(merged, mode="drop")
            return res
        return f

    def mk_buffered():
        # the PRODUCTION heavy-round form: rounds buffer (pos, val) and
        # ONE sorted full-output scatter lands them all — attributes the
        # deferred-scatter cost the per-round form above hides
        @jax.jit
        def f(bits, bcum, data2d, res):
            bb = ROUNDS * CAP
            bpos = npad + bb + jnp.arange(bb, dtype=jnp.int32)
            bval = jnp.zeros(bb, jnp.int32)
            for i in range(ROUNDS):
                pos, _ = S._compact(bits, CAP, npad, rank_offset=i * CAP,
                                    bcum=bcum)
                merged = walkfn(list(m123) + list(wargs), data2d, pos, n_arr)
                bpos = jax.lax.dynamic_update_slice(bpos, pos, (i * CAP,))
                bval = jax.lax.dynamic_update_slice(bval, merged, (i * CAP,))
            return res.at[bpos].set(bval, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
        return f

    def mk_oneshot_scatter():
        # the one-shot sorted scatter ALONE: ROUNDS*CAP sorted-unique
        # pairs into the corpus-sized dense result. Sorted+unique lowers
        # to a full-output pass — if this reads ~res-size*2 of HBM it is
        # the DEFCON regime's missing ~6 ms (VERDICT r4 hunt)
        @jax.jit
        def f(bpos, bval, res):
            return res.at[bpos].set(bval, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
        return f

    res0 = jnp.zeros(npad, jnp.int32)
    bb = ROUNDS * CAP
    bpos_s = jnp.sort(jnp.asarray(
        rng.choice(npad, size=bb, replace=False).astype(np.int32)))
    bval_s = jnp.ones(bb, jnp.int32)
    steps = [("compact", mk_compact(), (bits, bcum)),
             ("(+)windows", mk_windows(), (bits, bcum, data2d)),
             ("(+)walk", mk_walk(), (bits, bcum, data2d)),
             ("(+)scatter", mk_scatter(), (bits, bcum, data2d, res0)),
             ("(+)buffered", mk_buffered(), (bits, bcum, data2d, res0))]
    prev = 0.0
    for name, fn, args in steps:
        print(f"compiling {name}...", flush=True)
        t = amortized(fn, args)
        print(f"{name:12s}: {t*1e3:8.2f} ms total, "
              f"{(t-prev)*1e3/ROUNDS:6.2f} ms/round marginal", flush=True)
        prev = t
    t = amortized(mk_oneshot_scatter(), (bpos_s, bval_s, res0))
    print(f"oneshot sorted scatter ({bb} pairs -> {npad} dense): "
          f"{t*1e3:8.2f} ms", flush=True)

    # HEAVY_CAP re-sweep under the round-4 structure: the 64K optimum
    # was measured with per-round sorted scatters (round 2); with
    # buffered/per-index scatters, larger rounds amortize the fixed
    # rank-search + dispatch cost over more survivors (virus-dense needs
    # ~15 ns/survivor to reach the reference's 1.12 GB/s)
    def mk_buffered_cap(cap_r, rounds_r):
        wfn = build_walker(wt, cap=cap_r, interpret=False,
                           sieve_tables=tables)

        @jax.jit
        def f(bits, bcum, data2d, res):
            bb2 = rounds_r * cap_r
            bpos = npad + bb2 + jnp.arange(bb2, dtype=jnp.int32)
            bval = jnp.zeros(bb2, jnp.int32)
            for i in range(rounds_r):
                pos, _ = S._compact(bits, cap_r, npad,
                                    rank_offset=i * cap_r, bcum=bcum)
                merged = wfn(list(m123) + list(wargs), data2d, pos, n_arr)
                bpos = jax.lax.dynamic_update_slice(bpos, pos, (i * cap_r,))
                bval = jax.lax.dynamic_update_slice(bval, merged,
                                                    (i * cap_r,))
            return res.at[bpos].set(bval, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
        return f

    total = ROUNDS * CAP                       # same survivor coverage
    for cap_r in (1 << 15, 1 << 16, 1 << 17, 1 << 18):
        rounds_r = max(1, total // cap_r)
        fn = mk_buffered_cap(cap_r, rounds_r)
        t = amortized(fn, (bits, bcum, data2d, res0))
        print(f"cap={cap_r:7d} x {rounds_r} rounds ({total} survivors): "
              f"{t*1e3:8.2f} ms total, {t*1e9/total:6.1f} ns/survivor",
              flush=True)

    # production-walker align-strategy A/B (the align inside the real
    # kernel, not just align_micro's standalone form): linear scan vs
    # select tree. (The sublane-gather arm was removed in round 5:
    # Mosaic cannot lower axis-0 dynamic gathers on this chip at all —
    # lowering assert + compiler INVALID_ARGUMENT, logs_r5.) acc doubles
    # as the parity check — both modes must print the same value.
    import pfac_tpu.backends.pallas_walk as W
    for mode in ("linear", "tree"):
        W.ALIGN_TREE = mode == "tree"
        try:
            wfn2 = build_walker(wt, cap=CAP, sieve_tables=tables)

            @jax.jit
            def fwalk(bits, bcum, data2d):
                acc = jnp.int32(0)
                for i in range(ROUNDS):
                    pos, _ = S._compact(bits, CAP, npad,
                                        rank_offset=i * CAP, bcum=bcum)
                    merged = wfn2(list(m123) + list(wargs), data2d, pos,
                                  n_arr)
                    acc += jnp.sum(merged)
                return acc
            t = amortized(fwalk, (bits, bcum, data2d))
            acc = int(np.asarray(fwalk(bits, bcum, data2d)[None])[0])
            print(f"walk rounds align={mode}: {t*1e3:8.2f} ms "
                  f"({ROUNDS} rounds, acc={acc})", flush=True)
        except Exception as e:
            print(f"walk rounds align={mode}: ERROR {e!r}"[:200],
                  flush=True)
    W.ALIGN_TREE = False


if __name__ == "__main__":
    main()
