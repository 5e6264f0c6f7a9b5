"""Breakdown of the sieve+walk pipeline cost on the real chip.

Isolates: sieve kernel alone, old-tail pipeline, walker pipeline,
compaction, window prep, and the walker kernel, all with amortized
chained timing (see DESIGN_NOTES.md measurement methodology).
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS_MB = 128


def _barrier(out):
    x = jax.tree.leaves(out)[0]
    _ = np.asarray(x[tuple(slice(0, 1) for _ in x.shape)])  # 1-elem D2H


def chained(fn, d, k=8, outer=3):
    _barrier(fn(d))

    def once(j):
        t0 = time.perf_counter()
        o = None
        for _ in range(j):
            o = fn(d)
        _barrier(o)
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(outer + 1))
    tk = min(once(k) for _ in range(outer))
    return (tk - t1) / (k - 1)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/pfac_tpu_xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from bench import snort_like_patterns
    from pfac_tpu import Automaton
    import pfac_tpu.backends.pallas_sieve as S
    import pfac_tpu.backends.pallas_walk as W

    a = Automaton.from_patterns(snort_like_patterns())
    rng = np.random.default_rng(0)
    n = CORPUS_MB << 20
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    dd = jax.device_put(data)
    gb = n / 1e9
    npad = S.npad_for(n)
    n_arr = jnp.full((1,), n, jnp.int32)

    m = S.SieveMatcher(a)
    tabs, dense = m._table_args, m._dense_flat

    def report(label, t):
        print(f"{label:24s}: {t*1e3:8.2f} ms  {gb/t:6.2f} GB/s", flush=True)

    # 1. sieve kernel only
    ko = jax.jit(S.build_pipeline(a, m.tables, npad=npad, cap=4096,
                                  kernel_only=True, aligned=True))
    nt = len(m.tables.arrays)
    report("kernel only", chained(lambda d: ko(tabs[:nt], dense, d, n_arr), dd))
    out, bits = ko(tabs[:nt], dense, dd, n_arr)
    out2d = out.reshape(-1, 128)

    # 2. full pipeline, walker
    fw = jax.jit(S.build_pipeline(a, m.tables, npad=npad, cap=4096,
                                  aligned=True, walk_tables=m.walk_tables))
    report("pipeline walker", chained(lambda d: fw(tabs, dense, d, n_arr)[0], dd))

    # 3. full pipeline, old tail
    ft = jax.jit(S.build_pipeline(a, m.tables, npad=npad, cap=4096,
                                  aligned=True, walk_tables=None))
    report("pipeline old-tail", chained(lambda d: ft(tabs[:nt], dense, d, n_arr)[0], dd))

    # 4. compaction alone (light cap, with vals)
    cj = jax.jit(lambda b, o: S._compact(b, 4096, npad, vals2d=o))
    report("compact 4096+vals", chained(lambda d: cj(bits, out2d)[0], dd))
    cj2 = jax.jit(lambda b, o: S._compact(b, 65536, npad, vals2d=o))
    report("compact 65536+vals", chained(lambda d: cj2(bits, out2d)[0], dd))

    # 5. window prep + walker at 64K
    wt = m.walk_tables
    w_out, w_raw = W.window_geometry(wt.max_len)
    pos = jnp.asarray(
        np.sort(rng.choice(n - 256, size=65536, replace=False)).astype(np.int32))
    d2d = dd.reshape(-1, 128)
    pj = jax.jit(lambda p: W.prepare_windows(d2d, p, w_raw))
    report("windows 64K", chained(lambda d: pj(pos), dd))
    wk = jax.jit(W.build_walker(wt, cap=65536))
    wargs = tabs[nt:]
    report("walker-kernel 64K", chained(lambda d: wk(wargs, d2d, pos, n_arr), dd))

    # 6. scatter cost: .at[pos].set on the dense result
    sc = jax.jit(lambda m_, p, v: m_.at[p].set(v, mode="drop"))
    vals = jnp.ones(65536, jnp.int32)
    mm = out.reshape(-1)
    report("scatter 64K into 512MB", chained(lambda d: sc(mm, pos, vals), dd))


if __name__ == "__main__":
    main()
