"""Walker-side stage decomposition on a DEFCON-like corpus (round 3).

The full pipeline is one jitted program; this times its stages as
separate jits on captured intermediates to see where each millisecond
goes: kernel-only, bcum, _compact (light + heavy caps), prepare_windows,
the walk kernel, and the deferred scatter. Numbers are per-dispatch
amortized (K-chain, one barrier).
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS_MB = 128
K = 8


def timeit(fn, *args, k=K):
    out = jax.tree_util.tree_leaves(fn(*args))[0]
    _ = np.asarray(out.reshape(-1)[:1])

    def once(kk):
        t0 = time.perf_counter()
        o = None
        for _ in range(kk):
            o = jax.tree_util.tree_leaves(fn(*args))[0]
        _ = np.asarray(o.reshape(-1)[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(k) for _ in range(3))
    return (tk - t1) / (k - 1)


def main():
    from bench import snort_like_patterns
    from pfac_tpu import Automaton
    import pfac_tpu.backends.pallas_sieve as S
    import pfac_tpu.backends.pallas_walk as W

    dev = jax.devices()[0]
    patterns = snort_like_patterns()
    a = Automaton.from_patterns(patterns)
    rng = np.random.default_rng(1)
    n = CORPUS_MB << 20
    # DEFCON-like: ~1.5% of bytes are planted pattern content
    data = rng.integers(32, 127, size=n, dtype=np.uint8)
    buf = bytearray(data.tobytes())
    budget, placed = int(n * 0.015), 0
    pats = [p for p in patterns if len(p) >= 4]
    while placed < budget:
        p = pats[int(rng.integers(0, len(pats)))]
        o = int(rng.integers(0, n - len(p)))
        buf[o:o + len(p)] = p
        placed += len(p)
    arr = np.frombuffer(bytes(buf), dtype=np.uint8)
    data_dev = jax.device_put(arr, dev)
    n_arr = jnp.full((1,), n, jnp.int32)

    m = S.SieveMatcher(a)
    npad = S.npad_for(n)

    # full pipeline
    t_full = timeit(lambda: m._dispatch(data_dev, n=n)[0])
    print(f"full pipeline    : {t_full*1e3:8.2f} ms", flush=True)

    # kernel only
    pipe_k = jax.jit(S.build_pipeline(a, m.tables, npad=npad, cap=4096,
                                      kernel_only=True, aligned=True))
    args = m._table_args[:len(m.tables.arrays)]
    dense = m._dense_flat
    matches, bits = pipe_k(args, dense, data_dev, n_arr)
    matches.block_until_ready()
    t_k = timeit(lambda: pipe_k(args, dense, data_dev, n_arr))
    print(f"kernel only      : {t_k*1e3:8.2f} ms", flush=True)

    # bcum
    @jax.jit
    def f_bcum(b):
        return jnp.cumsum(jax.lax.population_count(b).sum(axis=1))
    bcum = f_bcum(bits)
    count = int(np.asarray(bcum)[-1])
    print(f"survivors        : {count}", flush=True)
    t_b = timeit(f_bcum, bits)
    print(f"bcum             : {t_b*1e3:8.2f} ms", flush=True)

    # compact at light + heavy caps
    for cap in (4096, 1 << 16):
        capg = -(-cap // 1024) * 1024
        f_c = jax.jit(lambda b, bc, capg=capg: S._compact(
            b, capg, npad, rank_offset=0, bcum=bc))
        t_c = timeit(f_c, bits, bcum)
        print(f"compact cap={capg:6d}: {t_c*1e3:8.2f} ms", flush=True)

    pos64, _ = jax.jit(lambda b, bc: S._compact(b, 1 << 16, npad,
                                                rank_offset=0, bcum=bc))(
        bits, bcum)

    # windows + walk at 64K
    wt = m.walk_tables
    if wt is not None:
        w_out, w_raw = W.window_geometry(wt.max_len)
        data2d = data_dev.reshape(-1, 128)
        f_w = jax.jit(lambda d2, p: W.prepare_windows(d2, p, w_raw))
        t_w = timeit(f_w, data2d, pos64)
        print(f"prepare_windows  : {t_w*1e3:8.2f} ms  (w_raw={w_raw})",
              flush=True)

        walkfn = W.build_walker(wt, cap=1 << 16,
                                sieve_tables=m.tables)
        n123 = W._n_m123_refs(m.tables)
        wargs = list(m._table_args[:n123]) + [
            jax.device_put(x, dev) for x in wt.arrays]
        # pass wargs/data2d as arguments — jit closures over big device
        # arrays blow the remote-compile request limit (CLAUDE.md rule)
        f_walk = jax.jit(lambda w, d2, p: walkfn(w, d2, p, n_arr))
        t_wk = timeit(f_walk, wargs, data2d, pos64)
        print(f"windows+walk 64K : {t_wk*1e3:8.2f} ms", flush=True)

    # deferred scatter: 1M sorted-unique pairs into the dense result
    bpos = jnp.concatenate([jnp.asarray(
        np.sort(rng.choice(npad, size=1 << 20, replace=False))
        .astype(np.int32))])
    bval = jnp.ones(1 << 20, jnp.int32)
    res0 = jnp.zeros(npad, jnp.int32)

    @jax.jit
    def f_sc(r, p, v):
        return r.at[p].set(v, mode="drop", indices_are_sorted=True,
                           unique_indices=True)
    t_s = timeit(f_sc, res0, bpos, bval)
    print(f"deferred scatter : {t_s*1e3:8.2f} ms  (1M pairs -> 512 MB)",
          flush=True)


if __name__ == "__main__":
    main()
