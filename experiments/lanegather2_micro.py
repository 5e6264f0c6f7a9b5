"""Lane-gather composite v2: table pre-expanded to sublane-replicated planes.

Layout: a W-word table becomes P = ceil(W/128) planes, plane p an (8,128)
vreg with every sublane equal to words[p*128:(p+1)*128]. A probe of word w
is then: for p: g = take_along_axis(plane_p, w&127, axis=1);
acc = select(w>>7 == p, g, acc). One gather + one compare + one select per
plane, no in-kernel broadcasts.

Also validates lane-gather semantics exactly.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def bench(fn, *args, iters=30):
    out = fn(*args)
    out.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return np.median(ts), out


def expand_planes(words: np.ndarray) -> np.ndarray:
    """words[W] -> (P*8, 128): plane p rows all equal words[p*128:(p+1)*128]."""
    P = -(-words.shape[0] // LANES)
    pad = np.zeros(P * LANES, words.dtype)
    pad[: words.shape[0]] = words
    return np.repeat(pad.reshape(P, 1, LANES), 8, axis=1).reshape(P * 8, LANES)


def case_lane_gather_correct():
    """Exact semantics check of take_along_axis(t, idx, axis=1) in pallas."""
    def kernel(t_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(t_ref[:], idx_ref[:], axis=1)

    @jax.jit
    def run(t, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idx)

    rng = np.random.default_rng(1)
    t = rng.integers(0, 1 << 20, size=(8, LANES)).astype(np.int32)
    idx = rng.integers(0, LANES, size=(8, LANES)).astype(np.int32)
    out = np.asarray(run(jnp.asarray(t), jnp.asarray(idx)))
    exp = np.take_along_axis(t, idx, axis=1)
    return bool(np.array_equal(out, exp))


def case_planes(w_words, n_idx=16 << 20, tile_rows=512, unroll=8):
    n_planes = -(-w_words // LANES)

    def kernel(t_ref, idx_ref, out_ref):
        def sub_blk(r, _):
            w = idx_ref[pl.ds(r * 8, 8), :]
            lane = w & 127
            pno = w >> 7
            acc = jnp.zeros((8, LANES), jnp.int32)

            def step(gi, acc):
                for u in range(unroll):
                    p = gi * unroll + u
                    plane = t_ref[pl.ds(p * 8, 8), :]
                    g = jnp.take_along_axis(plane, lane, axis=1)
                    acc = jnp.where(pno == p, g, acc)
                return acc

            if n_planes >= unroll:
                acc = jax.lax.fori_loop(0, n_planes // unroll, step, acc)
            for p in range((n_planes // unroll) * unroll, n_planes):
                plane = t_ref[pl.ds(p * 8, 8), :]
                g = jnp.take_along_axis(plane, lane, axis=1)
                acc = jnp.where(pno == p, g, acc)
            out_ref[pl.ds(r * 8, 8), :] = acc
            return 0

        jax.lax.fori_loop(0, tile_rows // 8, sub_blk, 0)

    rng = np.random.default_rng(0)
    flat = rng.integers(0, 1 << 20, size=w_words).astype(np.int32)
    tab = expand_planes(flat)
    idx = rng.integers(0, w_words, size=(n_idx // LANES, LANES)).astype(np.int32)
    G = idx.shape[0] // tile_rows

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
            in_specs=[
                pl.BlockSpec((tab.shape[0], LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(table, idx)

    t, out = bench(run, jnp.asarray(tab), jnp.asarray(idx))
    i0 = np.asarray(idx[:64])
    ok = bool(np.array_equal(np.asarray(out[:64]), flat[i0]))
    return t, ok, n_idx


if __name__ == "__main__":
    print("lane-gather semantics ok:", case_lane_gather_correct())
    for w in (128, 512, 1024, 2048, 4096, 8192):
        try:
            t, ok, n = case_planes(w)
            print(f"planes W={w:5d} (P={-(-w//128):3d}): {t*1e3:8.3f} ms ok={ok}"
                  f"  {n/t/1e9:7.2f} G lookups/s")
        except Exception as e:
            print(f"planes W={w:5d}: FAILED {type(e).__name__}: {str(e)[:300]}")
