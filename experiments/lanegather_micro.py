"""Micro-experiment: lane-dimension dynamic gather support and cost.

The ladder kernel's _plane_lookup scans n_planes lane-replicated planes per
probe (O(table_words/8) selects). If Mosaic supports a fast lane-wise
dynamic gather (out[i,j] = t[i, idx[i,j]]), a (8,128)-major table layout
holds 1024 words per vreg instead of 8 — a 128x denser scan.

Cases:
  A. lane gather within one vreg: take_along_axis(t(8,128), idx, axis=1)
  B. 2-D composite: value at (sub[i,j], lane[i,j]) of one vreg via
     8x (sublane broadcast + lane gather + select)
  C. vreg-scan composite: table of W words as ceil(W/1024) vregs,
     per vreg do B, select by vreg id  -> the candidate _plane_lookup v2
  D. current plane-scan lookup for the same W (baseline)
"""
import functools
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


def run_pallas(kernel, table, idx, tile_rows):
    n_rows = idx.shape[0]
    G = n_rows // tile_rows

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
            in_specs=[
                pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(table, idx)

    return run


def case_lane_gather(n_idx=16 << 20, tile_rows=512):
    """A: out[i,j] = t[i & 7, idx[i,j]] via take_along_axis axis=1."""
    def kernel(t_ref, idx_ref, out_ref):
        t = t_ref[:]

        def sub(r, _):
            v = idx_ref[pl.ds(r * 8, 8), :]
            out_ref[pl.ds(r * 8, 8), :] = jnp.take_along_axis(t, v, axis=1)
            return 0

        jax.lax.fori_loop(0, tile_rows // 8, sub, 0)

    rng = np.random.default_rng(0)
    tab = rng.integers(0, 1 << 20, size=(8, LANES)).astype(np.int32)
    idx = rng.integers(0, LANES, size=(n_idx // LANES, LANES)).astype(np.int32)
    run = run_pallas(kernel, jnp.asarray(tab), jnp.asarray(idx), tile_rows)
    t, out = bench(run, jnp.asarray(tab), jnp.asarray(idx))
    exp = np.take_along_axis(
        np.broadcast_to(tab[:, None, :], (8, 2, LANES)).reshape(-1, LANES)[:16],
        np.asarray(idx[:16]), axis=1,
    )
    ok = bool(np.array_equal(np.asarray(out[:16]), exp))
    return t, ok, n_idx


def composite_1vreg(t, sub, lane):
    """value at (sub[i,j], lane[i,j]) within one (8,128) vreg."""
    acc = jnp.zeros_like(sub)
    for s in range(8):
        row = jnp.broadcast_to(t[s : s + 1, :], (8, LANES))
        g = jnp.take_along_axis(row, lane, axis=1)
        acc = jnp.where(sub == s, g, acc)
    return acc


def case_composite(w_words, n_idx=16 << 20, tile_rows=512):
    """C: word lookup from a W-word table laid out as vregs, full 2-D."""
    n_vregs = -(-w_words // 1024)

    def kernel(t_ref, idx_ref, out_ref):
        def sub_blk(r, _):
            w = idx_ref[pl.ds(r * 8, 8), :]
            lane = w & 127
            sub = (w >> 7) & 7
            vno = w >> 10
            acc = jnp.zeros((8, LANES), jnp.int32)
            for v in range(n_vregs):
                t = t_ref[pl.ds(v * 8, 8), :]
                g = composite_1vreg(t, sub, lane)
                acc = jnp.where(vno == v, g, acc) if n_vregs > 1 else g
            out_ref[pl.ds(r * 8, 8), :] = acc
            return 0

        jax.lax.fori_loop(0, tile_rows // 8, sub_blk, 0)

    rng = np.random.default_rng(0)
    flat = rng.integers(0, 1 << 20, size=n_vregs * 1024).astype(np.int32)
    tab = flat.reshape(n_vregs * 8, LANES)
    idx = rng.integers(0, w_words, size=(n_idx // LANES, LANES)).astype(np.int32)
    run = run_pallas(kernel, jnp.asarray(tab), jnp.asarray(idx), tile_rows)
    t, out = bench(run, jnp.asarray(tab), jnp.asarray(idx))
    # check: word w lives at vreg w>>10, sub (w>>7)&7, lane w&127 == flat[w]
    i0 = np.asarray(idx[:16])
    ok = bool(np.array_equal(np.asarray(out[:16]), flat[i0]))
    return t, ok, n_idx


def case_plane_scan(w_words, n_idx=16 << 20, tile_rows=512):
    """D: current lane-replicated plane scan for the same table size."""
    n_planes = -(-w_words // 8)

    def kernel(t_ref, idx_ref, out_ref):
        def sub_blk(r, _):
            w = idx_ref[pl.ds(r * 8, 8), :]
            sub = w & 7
            vno = w >> 3
            acc = jnp.zeros((8, LANES), jnp.int32)

            def step(gi, acc):
                base = gi * 8
                for u in range(8):
                    plane = t_ref[pl.ds((base + u) * 8, 8), :]
                    g = jnp.take_along_axis(plane, sub, axis=0)
                    acc = jnp.where(vno == base + u, g, acc)
                return acc

            acc = jax.lax.fori_loop(0, n_planes // 8, step, acc)
            out_ref[pl.ds(r * 8, 8), :] = acc
            return 0

        jax.lax.fori_loop(0, tile_rows // 8, sub_blk, 0)

    rng = np.random.default_rng(0)
    n_planes = -(-w_words // 8)
    w_pad = n_planes * 8
    flat = rng.integers(0, 1 << 20, size=w_pad).astype(np.int32)
    tab = np.broadcast_to(flat[:, None], (w_pad, LANES)).copy()
    idx = rng.integers(0, w_words, size=(n_idx // LANES, LANES)).astype(np.int32)
    run = run_pallas(kernel, jnp.asarray(tab), jnp.asarray(idx), tile_rows)
    t, out = bench(run, jnp.asarray(tab), jnp.asarray(idx))
    i0 = np.asarray(idx[:16])
    ok = bool(np.array_equal(np.asarray(out[:16]), flat[i0]))
    return t, ok, n_idx


if __name__ == "__main__":
    try:
        t, ok, n = case_lane_gather()
        print(f"A lane_gather 1vreg : {t*1e3:8.3f} ms ok={ok}  {n/t/1e9:7.2f} G/s")
    except Exception as e:
        print(f"A lane_gather: FAILED {type(e).__name__}: {str(e)[:300]}")
    for w in (1024, 2048, 4096):
        try:
            t, ok, n = case_composite(w)
            print(f"C composite  W={w:5d}: {t*1e3:8.3f} ms ok={ok}  {n/t/1e9:7.2f} G/s")
        except Exception as e:
            print(f"C composite  W={w:5d}: FAILED {type(e).__name__}: {str(e)[:300]}")
    for w in (1024, 2048, 4096):
        try:
            t, ok, n = case_plane_scan(w)
            print(f"D plane_scan W={w:5d}: {t*1e3:8.3f} ms ok={ok}  {n/t/1e9:7.2f} G/s")
        except Exception as e:
            print(f"D plane_scan W={w:5d}: FAILED {type(e).__name__}: {str(e)[:300]}")
