"""Walker window alignment micro-A/B (round 4).

The walker aligns each survivor's gathered window with a 32-way
static-row select per word (pallas_walk.ensure: 32 loads + 31 cmp+sel).
Candidate replacements, per aligned word:

  a) select TREE: 32 loads + 5 bit tests + 31 selects (fewer compares,
     bigger live set);
  b) (removed r5) sublane take_along_axis: Mosaic cannot lower axis-0
     dynamic gathers on this chip at all (experiments/axis0_gather_probe).

Prints amortized kernel-only ms per variant on a 64K-survivor geometry,
plus parity vs variant (base).
"""
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CAP = 1 << 16
W_OUT = 26          # max_len 97 geometry (the bench ruleset)
ROW_WORDS = 32
W_RAW = 64
K = 8


def make_kernel(variant: str):
    def kernel(pos_ref, raw_ref, out_ref):
        pos = pos_ref[:]
        wv = (pos & 127) >> 2
        if variant == "base":
            for w in range(W_OUT):
                acc = raw_ref[w * 8:(w + 1) * 8, :]
                for s in range(1, ROW_WORDS):
                    acc = jnp.where(wv == s,
                                    raw_ref[(w + s) * 8:(w + s + 1) * 8, :],
                                    acc)
                out_ref[w * 8:(w + 1) * 8, :] = acc
        elif variant == "tree":
            bits = [(wv & b) != 0 for b in (1, 2, 4, 8, 16)]
            for w in range(W_OUT):
                gs = [raw_ref[(w + s) * 8:(w + s + 1) * 8, :]
                      for s in range(ROW_WORDS)]
                level = 0
                while len(gs) > 1:
                    gs = [jnp.where(bits[level], gs[i + 1], gs[i])
                          for i in range(0, len(gs), 2)]
                    level += 1
                out_ref[w * 8:(w + 1) * 8, :] = gs[0]
    return kernel


def run_variant(variant, pos2d, raw, g):
    kernel = make_kernel(variant)
    fn = jax.jit(lambda p, r: pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=jax.ShapeDtypeStruct((g * W_OUT * 8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W_RAW * 8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W_OUT * 8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(p, r))
    out = fn(pos2d, raw)
    _ = np.asarray(out[:1, :1])

    def once(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(pos2d, raw)
        _ = np.asarray(o[:1, :1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(K) for _ in range(3))
    return (tk - t1) / (K - 1), out


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pfac_tpu_xla"))
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    g = CAP // 1024
    pos2d = jax.device_put(
        rng.integers(0, 1 << 26, size=(g * 8, 128)).astype(np.int32), dev)
    raw = jax.device_put(
        rng.integers(-(1 << 31), 1 << 31, size=(g * W_RAW * 8, 128),
                     dtype=np.int64).astype(np.int32), dev)
    ref = None
    for variant in ("base", "tree"):
        try:
            t, out = run_variant(variant, pos2d, raw, g)
            fp = int(np.asarray(jnp.sum(out.astype(jnp.uint32)
                                        % jnp.uint32(8191))[None])[0])
            if ref is None:
                ref = fp
            print(json.dumps({"variant": variant, "ms": round(t * 1e3, 3),
                              "parity": fp == ref}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant,
                              "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
