"""prepare_windows cost decomposition + variants (round 3).

64K survivors, max_len-243 geometry (w_raw=96 words = 3 row gathers).
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CAP = 1 << 16
W_RAW = 96
ROW_WORDS = 32
K = 8


def timeit(fn, *args):
    out = fn(*args)
    _ = np.asarray(out.reshape(-1)[:1])

    def once(k):
        t0 = time.perf_counter()
        for i in range(k):
            o = fn(args[0], args[1] + i)
        _ = np.asarray(o.reshape(-1)[:1])
        return time.perf_counter() - t0

    t1 = min(once(1) for _ in range(4))
    tk = min(once(K) for _ in range(3))
    return (tk - t1) / (K - 1)


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    nrows = (128 << 20) // 128
    data2d = jax.device_put(
        rng.integers(0, 256, size=(nrows, 128), dtype=np.uint8), dev)
    pos = jax.device_put(
        np.sort(rng.choice(128 << 20, size=CAP, replace=False))
        .astype(np.int32), dev)
    g = CAP // 1024

    def takes(d2, p):
        r0 = jnp.clip(p >> 7, 0, nrows - 1)
        return [jnp.take(d2, jnp.minimum(r0 + i, nrows - 1), axis=0)
                for i in range(W_RAW // ROW_WORDS)]

    @jax.jit
    def v_takes(d2, p):
        return sum(x.astype(jnp.int32).sum() for x in takes(d2, p)) + jnp.zeros(1, jnp.int32)

    @jax.jit
    def v_wordify(d2, p):
        b = jnp.concatenate(takes(d2, p), axis=1).astype(jnp.int32)
        raw = (b[:, 0::4] | (b[:, 1::4] << 8)
               | (b[:, 2::4] << 16) | (b[:, 3::4] << 24))
        return raw

    @jax.jit
    def v_full(d2, p):
        b = jnp.concatenate(takes(d2, p), axis=1).astype(jnp.int32)
        raw = (b[:, 0::4] | (b[:, 1::4] << 8)
               | (b[:, 2::4] << 16) | (b[:, 3::4] << 24))
        return (raw.reshape(g, 8, 128, W_RAW)
                .transpose(0, 3, 1, 2).reshape(g * W_RAW * 8, 128))

    @jax.jit
    def v_u8first(d2, p):
        # transpose in u8, wordify after (strided u8 lane slices)
        b = jnp.concatenate(takes(d2, p), axis=1)       # (cap, 384) u8
        t = (b.reshape(g, 8, 128, W_RAW, 4)
             .transpose(0, 3, 1, 2, 4))                 # (g,96,8,128,4) u8
        t32 = t.astype(jnp.int32)
        raw = (t32[..., 0] | (t32[..., 1] << 8)
               | (t32[..., 2] << 16) | (t32[..., 3] << 24))
        return raw.reshape(g * W_RAW * 8, 128)

    @jax.jit
    def v_u8bitcast(d2, p):
        # stay u8 end-to-end: transpose 24 MB of bytes (not 96 MB of
        # words), then a pure bitcast (..., 128, 4) u8 -> (..., 128) i32
        # reproduces the little-endian word planes with no shift/or pass
        b = jnp.concatenate(takes(d2, p), axis=1)       # (cap, 384) u8
        t = (b.reshape(g, 8, 128, W_RAW, 4)
             .transpose(0, 3, 1, 2, 4))                 # (g,96,8,128,4) u8
        raw = jax.lax.bitcast_convert_type(t, jnp.int32)
        return raw.reshape(g * W_RAW * 8, 128)

    @jax.jit
    def v_bitcast_first(d2, p):
        # round-5 variant: bitcast BEFORE the transpose — the gathered
        # (cap, 4*W_RAW) u8 rows are already little-endian word bytes, so
        # (cap, W_RAW, 4) u8 -> (cap, W_RAW) i32 is a pure bitcast; the
        # relayout is then a plain 3-D i32 transpose with 128-lane minor
        # dim, a shape XLA moves at memcpy speed (the 5-D u8 form's
        # inner dim of 4 defeats its tiling)
        b = jnp.concatenate(takes(d2, p), axis=1)       # (cap, 384) u8
        w = jax.lax.bitcast_convert_type(
            b.reshape(CAP, W_RAW, 4), jnp.int32)        # (cap, W_RAW) i32
        return (w.reshape(g, 8, 128, W_RAW)
                .transpose(0, 3, 1, 2).reshape(g * W_RAW * 8, 128))

    for name, f in (("takes", v_takes), ("(+)wordify", v_wordify),
                    ("(+)transpose", v_full), ("u8-transpose-first", v_u8first),
                    ("u8-bitcast", v_u8bitcast),
                    ("bitcast-first", v_bitcast_first)):
        print(f"compiling {name}...", flush=True)
        t = timeit(f, data2d, pos)
        print(f"{name:20s}: {t*1e3:7.2f} ms", flush=True)

    # parity of the variants
    a = np.asarray(v_full(data2d, pos))
    bwv = np.asarray(v_u8first(data2d, pos))
    print("u8-first parity:", np.array_equal(a, bwv))
    bc = np.asarray(v_u8bitcast(data2d, pos))
    print("u8-bitcast parity:", np.array_equal(a, bc))
    bf = np.asarray(v_bitcast_first(data2d, pos))
    print("bitcast-first parity:", np.array_equal(a, bf))


if __name__ == "__main__":
    main()
