"""Mosaic axis-0 (sublane) dynamic gather support probe (round 5).

ALIGN_SUBGATHER — window alignment as one sublane take_along_axis per
word — was the round-4 candidate to replace the walker's 32-way row
select chain. This probe settles whether Mosaic can lower ANY axis-0
dynamic gather shape on this chip:

  a) (8,128) indices into a (512,128) value  — the walker's actual shape
  b) (512,128) indices into (512,128)        — the only shape the
     lowering rule's assert admits (indices.shape == input.shape)
  c) (8,128) indices into a (32,128) window  — minimal case

Result (2026-08-19, TPU v5e, logs_r5/axis0_gather_probe.log): a and c
fail the lowering assert (jax/_src/pallas/mosaic/lowering.py:2493
`indices_aval.shape == in_aval.shape + (1,)`); b passes the assert but
the Mosaic compiler rejects it with INVALID_ARGUMENT. Axis-0 dynamic
gathers are UNIMPLEMENTABLE on this chip; lane (axis-1) gathers remain
the only dynamic gather shape (CLAUDE.md platform rules). The
ALIGN_SUBGATHER flag and its harness arms were removed.
"""
import os
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pfac_tpu_xla"))


def try_case(name, kernel, out_shape, *args):
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kernel, out_shape=out_shape)(*a))
        out = fn(*args)
        print(name, "OK", np.asarray(out)[:1, :3])
    except Exception as e:
        tb = traceback.format_exc()
        lines = [l for l in tb.splitlines()
                 if "assert" in l.lower() or "Error" in l]
        print(name, "FAIL", repr(e)[:120], "|",
              " // ".join(lines[-3:])[:240])


def main():
    rng = np.random.default_rng(0)
    raw_np = rng.integers(0, 1000, size=(512, 128)).astype(np.int32)
    idx8 = (rng.integers(0, 64, size=(8, 128)).astype(np.int32)) * 8 \
        + np.arange(8, dtype=np.int32)[:, None]
    idx512 = (rng.integers(0, 64, size=(512, 128)).astype(np.int32)) * 8 \
        + (np.arange(512, dtype=np.int32)[:, None] % 8)

    def k(raw_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(raw_ref[:], idx_ref[:], axis=0)

    try_case("a_axis0_8from512", k,
             jax.ShapeDtypeStruct((8, 128), jnp.int32), raw_np, idx8)
    try_case("b_axis0_512from512", k,
             jax.ShapeDtypeStruct((512, 128), jnp.int32), raw_np, idx512)
    idx8s = (rng.integers(0, 4, size=(8, 128)).astype(np.int32)) * 8 \
        + np.arange(8, dtype=np.int32)[:, None]
    try_case("c_axis0_8from32", k,
             jax.ShapeDtypeStruct((8, 128), jnp.int32), raw_np[:32], idx8s)


if __name__ == "__main__":
    main()
