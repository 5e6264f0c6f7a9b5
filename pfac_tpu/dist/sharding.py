"""Multi-chip / multi-host data-parallel matching.

The reference's distributed story lives in its test harness, not the
library: N OpenMP threads drive N GPUs over round-robin chunks, each chunk
extended by maxPatternLen+1 guard bytes so cross-boundary matches resolve,
and only the first B results of each chunk are kept
(reference: PFAC/test/omp_PFAC.cpp:317-383).

Here it is a first-class component, redesigned for the TPU mesh model:

* 1-D device mesh over axis ``"data"``; the corpus is sharded across it,
  the transition tables are **replicated** (in_specs ``P()``).
* The guard bytes are a **halo exchange over ICI**: inside ``shard_map``
  each shard sends its first ``H = max(max_pattern_len, 2)`` bytes to its
  left neighbor via ``lax.ppermute``; the last shard's halo is filled with
  the end-of-input sentinel instead.
* Each shard owns the match results for exactly its own byte range
  (the reference's "copy back first B results only").
* Global match counts reduce with ``psum`` riding ICI.

Multi-host: the same jitted function works over a multi-host mesh created
from ``jax.devices()`` after ``jax.distributed.initialize`` — XLA routes
the ppermute/psum over ICI/DCN automatically. See dist/multihost.py.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.automaton import Automaton
from ..backends.xla import (
    SENTINEL,
    DEFAULT_TILE,
    dense_device_table,
    dense_step_fn,
    hash_device_tables,
    hash_step_fn,
    pair_tables,
    walk_tiles,
    _reduce_padded,
    _to_u8,
)

AXIS = "data"


def make_data_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over all (or the first N) addressable devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return jax.make_mesh((len(devices),), (AXIS,), devices=devices)


@dataclasses.dataclass
class ShardedMatcher:
    """Data-parallel matcher over a device mesh.

    match(data) returns the same int32[N] result as the single-device
    matcher — sharding must be invisible in the output (the determinism
    contract of SURVEY.md §7.4).
    """

    automaton: Automaton
    mesh: Mesh | None = None
    perf_mode: str = "dense"
    tile: int = DEFAULT_TILE

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_data_mesh()
        a = self.automaton
        ps, pm = pair_tables(a)
        if self.perf_mode == "dense":
            tabs = (dense_device_table(a).reshape(-1),)
            self._mk_step = lambda t: dense_step_fn(t[0])
        elif self.perf_mode == "hash":
            t = hash_device_tables(a)
            tabs = (t["rp_off"], t["rp_key"], t["val_next"], t["val_ch"])
            self._mk_step = lambda t: hash_step_fn(*t)
        else:
            raise ValueError(f"unknown perf_mode {self.perf_mode!r}")

        rep = NamedSharding(self.mesh, P())
        self._tables = tuple(jax.device_put(jnp.asarray(x), rep) for x in tabs)
        self._pair_state = jax.device_put(jnp.asarray(ps), rep)
        self._pair_match = jax.device_put(jnp.asarray(pm), rep)
        self._sharded_fns: dict = {}

    # ------------------------------------------------------------ internals
    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def _shard_len(self, n: int) -> int:
        """Bytes per shard: ceil(n / ndev) rounded up to a tile multiple."""
        nd = self.num_devices
        per = -(-n // nd)
        return max(1, -(-per // self.tile)) * self.tile

    def _build_fn(self, shard_len: int, n: int):
        a = self.automaton
        max_len = a.max_pattern_len
        halo = max(max_len, 2)
        num_tiles = shard_len // self.tile
        nd = self.num_devices
        mk_step = self._mk_step
        tile = self.tile
        num_final = a.num_final_states

        def local_match(tables, pair_state, pair_match, data_local):
            # data_local: uint8 [shard_len] (this shard's slice)
            idx = jax.lax.axis_index(AXIS)
            # halo: my first `halo` bytes go to my left neighbor
            head = jax.lax.dynamic_slice(data_local, (0,), (halo,))
            perm = [(i, i - 1) for i in range(1, nd)]
            halo_bytes = jax.lax.ppermute(head, AXIS, perm) if perm else head
            ext = jnp.concatenate([data_local, halo_bytes]).astype(jnp.int32)
            # sentinel-ize: everything at/past global position n traps.
            # (covers both the last shard's missing halo and host zero-pad)
            gpos = idx * shard_len + jnp.arange(shard_len + halo, dtype=jnp.int32)
            inp = jnp.where(gpos < n, ext, SENTINEL)
            step = mk_step(tables)
            local = walk_tiles(
                step, pair_state, pair_match, inp,
                num_final=num_final, max_len=max_len,
                tile=tile, num_tiles=num_tiles,
            )
            count = jax.lax.psum(jnp.sum(local > 0), AXIS)
            return local, count

        fn = jax.shard_map(
            local_match,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(AXIS)),
            out_specs=(P(AXIS), P()),
        )
        return jax.jit(fn)

    def _fn_for(self, n: int):
        shard_len = self._shard_len(n)
        key = (shard_len, n)
        fn = self._sharded_fns.get(key)
        if fn is None:
            fn = self._build_fn(shard_len, n)
            self._sharded_fns[key] = fn
        return fn, shard_len

    # ------------------------------------------------------------ public
    def match_device(self, data_u8_global: jax.Array, n: int):
        """data_u8_global: uint8[ndev*shard_len] already sharded over the mesh.

        Returns (matches int32[ndev*shard_len] sharded, count replicated).
        """
        fn, _ = self._fn_for(n)
        return fn(self._tables, self._pair_state, self._pair_match, data_u8_global)

    def match(self, data) -> np.ndarray:
        arr = _to_u8(data)
        n = arr.shape[0]
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        fn, shard_len = self._fn_for(n)
        total = shard_len * self.num_devices
        padded = np.zeros(total, dtype=np.uint8)
        padded[:n] = arr
        sharding = NamedSharding(self.mesh, P(AXIS))
        data_dev = jax.device_put(padded, sharding)
        matches, _ = fn(self._tables, self._pair_state, self._pair_match, data_dev)
        return np.asarray(matches)[:n]

    def match_count(self, data) -> int:
        """Global number of matching positions (psum over the mesh)."""
        arr = _to_u8(data)
        n = arr.shape[0]
        if n == 0:
            return 0
        fn, shard_len = self._fn_for(n)
        total = shard_len * self.num_devices
        padded = np.zeros(total, dtype=np.uint8)
        padded[:n] = arr
        data_dev = jax.device_put(padded, NamedSharding(self.mesh, P(AXIS)))
        _, count = fn(self._tables, self._pair_state, self._pair_match, data_dev)
        return int(count)

    def match_reduce(self, data) -> tuple[np.ndarray, np.ndarray, int]:
        """Compacted (ids, positions, count) — gathered to host, positions
        ascending globally."""
        arr = _to_u8(data)
        n = arr.shape[0]
        if n == 0:
            z = np.zeros(0, dtype=np.int32)
            return z, z, 0
        m = self.match(data)
        pos = np.nonzero(m > 0)[0].astype(np.int32)
        return m[pos].astype(np.int32), pos, int(pos.shape[0])
