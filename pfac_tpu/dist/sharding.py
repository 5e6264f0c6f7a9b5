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

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.automaton import Automaton
from ..status import PfacError, PfacStatus
from ..backends.xla import (
    SENTINEL,
    DEFAULT_TILE,
    dense_device_table,
    dense_step_fn,
    hash_device_tables,
    hash_step_fn,
    pair_tables,
    walk_tiles,
    LANES,
    _lane_prefix,
    _prefix_1d,
    _rank_rows,
    _to_u8,
)

AXIS = "data"


def _compact_capped(m: jax.Array, cap: int):
    """Device-side compaction of a dense match vector into at most `cap`
    (id, pos) pairs, positions ascending. Returns (ids[cap], pos[cap],
    count) — entries past count are zero; count may exceed cap (caller
    must detect).

    One rank-select chunk of xla._reduce_rowgather: per-row match
    counts -> hierarchical prefix -> compare-sum rank search -> one
    (cap, 128) row gather. No scatters: the earlier sorted scatter-max
    form was mis-lowered on TPU with duplicate destination indices
    (r4 capture, experiments/logs_r4/reduce_micro.log) — row gathers
    are both correct and the fast shape on this chip (34-53 G elem/s
    vs 0.12 for elementwise scatter)."""
    n = m.shape[0]
    n128 = -(-n // LANES) * LANES
    if n128 != n:
        m = jnp.concatenate([m, jnp.zeros(n128 - n, m.dtype)])
    m2d = m.reshape(-1, LANES)
    counts = (m2d > 0).sum(axis=1)
    bcum = _prefix_1d(counts)
    count = bcum[-1]
    q = jnp.arange(1, cap + 1, dtype=jnp.int32)
    row, prev = _rank_rows(bcum, q)
    vals = jnp.take(m2d, row, axis=0)                # (cap, 128) row gather
    rcum = _lane_prefix(vals > 0)                    # MXU prefix, f32 exact
    within = jnp.sum((rcum < (q - prev)[:, None].astype(jnp.float32))
                     .astype(jnp.int32), axis=1)
    within = jnp.minimum(within, LANES - 1)
    cid = jnp.sum(jnp.where(jnp.arange(LANES, dtype=jnp.int32)[None, :]
                            == within[:, None], vals, 0), axis=1)
    valid = q <= count
    ids = jnp.where(valid, cid, 0).astype(jnp.int32)
    pos = jnp.where(valid, row * LANES + within, 0)
    return ids, pos, count


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

    engine:
      * "xla"   — portable lockstep walker (works on any backend)
      * "sieve" — the Pallas sieve kernel per shard (TPU; interpret mode
        elsewhere), same halo-exchange layout
      * "auto"  — sieve on TPU meshes, xla otherwise
    """

    automaton: Automaton
    mesh: Mesh | None = None
    perf_mode: str = "dense"
    tile: int = DEFAULT_TILE
    engine: str = "auto"
    interpret: bool = False
    tile_rows: int | None = None   # sieve kernel geometry per shard

    def __post_init__(self):
        if self.tile_rows is None:
            # small interpret-mode tiles keep CPU-mesh tests fast (same
            # policy as SieveMatcher); real chips get production geometry
            from ..backends.pallas_sieve import TILE_ROWS
            self.tile_rows = 64 if self.interpret else TILE_ROWS
        if self.mesh is None:
            self.mesh = make_data_mesh()
        if self.engine == "auto":
            on_tpu = self.mesh.devices.flat[0].platform == "tpu"
            self.engine = "sieve" if on_tpu else "xla"
        a = self.automaton
        rep = NamedSharding(self.mesh, P())
        self._sharded_fns: dict = {}

        if self.engine == "sieve":
            from ..backends import pallas_sieve as sieve

            self._sieve_tables = sieve.SieveTables.build(a)
            self._walk_tables = sieve.build_walk_tables_gated(
                a, self._sieve_tables)
            self._csr_tables = None
            if self._walk_tables is None:
                # None when there are no length>=4 patterns; the big tier
                # (tables.alive is None) draws its XLA entry filter here
                from ..backends.xla_csr import build_csr_tables
                self._csr_tables = build_csr_tables(a)
            deep = (self._walk_tables.arrays
                    if self._walk_tables is not None
                    else self._csr_tables.arrays
                    if self._csr_tables is not None else [])
            self._tables = tuple(
                jax.device_put(jnp.asarray(x), rep)
                for x in self._sieve_tables.arrays + deep
            )
            # neither deep tail reads the dense table (see SieveMatcher)
            self._dense_flat = jax.device_put(
                jnp.asarray(np.zeros(1, np.int32)), rep)
            return

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

        self._tables = tuple(jax.device_put(jnp.asarray(x), rep) for x in tabs)
        self._pair_state = jax.device_put(jnp.asarray(ps), rep)
        self._pair_match = jax.device_put(jnp.asarray(pm), rep)

    # ------------------------------------------------------------ internals
    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def _shard_len(self, n: int) -> int:
        """Bytes per shard: ceil(n / ndev) rounded up to a tile multiple."""
        nd = self.num_devices
        per = -(-n // nd)
        if self.engine == "sieve":
            from ..backends.pallas_sieve import npad_for
            return npad_for(per, self.tile_rows)
        return max(1, -(-per // self.tile)) * self.tile

    def _sieve_shard_pipeline(self, shard_len: int, n: int):
        """Shared per-shard plumbing: (pipeline_runner, halo).

        The runner maps data_local -> (result, ovf) inside shard_map. When
        the halo fits one kernel block (the common case), the no-concat
        tail-split layout is used: the shard's bytes feed the kernel
        UNTOUCHED and only a one-block tail buffer (ppermute halo + zero
        pad) is materialized per dispatch — the full-shard concat copy
        cost ~7% of the shard pipeline (round-2 scaling gap)."""
        from ..backends import pallas_sieve as sieve

        a = self.automaton
        halo = max(a.max_pattern_len, 2)
        nd = self.num_devices
        block = self.tile_rows * 128
        use_split = halo + 4 <= block
        npad = (shard_len + block if use_split
                else sieve.npad_for(shard_len + halo, self.tile_rows))
        # same int32 position-range bound as SieveMatcher._dispatch: the
        # deferred-scatter buffer init reaches npad + ~2.4M at default
        # constants (build_pipeline asserts the exact bound)
        if npad > (1 << 31) - (1 << 22):
            raise PfacError(
                PfacStatus.INVALID_PARAMETER,
                "per-shard bytes exceed int32 position range; use more "
                "shards or feed <2 GiB per shard",
            )
        pipeline = sieve.build_pipeline(
            a, self._sieve_tables, npad=npad,
            cap=1 << 12, interpret=self.interpret,
            walk_tables=self._walk_tables, csr_tables=self._csr_tables,
            tile_rows=self.tile_rows, tail_split=use_split,
        )
        tail_bytes = (self.tile_rows + sieve.HALO_ROWS) * 128

        def run_local(tables, dense_flat, data_local):
            idx = jax.lax.axis_index(AXIS)
            head = data_local[:halo]         # static slice: no gather op
            perm = [(i, i - 1) for i in range(1, nd)]
            # last shard's halo: ppermute leaves untargeted outputs zero;
            # those bytes sit at/past global n and are masked by n_valid
            halo_bytes = jax.lax.ppermute(head, AXIS, perm) if perm else head
            n_valid = jnp.clip(n - idx * shard_len, 0, shard_len + halo)
            n_arr = n_valid.reshape(1).astype(jnp.int32)
            if use_split:
                tail = jax.lax.dynamic_update_slice(
                    jnp.zeros(tail_bytes, jnp.uint8), halo_bytes, (0,))
                result, _, ovf = pipeline(tables, dense_flat, data_local,
                                          n_arr, tail)
            else:
                ext = jnp.concatenate([data_local, halo_bytes])
                result, _, ovf = pipeline(tables, dense_flat, ext, n_arr)
            return result, ovf

        return run_local, halo

    def _build_fn_sieve(self, shard_len: int, n: int):
        """Per-shard Pallas sieve with the same ppermute halo layout.

        Returns (match_fn, count_fn): match_fn -> (matches P(AXIS),
        overflow P(AXIS)); count_fn(matches) -> replicated match count
        (a separate on-demand dispatch). The per-shard pipeline handles
        every survivor density internally; overflow flags the rare
        heavy-stage capacity exhaustion, which routes to the XLA
        fallback."""
        run_local, _ = self._sieve_shard_pipeline(shard_len, n)

        # the overflow flag must be globally agreed only ACROSS PROCESSES
        # (a sharded flag is not addressable cross-process and divergent
        # fallback decisions would desynchronize the job —
        # multihost_smoke r5); within one process the host reads every
        # shard itself. The psum is gated on that: a scalar psum costs
        # ~0.5 ms per dispatch even on a 1-chip mesh (r5 capture,
        # logs_r5/shard_gap2.log — half the shard_map efficiency gap).
        mp = jax.process_count() > 1

        def local_match(tables, dense_flat, data_local):
            result, ovf = run_local(tables, dense_flat, data_local)
            # static slice: a no-op under the tail_split owned-size
            # output (result is exactly shard_len); real only on the
            # rare non-split layout
            owned = result[:shard_len]
            ovf1 = jax.lax.psum(ovf, AXIS) if mp else ovf
            return owned, ovf1.reshape(1)

        fn = jax.shard_map(
            local_match,
            mesh=self.mesh,
            in_specs=(P(), P(), P(AXIS)),
            out_specs=(P(AXIS), P() if mp else P(AXIS)),
            # pallas_call out_shapes carry no varying-mesh-axes annotation
            check_vma=False,
        )
        # the global match count is a SEPARATE dispatch: the reference's
        # matchFromDevice contract has no count, so the hot sharded match
        # must not pay a second full-result pass + psum per call
        # (round-3's 11% 1-chip shard_map overhead, VERDICT r3 #8);
        # match_count()/match_device() run this only on demand.
        def count_fn(matches):
            local = jnp.sum(matches > 0)
            return jax.lax.psum(local, AXIS)

        cfn = jax.jit(jax.shard_map(
            count_fn, mesh=self.mesh, in_specs=(P(AXIS),), out_specs=P(),
        ))
        return jax.jit(fn), cfn

    def _build_reduce_fn_sieve(self, shard_len: int, n: int, cap_r: int):
        """Per-shard match + DEVICE-side compaction: each shard returns at
        most cap_r (id, pos) pairs + its true count — the dense match
        vector never reaches the host (the reference's reduce contract,
        PFAC/src/PFAC_reduce_kernel.cu:306-457, lifted to the mesh).
        Shard-local positions are int32; the host rebases to global
        int64."""
        run_local, _ = self._sieve_shard_pipeline(shard_len, n)

        def local_reduce(tables, dense_flat, data_local):
            result, ovf = run_local(tables, dense_flat, data_local)
            owned = jax.lax.dynamic_slice(result, (0,), (shard_len,))
            ids, pos, count = _compact_capped(owned, cap_r)
            flags = jnp.stack([count, ovf | (count > cap_r).astype(jnp.int32)])
            return ids, pos, flags.reshape(1, 2)

        fn = jax.shard_map(
            local_reduce,
            mesh=self.mesh,
            in_specs=(P(), P(), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        )
        return jax.jit(fn)

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
            if self.engine == "sieve":
                fn = self._build_fn_sieve(shard_len, n)
            else:
                fn = self._build_fn(shard_len, n)
            self._sharded_fns[key] = fn
        return fn, shard_len

    def _run(self, data_dev: jax.Array, n: int, want_count: bool = False):
        """-> (matches sharded, match_count replicated | None).

        The count is a separate on-demand dispatch on the sieve engine
        (want_count=True) so the hot match path never pays the extra
        full-result pass + psum (VERDICT r3 #8). The heavy-stage
        overflow flag (replicated via psum) is checked with ONE scalar
        fetch; on overflow (very deep AND dense corpus beyond every
        stage capacity) the XLA lockstep walker recomputes — every
        process takes the branch in lockstep because the flag is
        global."""
        fn, _ = self._fn_for(n)
        if self.engine == "sieve":
            f, cfn = fn
            matches, ovf = f(self._tables, self._dense_flat, data_dev)
            # multi-process: ovf is psum-replicated (one addressable
            # copy, globally agreed); single-process: sharded — read the
            # local shards directly
            if any(int(np.asarray(s.data).max())
                   for s in ovf.addressable_shards):
                return self._xla_fallback_fn(n)(data_dev)
            return matches, (cfn(matches) if want_count else None)
        return fn(self._tables, self._pair_state, self._pair_match,
                  data_dev)

    def _xla_fallback_fn(self, n: int):
        """A one-off XLA-engine sharded matcher for pathological corpora
        (shares the mesh; its tables build lazily and are cached)."""
        if getattr(self, "_xla_fb", None) is None:
            self._xla_fb = ShardedMatcher(
                self.automaton, mesh=self.mesh, perf_mode="dense",
                tile=self.tile, engine="xla",
            )
        fb = self._xla_fb
        my_len = self._shard_len(n)
        if my_len % fb.tile == 0:
            # same shard length: the already-sharded device buffer feeds
            # the fallback engine directly — no host round trip. (The
            # sieve shard length is a tile_rows*128 multiple, which the
            # default XLA tile divides.)
            key = ("fb", my_len, n)
            fn = self._sharded_fns.get(key)
            if fn is None:
                fn = fb._build_fn(my_len, n)
                self._sharded_fns[key] = fn

            def run_direct(data_dev):
                return fn(fb._tables, fb._pair_state, fb._pair_match,
                          data_dev)

            return run_direct
        fn, _ = fb._fn_for(n)
        shard_len = fb._shard_len(n)

        def run(data_dev):
            # shard lengths differ (non-default tile geometry): round-trip
            # through host layout (pathological path only)
            arr = np.asarray(data_dev).reshape(-1)[: my_len * self.num_devices]
            return fn(fb._tables, fb._pair_state, fb._pair_match,
                      fb._put(arr[:n] if n <= arr.shape[0] else arr, shard_len))

        return run

    # ------------------------------------------------------------ public
    def match_device(self, data_u8_global: jax.Array, n: int):
        """data_u8_global: uint8[ndev*shard_len] already sharded over the mesh.

        Returns (matches int32[ndev*shard_len] sharded, count replicated).
        """
        return self._run(data_u8_global, n, want_count=True)

    def _put(self, arr: np.ndarray, shard_len: int) -> jax.Array:
        total = shard_len * self.num_devices
        padded = np.zeros(total, dtype=np.uint8)
        padded[: arr.shape[0]] = arr
        return jax.device_put(padded, NamedSharding(self.mesh, P(AXIS)))

    def match(self, data) -> np.ndarray:
        arr = _to_u8(data)
        n = arr.shape[0]
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        matches, _ = self._run(self._put(arr, self._shard_len(n)), n)
        return np.asarray(matches)[:n].astype(np.int32, copy=False)

    def match_count(self, data) -> int:
        """Global number of matching positions (psum over the mesh)."""
        arr = _to_u8(data)
        n = arr.shape[0]
        if n == 0:
            return 0
        _, count = self._run(self._put(arr, self._shard_len(n)), n,
                             want_count=True)
        return int(count)

    reduce_cap: int = 1 << 20     # per-shard device compaction capacity

    def match_reduce(self, data) -> tuple[np.ndarray, np.ndarray, int]:
        """Compacted (ids, positions, count), positions ascending globally.

        On the sieve engine each shard compacts its own matches on device
        (row-gather rank select) and ships at most `reduce_cap` pairs —
        the dense result never materializes on the host. Positions are
        int64: inputs >= 2^31 bytes are exactly what the sharded path
        exists for. Shards beyond `reduce_cap` matches (or a heavy-stage
        overflow on the no-walk-tables fallback) route to the dense path."""
        arr = _to_u8(data)
        n = arr.shape[0]
        if n == 0:
            z = np.zeros(0, dtype=np.int32)
            return z.astype(np.int32), np.zeros(0, dtype=np.int64), 0
        if self.engine == "sieve":
            shard_len = self._shard_len(n)
            cap_r = min(self.reduce_cap, shard_len)
            key = ("reduce", shard_len, n, cap_r)
            fn = self._sharded_fns.get(key)
            if fn is None:
                fn = self._build_reduce_fn_sieve(shard_len, n, cap_r)
                self._sharded_fns[key] = fn
            ids, pos, flags = fn(self._tables, self._dense_flat,
                                 self._put(arr, shard_len))
            flags = np.asarray(flags)          # (nd, 2): count, overflow
            if not flags[:, 1].any():
                # O(count) transfer: slice each shard's true count ON
                # DEVICE before fetching — shipping the fixed cap_r
                # (8 MB/shard) through an ~11 MB/s tunnel dwarfed the
                # compaction itself (round-2 weakness)
                def by_shard(arr):
                    # local shard buffers keyed by shard index (slicing the
                    # GLOBAL sharded array would need collective resharding)
                    return {sh.index[0].start or 0: sh.data
                            for sh in arr.addressable_shards}
                ids_sh, pos_sh = by_shard(ids), by_shard(pos)
                out_i, out_p = [], []
                for s in range(self.num_devices):
                    c = int(flags[s, 0])
                    if c == 0:
                        continue
                    # pow2 bucket: bounds distinct on-device slice shapes
                    # (each new shape is a compile — ~100 s on tunneled
                    # runtimes) while keeping the transfer O(count)
                    cb = min(cap_r, 1 << max(10, (c - 1).bit_length()))
                    base = s * cap_r
                    out_i.append(np.asarray(ids_sh[base][:cb])[:c])
                    out_p.append(np.asarray(pos_sh[base][:cb])[:c]
                                 .astype(np.int64) + np.int64(s) * shard_len)
                if not out_i:
                    return (np.zeros(0, np.int32), np.zeros(0, np.int64), 0)
                gi = np.concatenate(out_i).astype(np.int32)
                gp = np.concatenate(out_p)
                return gi, gp, int(gp.shape[0])
            # overflow: fall through to the dense path
        m = self.match(data)
        pos = np.nonzero(m > 0)[0]
        return m[pos].astype(np.int32), pos, int(pos.shape[0])
