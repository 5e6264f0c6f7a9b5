"""Pallas TPU "sieve" match kernel — second-generation device matcher.

TPU-native answer to the reference's CUDA inner loop (reference:
PFAC/src/PFAC_kernel.cu:377-458). Supersedes the ladder kernel
(backends/pallas_ladder.py) after honest profiling showed the ladder's
cost split at 64 MB: prologue 6 ms + probe kernel 17 ms + XLA tail/
compaction 53 ms. The sieve removes all three bottlenecks:

* **In-kernel byte assembly.** The raw uint8 corpus streams straight into
  the kernel; c1/c2/c3 shifted byte streams are built with in-register
  lane rolls (``pltpu.roll``) + a one-row halo block — no 512 MB of
  packed-stream HBM traffic, no separate prologue dispatch.

* **Depth-1..3 exact, depth>=4 filtered.** Per position:
    - m1: direct 256-entry table (len-1 pattern IDs),
    - m2: CHD exact probe on (c0,c1) (len-2 IDs),
    - m3: CHD wide-exact probe on (c0..c2) — full 24-bit key compared,
    - alive: CHD 16-bit-residual probe on the exact 32-bit key (c0..c3):
      "could a len>=4 pattern start here?" False positives ~2^-16.
  Keys compose LITTLE-endian (c0 in the low byte): every probe key is
  then a plain mask of the assembled k4 (&0xFF / &0xFFFF / &0xFFFFFF /
  identity) — no shift+mask per probe in the issue-bound kernel.
  All tables use a lane-major layout probed by the VPU's dynamic lane
  gather (measured ~2 cy/plane amortized, experiments/lanegather2).
  Keying the tail on FOUR bytes cuts survivors ~256x vs the ladder's
  3-byte fingerprint: on random data the tail population is ~1e-5 of
  positions (dominated by the residual FP rate).

* **Row-gather compaction + survivor-walk engine.** Survivor extraction
  uses per-1024-block bitmaps emitted by the kernel; XLA-side compaction
  does row gathers + MXU prefix sums only (element gathers run at
  0.12 G elem/s on this chip). Survivors are walked to full depth by the
  Pallas walk engine (backends/pallas_walk.py) over depth-sliced exact
  CHD tables, in one straight-line program for every survivor density
  (one light round + a while_loop of 64K rounds). Rulesets the walk
  tables can't encode (pattern IDs or per-depth state counts >= 2^16, or
  tables past the VMEM budget) walk via the CSR row-gather engine
  (backends/xla_csr.py) instead — HBM-resident per-depth CSR rows at
  ~5 ns/row, the big-automaton tier.

Output contract matches the reference exactly: result[i] = ID of the
longest pattern starting at byte i, else 0 (PFAC_matchFromHost,
reference: PFAC/src/PFAC_CPU.cpp:76-96).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import chd
from ..core.automaton import Automaton
from ..status import PfacError, PfacStatus
from .xla import _prefix_1d, _rank_rows, _to_u8

LANES = 128
TILE_ROWS = 512                # positions per grid step = TILE_ROWS * 128
SUB = TILE_ROWS // 8           # (8,128) row-groups per grid step
UNROLL = 4                     # row-groups per fori iteration (ILP)
HALO_ROWS = 32                 # uint8 tile height: one min-tile of halo

_I32 = lambda x: jnp.int32(np.int32(np.uint32(x)))

# alive-key count above which the filter stores 8-bit residuals (half the
# plane scan) instead of 16-bit. DISABLED (r5): resid8's ~2^-8 false
# survivors are corpus-sized (~262K per 64 MB) and every ruleset large
# enough to clear the old 8192 threshold rides the CSR deep tier, where
# a false survivor costs a ~650 ns round share (20.9 ms / 32K ranks,
# logs_r5/csr_profile.log) — ~188 ms of dud rounds against resid16's
# +29 ms of extra planes (75.7 vs 46.5 ms kernel at 100K keys). The
# flagship walker tier measured the same verdict end-to-end in r4/r5
# (e2e_resid8 21.1 vs e2e_resid16 6.6, logs_r5/kernel_ab2.log).
_RESID8_THRESHOLD = 1 << 30

# alive-key count at/below which the filter is the ONE-gather-level
# bucket-fingerprint structure (chd.build_bucket2: fp16 pairs per bucket
# word + a small independent overflow CHD) instead of the two-level
# fused CHD. The CHD's word gather DEPENDS on its displacement gather —
# the kernel's latency sink (64% of kernel time, MEASUREMENTS.md
# probe-family split r4); bucket2 scans ~2x the planes but has no
# dependent gather. 0 disables (pending the r5 on-chip capture,
# experiments/alive_ab.py).
ALIVE_BUCKET2_MAX = 0
ALIVE_B2_LGM_DELTA = 0   # bucket-count scale: 0 -> pow2(n) buckets
                         # (λ<=1, ~8% overflow keys); -1 halves the main
                         # plane scan at ~4x the overflow table

# alive-key count beyond which the sieve builds NO in-kernel alive
# filter, using ONE XLA row gather against the CSR keys-only table
# instead (xla_csr.entry_filter_bits). DISABLED (r5 capture,
# logs_r5/big_tier_split.log): XLA gathers are ROW-RATE-bound
# (~0.16 G rows/s at ANY row width), so the per-position filter costs
# 423 ms/64 MB — worse than even a 512-plane in-kernel resid16 scan
# (75.7 ms). Kept as the measured negative result; the VPU lane-gather
# plane scan remains the only cheap per-position random access on this
# chip.
_ALIVE_CHD_MAX = 1 << 30

SPLIT_LOOPS = False   # sieve kernel: separate m123 and alive passes over
                      # the staged k4 tile (smaller live sets per loop)
                      # vs the fused single pass — A/B on chip

DENSE_ESCAPE_DIV = 4  # dense-block escape threshold: a grid block whose
                      # survivor count >= block_positions/DIV walks ALL its
                      # positions through the standalone block-walk kernel
                      # (build_block_walk) instead of feeding per-survivor
                      # walker rounds. The decision runs in XLA from the
                      # bitmap popcounts the compaction needs anyway, so
                      # the hot sieve kernel carries ZERO escape code —
                      # round 4 measured the in-kernel form costing the
                      # kernel 35% even when never taken
                      # (experiments/logs_r4/escape_ab.log: esc_on 8.437
                      # vs esc_off 6.238 ms/64 MB). 0 disables.

# len-1 pattern count up to which the m1 probe is a compare/select chain
# instead of a 2-plane direct table. The kernel is ISSUE-bound (~82 cy
# per row-group ~= its ~86 VPU ops), so each chain entry costs its 2 ops
# (compare+select) outright — while the 2-plane table costs ~5 ops
# total. Chain only wins when it is genuinely tiny.
_M1_CHAIN_MAX = 2


# --------------------------------------------------------------------------
# host-side table construction
# --------------------------------------------------------------------------

def _expand_planes(words: np.ndarray) -> np.ndarray:
    """words[W] int32 -> (P*8, 128) lane-major planes: plane p holds
    words[p*128:(p+1)*128] replicated across its 8 sublanes, so a probe is
    one dynamic lane gather + one plane-select per plane."""
    w = np.asarray(words, dtype=np.int32)
    p = max(1, -(-w.shape[0] // LANES))
    pad = np.zeros(p * LANES, np.int32)
    pad[: w.shape[0]] = w
    return np.repeat(pad.reshape(p, 1, LANES), 8, axis=1).reshape(p * 8, LANES)


def _pack_u16(vals: np.ndarray) -> np.ndarray:
    """uint16 values packed 2 per int32 word."""
    v = np.asarray(vals, dtype=np.uint32)
    w = np.zeros((v.shape[0] + 1) // 2, dtype=np.uint32)
    w |= v[0::2]
    w[: v[1::2].shape[0]] |= v[1::2] << np.uint32(16)
    return w.astype(np.int32)


def _pack_u8(vals: np.ndarray) -> np.ndarray:
    """uint8 values packed 4 per int32 word."""
    v = np.asarray(vals, dtype=np.uint32)
    pad = np.zeros(-(-v.shape[0] // 4) * 4, dtype=np.uint32)
    pad[: v.shape[0]] = v
    w = (pad[0::4] | (pad[1::4] << np.uint32(8))
         | (pad[2::4] << np.uint32(16)) | (pad[3::4] << np.uint32(24)))
    return w.astype(np.int32)


@dataclasses.dataclass
class _Probe:
    """One CHD probe's device arrays + static config."""
    disp: np.ndarray           # lane-major planes of packed displacements
    words: np.ndarray          # lane-major planes of payload words
    keyw: np.ndarray | None    # lane-major planes of key words (wide exact)
    lg_b: int
    lg_r: int
    slot_mul: int
    disp_u8: bool = False      # displacements packed 4/word instead of 2
    nodisp: bool = False       # slot = top bits of the product, no disp
    resid_bits: int = 16       # residual width (alive filter only)
    bucket2: bool = False      # bucket-fingerprint form: words hold two
                               # fp16 per bucket, slot = top lg_r bits of
                               # the product, no disp (alive filter only)

    @classmethod
    def from_chd(cls, t: chd.ChdTable, key_words: np.ndarray | None = None):
        if getattr(t, "nodisp_mul", None) is not None:
            return cls(
                disp=None,
                words=_expand_planes(t.slot_words),
                keyw=_expand_planes(key_words) if key_words is not None else None,
                lg_b=0,
                lg_r=t.lg_slots,
                slot_mul=t.nodisp_mul,
                nodisp=True,
            )
        # u8-packed displacements halve the disp planes (one fewer gather
        # per probe) whenever every displacement fits a byte and the
        # packing actually shrinks the plane count
        disp_u8 = bool(t.disp.max() < 256) and t.num_buckets // 2 > LANES
        pack = _pack_u8 if disp_u8 else _pack_u16
        return cls(
            disp=_expand_planes(pack(t.disp)),
            words=_expand_planes(t.slot_words),
            keyw=_expand_planes(key_words) if key_words is not None else None,
            lg_b=int(np.log2(t.num_buckets)),
            lg_r=t.lg_slots,
            slot_mul=chd.slot_multiplier(t.salt),
            disp_u8=disp_u8,
        )

    @property
    def arrays(self) -> list[np.ndarray]:
        out = [] if self.disp is None else [self.disp]
        out.append(self.words)
        if self.keyw is not None:
            out.append(self.keyw)
        return out


@dataclasses.dataclass
class SieveTables:
    m1: np.ndarray | None      # direct table planes: u16-packed 1 plane
                               # (ids <= 15 bits) or 2 full-word planes
    m1_chain: tuple | None     # ((byte, id), ...) compare-chain for tiny sets
    m2: _Probe | None          # exact16 on LE key (c1<<8|c0)
    m3: _Probe | None          # wide exact on LE key (c2<<16|c1<<8|c0)
    alive: _Probe | None       # resid16 on LE key (c3<<24|..|c0), or the
                               # bucket-fingerprint form (bucket2=True)
    vmem_bytes: int
    m1_packed: bool = False    # m1 values u16-packed 2 per word (1 plane)
    alive_ovf: _Probe | None = None   # bucket2 overflow keys: resid16 CHD
                               # probed in parallel with the main word

    @classmethod
    def build(cls, automaton: Automaton) -> "SieveTables":
        if automaton.num_final_states >= (1 << 30):
            raise PfacError(
                PfacStatus.INVALID_PARAMETER,
                "pallas sieve supports < 2^30 patterns (alive flag uses bit 30)",
            )
        # pattern IDs above 15 bits don't fit the packed exact16 word;
        # switch m2 to the wide (key word + value word) encoding
        wide_ids = automaton.num_final_states > 0x7FFF
        len1, len2, len3 = {}, {}, {}
        alive_keys = set()
        for idx, pat in enumerate(automaton.sorted_patterns):
            pid = int(automaton.pattern_ids[idx])
            if len(pat) == 1:
                len1[pat[0]] = pid                   # later duplicate wins
            elif len(pat) == 2:
                len2[(pat[1] << 8) | pat[0]] = pid
            elif len(pat) == 3:
                len3[(pat[2] << 16) | (pat[1] << 8) | pat[0]] = pid
            else:
                alive_keys.add(
                    (pat[3] << 24) | (pat[2] << 16) | (pat[1] << 8) | pat[0]
                )

        m1 = None
        m1_chain = None
        m1_packed = False
        if len1:
            if len(len1) <= _M1_CHAIN_MAX:
                m1_chain = tuple(sorted(len1.items()))
            else:
                t = np.zeros(256, np.int32)
                for ch, pid in len1.items():
                    t[ch] = pid
                if not wide_ids:
                    # ids fit 15 bits: pack 2/word -> a 1-plane probe
                    # (1 gather + a parity select vs a 2-plane scan)
                    m1 = _expand_planes(_pack_u16(t.astype(np.uint32)))
                    m1_packed = True
                else:
                    m1 = _expand_planes(t)

        m2 = None
        if len2:
            ks = np.array(sorted(len2.keys()), dtype=np.uint32)
            vs = np.array([len2[int(k)] for k in ks], dtype=np.uint32)
            if wide_ids:
                built = chd.build_exact_wide2_nodisp(ks, vs) if len(ks) <= 64 else None
                t, kw = built if built is not None else chd.build_exact_wide2(ks, vs)
                m2 = _Probe.from_chd(t, kw)
            else:
                t = chd.build_exact2_nodisp(ks, vs) if len(ks) <= 64 else None
                if t is None:
                    t = chd.build_exact2(ks, vs)
                m2 = _Probe.from_chd(t)

        m3 = None
        if len3:
            ks = np.array(sorted(len3.keys()), dtype=np.uint32)
            vs = np.array([len3[int(k)] for k in ks], dtype=np.uint32)
            built = chd.build_exact_wide2_nodisp(ks, vs) if len(ks) <= 64 else None
            t, kw = built if built is not None else chd.build_exact_wide2(ks, vs)
            m3 = _Probe.from_chd(t, kw)

        alive = None
        alive_ovf = None
        if alive_keys and len(alive_keys) > _ALIVE_CHD_MAX:
            pass    # big tier: the XLA entry filter serves instead
                    # (xla_csr.entry_filter_bits; see _ALIVE_CHD_MAX)
        elif alive_keys:
            ks = np.array(sorted(alive_keys), dtype=np.int64).astype(np.uint32)
            if len(ks) <= ALIVE_BUCKET2_MAX:
                # one-gather-level bucket-fingerprint filter: no dependent
                # gather on the kernel's critical path (the CHD form's
                # disp->word chain is the latency sink, 64% of the kernel)
                b2 = chd.build_bucket2(ks, lg_m_delta=ALIVE_B2_LGM_DELTA)
                alive = _Probe(disp=None, words=_expand_planes(b2.words),
                               keyw=None, lg_b=0, lg_r=b2.lg_m,
                               slot_mul=b2.mul, nodisp=True, bucket2=True)
                if b2.overflow is not None:
                    alive_ovf = _Probe.from_chd(b2.overflow)
            else:
                # large key sets: 8-bit residuals halve the probe's plane
                # scan (the dominant kernel cost, ~0.6 ms/plane/128 MB);
                # the extra ~2^-8 false survivors die at the walker's
                # exact entry probe
                bits = 8 if len(ks) > _RESID8_THRESHOLD else 16
                alive = _Probe.from_chd(chd.build_resid2(ks, bits=bits))
                alive.resid_bits = bits

        vmem = 0
        if m1 is not None:
            vmem += m1.size * 4
        for p in (m2, m3, alive, alive_ovf):
            if p is not None:
                vmem += sum(a.size for a in p.arrays) * 4
        return cls(m1=m1, m1_chain=m1_chain, m2=m2, m3=m3, alive=alive,
                   vmem_bytes=vmem, m1_packed=m1_packed,
                   alive_ovf=alive_ovf)

    @property
    def arrays(self) -> list[np.ndarray]:
        out = []
        if self.m1 is not None:
            out.append(self.m1)
        for p in (self.m2, self.m3, self.alive, self.alive_ovf):
            if p is not None:
                out.extend(p.arrays)
        return out


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

LOOKUP_TREE_MIN = 1 << 30   # plane count at/above which the merge is a
                      # select TREE (log2(P) bit tests + P-1 selects)
                      # instead of the linear scan (P-1 compares + P-1
                      # selects). The tree saves P-1-log2(P) ops but holds
                      # all P gathered values live at once — the exact
                      # register-pressure shape that regressed UNROLL=8 in
                      # round 2 — so it stays DISABLED (2^30) until
                      # experiments/kernel_ab2.py captures a win on chip
                      # (CLAUDE.md: tuned constants cite committed numbers)


def _lookup(ref, w, interpret: bool = False):
    """table[w] for (8,128) int32 word indices w, against a lane-major
    plane table ref of shape (P*8, 128): planes are scanned with the
    plane-select fused into one compare, the in-plane word fetched with
    the VPU's dynamic lane gather.

    In interpret mode (CPU tests) the scan is replaced by one flat
    gather — semantically identical, but it keeps the jaxpr (and the
    interpreter's op count) independent of table size.

    Precondition: every index in w must be in range [0, planes*128).
    All current probes guarantee it (slots are hash values masked to the
    table size); an out-of-range index would return mode="clip" garbage
    here but plane-0 values on the compiled path — a silent divergence."""
    n_planes = ref.shape[0] // 8
    if interpret and n_planes > 2:
        flat = ref[...][::8, :].reshape(-1)       # plane rows are replicas
        return jnp.take(flat, w, mode="clip")
    lane = w & 127
    if n_planes == 1:
        return jnp.take_along_axis(ref[0:8, :], lane, axis=1)
    pno = w >> 7
    if n_planes >= LOOKUP_TREE_MIN:
        gs = [jnp.take_along_axis(ref[p * 8:(p + 1) * 8, :], lane, axis=1)
              for p in range(n_planes)]
        bit = 1
        while len(gs) > 1:
            hi = (pno & bit) != 0
            nxt = [jnp.where(hi, gs[i + 1], gs[i])
                   for i in range(0, len(gs) - 1, 2)]
            if len(gs) % 2:
                # odd carry: its lower select bits were already resolved
                # at the level where it was last paired
                nxt.append(gs[-1])
            gs = nxt
            bit <<= 1
        return gs[0]
    acc = jnp.take_along_axis(ref[0:8, :], lane, axis=1)
    for p in range(1, n_planes):
        g = jnp.take_along_axis(ref[p * 8:(p + 1) * 8, :], lane, axis=1)
        acc = jnp.where(pno == p, g, acc)
    return acc


def _probe_slot(p: "_Probe", disp_planes, prod, interpret: bool = False):
    """Fused CHD slot: bucket and h1 are bit ranges of ONE product
    prod = key * slot_mul (chd.build_*2 tables)."""
    lg_b, lg_r = p.lg_b, p.lg_r
    if p.nodisp:
        # perfect multiplier found at build time: slot is just top bits
        return (prod >> (32 - lg_r)) & ((1 << lg_r) - 1)
    bk = (prod >> (32 - lg_b)) & ((1 << lg_b) - 1)
    if p.disp_u8:
        wd = _lookup(disp_planes, bk >> 2, interpret)
        # uniform shifts + selects beat per-lane variable shifts on the VPU
        lo = jnp.where((bk & 1) == 1, wd >> 8, wd)
        d = jnp.where((bk & 2) == 2, lo >> 16, lo) & 0xFF
    else:
        wd = _lookup(disp_planes, bk >> 1, interpret)
        d = jnp.where((bk & 1) == 1, wd >> 16, wd) & 0xFFFF
    h1 = (prod >> (32 - lg_b - lg_r)) & ((1 << lg_r) - 1)
    return (h1 ^ d) & ((1 << lg_r) - 1)


def _make_kernel(tables: SieveTables, grid: int,
                 tile_rows: int = TILE_ROWS, interpret: bool = False,
                 unroll: int = UNROLL, tail_split: bool = False,
                 split_loops: bool = False):
    has_m1 = tables.m1 is not None
    m2, m3, alive = tables.m2, tables.m3, tables.alive
    alive_ovf = tables.alive_ovf
    TILE_ROWS_, SUB_ = tile_rows, tile_rows // 8

    m1_chain = tables.m1_chain
    sg = grid - 1                   # tail-block grid step (tail_split)

    def kernel(n_ref, data_ref, halo_ref, *refs):
        i = 0
        tail_ref = None
        if tail_split:
            tail_ref = refs[i]; i += 1
        if has_m1:
            m1_planes = refs[i]; i += 1
        if m2 is not None:
            m2_disp = None
            if not m2.nodisp:
                m2_disp = refs[i]; i += 1
            m2_words = refs[i]; i += 1
            m2_keyw = None
            if m2.keyw is not None:          # wide encoding (ids > 15 bits)
                m2_keyw = refs[i]; i += 1
        if m3 is not None:
            m3_disp = None
            if not m3.nodisp:
                m3_disp = refs[i]; i += 1
            m3_words, m3_keyw = refs[i], refs[i + 1]
            i += 2
        if alive is not None:
            al_disp = None
            if not alive.nodisp:
                al_disp = refs[i]; i += 1
            al_words = refs[i]; i += 1
        if alive_ovf is not None:
            ao_disp = None
            if not alive_ovf.nodisp:
                ao_disp = refs[i]; i += 1
            ao_words = refs[i]; i += 1
        out_ref, bits_ref = refs[i], refs[i + 1]
        k4_ref = refs[i + 2]

        g = pl.program_id(0)
        n = n_ref[0, 0]

        # ---- byte assembly: c0..c3 for every position, via lane rolls.
        # Only key4 is staged through scratch: key2/key3 are its high
        # 16/24 bits, recovered per row-group with shifts — two fewer
        # scratch round trips per group than staging all three.
        x = data_ref[:].astype(jnp.int32)                 # (TR,128) = c0
        halo0 = halo_ref[0:1, :].astype(jnp.int32)        # next block's row 0
        if tail_split:
            # sharded no-concat layout: the final grid step's data is the
            # separate tail block (neighbor halo bytes + zero pad); the
            # second-to-last step's lookahead row is the tail's head; the
            # tail step's own lookahead is the tail's zero pad
            tfull = tail_ref[0:TILE_ROWS_, :].astype(jnp.int32)
            x = jnp.where(g == sg, tfull, x)
            t0 = tail_ref[0:1, :].astype(jnp.int32)
            tz = tail_ref[TILE_ROWS_:TILE_ROWS_ + 1, :].astype(jnp.int32)
            halo0 = jnp.where(g == sg - 1, t0,
                              jnp.where(g == sg, tz, halo0))
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS_, LANES), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS_, LANES), 1)
        xu = pltpu.roll(x, TILE_ROWS_ - 1, 0)              # row r -> row r+1
        xu = jnp.where(rows == TILE_ROWS_ - 1,
                       jnp.broadcast_to(halo0, (TILE_ROWS_, LANES)), xu)

        def shifted(k):
            a = pltpu.roll(x, LANES - k, 1)               # lane j -> j+k
            b = pltpu.roll(xu, LANES - k, 1)
            return jnp.where(lanes >= LANES - k, b, a)

        c1, c2, c3 = shifted(1), shifted(2), shifted(3)
        k4_ref[:] = (c3 << 24) | (c2 << 16) | (c1 << 8) | x

        # remaining-bytes base for end-of-input masking: rd = n - position;
        # probes require rd > depth (their last byte read must be < n)
        base8 = (jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) * LANES
                 + jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1))
        n_loc = n - g * (TILE_ROWS_ * LANES)
        srow = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        # alive bitmaps accumulate in the fori carry and store as aligned
        # (8,128) blocks every `ips` iterations — no post-pass re-read of
        # the whole out tile, no sub-tile read-modify-write stores
        ips = max(1, 8 // unroll)

        # ---- per row-group probes. The end-of-input rd masks are
        # vacuous for every grid block strictly before the one holding n
        # (rd > 3 for all its positions): emit an unmasked body for those
        # (the common case) and the masked one only for the tail block —
        # the kernel is ISSUE-bound, so the ~8 dropped compare/and/select
        # ops per row-group are a direct win.
        def make_sub_blk(masked: bool, do_m123: bool = True,
                         do_alive: bool = True):
            def sub_blk(r, bits_acc):
                phase = r % ips
                for u in range(unroll):
                    rr = r * unroll + u
                    k4s = k4_ref[pl.ds(rr * 8, 8), :]
                    if masked:
                        rd = (n_loc - rr * (8 * LANES)) - base8
                        dm = lambda hit, d: hit & (rd > d)
                    else:
                        dm = lambda hit, d: hit
                    if not do_m123:
                        pass
                    else:
                        match = _m123(k4s, dm, masked,
                                      rd if masked else None)
                        out_ref[pl.ds(rr * 8, 8), :] = match
                    if do_alive and alive is not None:
                        bits_acc = _alive_bits(k4s, dm, bits_acc,
                                               phase * unroll + u)

                if do_alive:
                    # stored even when alive is None (bits stay zero) so
                    # kernel_only consumers always see initialized bitmaps
                    @pl.when(phase == ips - 1)
                    def _():
                        bits_ref[pl.ds((r // ips) * 8, 8), :] = bits_acc
                    return jnp.where(phase == ips - 1, 0, bits_acc)
                return bits_acc
            return sub_blk

        def _m123(k4s, dm, masked, rd):
            match = jnp.zeros((8, LANES), jnp.int32)
            if m1_chain is not None:
                c0 = k4s & 0xFF
                for ch, pid in m1_chain:
                    match = jnp.where(c0 == ch, pid, match)
            elif has_m1 and tables.m1_packed:
                c0 = k4s & 0xFF
                w = _lookup(m1_planes, c0 >> 1, interpret)
                match = jnp.where((c0 & 1) == 1, w >> 16, w) & 0xFFFF
            elif has_m1:
                match = _lookup(m1_planes, k4s & 0xFF,
                                interpret)
            if m2 is not None:
                k = k4s & 0xFFFF
                prod = k * _I32(m2.slot_mul)
                slot = _probe_slot(m2, m2_disp, prod, interpret)
                w = _lookup(m2_words, slot, interpret)
                if m2_keyw is not None:     # wide (ids > 15 bits)
                    kw = _lookup(m2_keyw, slot, interpret)
                    match = jnp.where(dm(kw == k, 1), w, match)
                else:
                    # empty slots hold a member key in the key
                    # field (chd.build_exact2): key equality alone
                    hit = dm(((w >> 16) & 0xFFFF) == k, 1)
                    match = jnp.where(hit, w & 0x7FFF, match)
            if m3 is not None:
                k = k4s & 0xFFFFFF
                prod = k * _I32(m3.slot_mul)
                slot = _probe_slot(m3, m3_disp, prod, interpret)
                w = _lookup(m3_words, slot, interpret)
                kw = _lookup(m3_keyw, slot, interpret)  # empty = a member key
                match = jnp.where(dm(kw == k, 2), w, match)
            if masked:
                match = jnp.where(rd > 0, match, 0)
            return match

        def _alive_bits(k4s, dm, bits_acc, srow_sel):
            prod = k4s * _I32(alive.slot_mul)
            # the stored residual comes from an INDEPENDENT multiplier
            # (chd.h_resid): low/derived bits of the slot product overlap
            # h1 once lg_b+lg_r nears 32, gutting the FP rate (r5 fix —
            # 715K false survivors at 100K keys, csr_profile.log)
            prod_r = k4s * _I32(int(chd.MIX_RESID))
            if alive.bucket2:
                # one-gather-level bucket-fingerprint probe: bucket = top
                # lg_r product bits, word = two fp16; the small overflow
                # CHD is an INDEPENDENT chain — its latency hides under
                # the main gather
                bkt = (prod >> (32 - alive.lg_r)) & ((1 << alive.lg_r) - 1)
                w = _lookup(al_words, bkt, interpret)
                fp = prod & 0xFFFF
                hit = ((w & 0xFFFF) == fp) | (((w >> 16) & 0xFFFF) == fp)
                if alive_ovf is not None:
                    prod2 = k4s * _I32(alive_ovf.slot_mul)
                    slot2 = _probe_slot(alive_ovf, ao_disp, prod2,
                                        interpret)
                    w2 = _lookup(ao_words, slot2 >> 1, interpret)
                    r16 = jnp.where((slot2 & 1) == 1, w2 >> 16, w2) & 0xFFFF
                    hit = hit | (r16 == ((prod_r >> 16) & 0xFFFF))
                a = dm(hit, 3)
            elif alive.resid_bits == 16:
                slot = _probe_slot(alive, al_disp, prod, interpret)
                w = _lookup(al_words, slot >> 1, interpret)
                r16 = jnp.where((slot & 1) == 1, w >> 16, w) & 0xFFFF
                a = dm(r16 == ((prod_r >> 16) & 0xFFFF), 3)
            else:                   # 8-bit, packed 4/word
                slot = _probe_slot(alive, al_disp, prod, interpret)
                w = _lookup(al_words, slot >> 2, interpret)
                lo = jnp.where((slot & 1) == 1, w >> 8, w)
                r8 = jnp.where((slot & 2) == 2, lo >> 16, lo) & 0xFF
                a = dm(r8 == ((prod_r >> 24) & 0xFF), 3)
            bw = jnp.sum(a.astype(jnp.int32) << srow, axis=0)
            return jnp.where(srow == srow_sel, bw[None, :], bits_acc)

        bits0 = jnp.zeros((8, LANES), jnp.int32)
        # rd_min over the block = n_loc - (TILE*LANES - 1) > 3
        safe = n_loc >= TILE_ROWS_ * LANES + 4
        if tail_split:
            # the tail grid step holds the NEIGHBOR's bytes: its results
            # are never owned, so skip its probes entirely and zero its
            # bitmap — survivor rounds then never see tail positions, and
            # the owned-size output buffer needs no store from this step
            # (its out window revisits block grid-2 and is left intact)
            active = g < sg
            safe = safe & active

            @pl.when(jnp.logical_not(active))
            def _():
                bits_ref[:] = jnp.zeros((SUB_, LANES), jnp.int32)
        else:
            active = True

        @pl.when(safe)
        def _():
            if split_loops and alive is not None:
                # two passes over the staged k4 tile: the m123 pass and
                # the alive pass each hold a smaller live set, freeing
                # the scheduler to pipeline their gathers (A/B on chip)
                jax.lax.fori_loop(0, SUB_ // unroll,
                                  make_sub_blk(False, True, False), bits0)
                jax.lax.fori_loop(0, SUB_ // unroll,
                                  make_sub_blk(False, False, True), bits0)
            else:
                jax.lax.fori_loop(0, SUB_ // unroll, make_sub_blk(False),
                                  bits0)

        unsafe = jnp.logical_not(safe) if not tail_split else (
            jnp.logical_not(safe) & active)

        @pl.when(unsafe)
        def _():
            jax.lax.fori_loop(0, SUB_ // unroll, make_sub_blk(True), bits0)

    return kernel


ESC_BLOCK_BATCH = 64  # dense blocks walked per escape-loop iteration.
                      # The in-place block-walk kernel writes each
                      # block's COMPLETE result straight into the match
                      # buffer (scalar-prefetch output index maps +
                      # input_output_aliasing), so an iteration is ONE
                      # pallas launch and a tiny scalar concat — no
                      # per-block HLOs at all (a dynamic_update_slice
                      # pair per block cost ~25 us of dispatch each,
                      # ~the whole all-match regime, BENCH_REGIMES r5
                      # first capture). One block is staged in VMEM at a
                      # time, so the batch size only divides the launch
                      # count.


def build_block_walk(wt, *, tile_rows: int = TILE_ROWS,
                     grid_blocks: int, halo_max: int,
                     interpret: bool = False, nblocks: int = 1,
                     tail_split: bool = False,
                     sieve_tables: SieveTables | None = None):
    """In-place dense-block walk kernel for the XLA-side escape.

    run(s, res2d, data2d[, tail2d], *m123_and_walk_tables) -> res2d'
    where s = int32[nblocks + 1] holding the batch's block ids (pad =
    repeats of the last id; the overwrite is idempotent) followed by the
    true byte count n. For every listed block the kernel walks ALL its
    positions to full depth against the VMEM depth-sliced tables,
    computes the exact depth-1..3 matches itself (sieve m1/m2/m3
    probes), and writes the COMPLETE per-position result directly into
    res2d via scalar-prefetch-driven output index maps; res2d is
    input/output-aliased, so untouched blocks keep their sieve-kernel
    content and the caller does NO merge work at all.

    Byte source: the block window + its HALO_ROWS lookahead are DMA'd by
    Pallas from data2d via prefetch-driven input maps and staged once
    per block into a contiguous VMEM scratch (grid steps of one block
    revisit the same windows). Under tail_split the LAST real block's
    lookahead comes from the tail buffer instead. grid_blocks = number
    of data2d blocks; halo_max = last valid HALO_ROWS-unit index in
    data2d (lookahead past it clamps — those bytes are masked by depth).

    This replaces the round-4 IN-kernel escape: arming the check inside
    the hot sieve kernel cost every corpus ~35% even when never taken
    (experiments/logs_r4/escape_ab.log: esc_on 8.437 vs esc_off 6.238
    ms/64 MB). Here the sieve kernel stays escape-free and
    build_pipeline dispatches this kernel only over blocks whose bitmap
    popcount crossed the density threshold — the all-match regime of
    reference Benchmark I (PFAC/doc/PFAC_hash_draft.pdf Table 4).
    """
    from .pallas_walk import _n_m123_refs, emit_block_walk, n_walk_refs

    nw = n_walk_refs(wt)
    st_t = sieve_tables
    n123 = _n_m123_refs(st_t)
    sub = tile_rows // 8
    brows = tile_rows + HALO_ROWS
    hb = tile_rows // HALO_ROWS

    def kernel(s_ref, res_ref, data_ref, *refs):
        i = 0
        tail_ref = None
        if tail_split:
            tail_ref = refs[i]; i += 1
        halo_ref = refs[i]; i += 1
        m123_r = refs[i:i + n123]; i += n123
        walk_refs = refs[i:i + nw]; i += nw
        out_ref = refs[i]
        b8, st8, mt8 = refs[i + 1], refs[i + 2], refs[i + 3]
        blk = pl.program_id(0)       # one grid step per block: per-step
        bid = s_ref[blk]             # overhead measured ~10 us/block at
        n = s_ref[nblocks]           # 64 steps/block (r5 all-match A/B)
        nloc = n - bid * (tile_rows * LANES)

        # stage the block + lookahead contiguously (byte() reads straddle
        # the block/halo boundary)
        for r in range(sub):
            b8[pl.ds(r * 8, 8), :] = (
                data_ref[pl.ds(r * 8, 8), :].astype(jnp.int32))
        if tail_split:
            @pl.when(bid == grid_blocks - 1)
            def _():
                for r in range(HALO_ROWS // 8):
                    b8[pl.ds(tile_rows + r * 8, 8), :] = (
                        tail_ref[pl.ds(r * 8, 8), :].astype(jnp.int32))

            @pl.when(bid < grid_blocks - 1)
            def _():
                for r in range(HALO_ROWS // 8):
                    b8[pl.ds(tile_rows + r * 8, 8), :] = (
                        halo_ref[pl.ds(r * 8, 8), :].astype(jnp.int32))
        else:
            for r in range(HALO_ROWS // 8):
                b8[pl.ds(tile_rows + r * 8, 8), :] = (
                    halo_ref[pl.ds(r * 8, 8), :].astype(jnp.int32))

        base8 = (jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) * LANES
                 + jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1))
        lanes_ = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        def group(lg, c):
            def byte(j):
                r0 = lg * 8 + (j >> 7)
                k = j & 127
                a = b8[pl.ds(r0, 8), :]
                if k == 0:
                    return a
                b = b8[pl.ds(r0 + 1, 8), :]
                ra = pltpu.roll(a, LANES - k, 1)
                rb = pltpu.roll(b, LANES - k, 1)
                return jnp.where(lanes_ >= LANES - k, rb, ra)

            maxd = (nloc - lg * (8 * LANES)) - base8
            emit_block_walk(wt, walk_refs, byte, maxd, st8, mt8, interpret)
            match = jnp.zeros((8, LANES), jnp.int32)
            if st_t is not None:
                # exact depth-1..3 (the sieve's own probes, LE keys,
                # masked by maxd) — the output is the COMPLETE result
                b0, b1, b2 = byte(0), byte(1), byte(2)
                j = 0
                if st_t.m1_chain is not None:
                    for ch, pid in st_t.m1_chain:
                        match = jnp.where((b0 == ch) & (maxd > 0), pid,
                                          match)
                elif st_t.m1 is not None and st_t.m1_packed:
                    w = _lookup(m123_r[j], b0 >> 1, interpret); j += 1
                    m1v = jnp.where((b0 & 1) == 1, w >> 16, w) & 0xFFFF
                    match = jnp.where(maxd > 0, m1v, match)
                elif st_t.m1 is not None:
                    m1v = _lookup(m123_r[j], b0, interpret); j += 1
                    match = jnp.where(maxd > 0, m1v, match)
                if st_t.m2 is not None:
                    m2p = st_t.m2
                    k2 = (b1 << 8) | b0
                    prod = k2 * _I32(m2p.slot_mul)
                    m2_disp = None
                    if not m2p.nodisp:
                        m2_disp = m123_r[j]; j += 1
                    slot = _probe_slot(m2p, m2_disp, prod, interpret)
                    w = _lookup(m123_r[j], slot, interpret); j += 1
                    if m2p.keyw is not None:
                        kw = _lookup(m123_r[j], slot, interpret); j += 1
                        match = jnp.where((kw == k2) & (maxd > 1), w,
                                          match)
                    else:
                        hit2 = (((w >> 16) & 0xFFFF) == k2) & (maxd > 1)
                        match = jnp.where(hit2, w & 0x7FFF, match)
                if st_t.m3 is not None:
                    m3p = st_t.m3
                    k3 = (b2 << 16) | (b1 << 8) | b0
                    prod = k3 * _I32(m3p.slot_mul)
                    m3_disp = None
                    if not m3p.nodisp:
                        m3_disp = m123_r[j]; j += 1
                    slot = _probe_slot(m3p, m3_disp, prod, interpret)
                    w = _lookup(m123_r[j], slot, interpret); j += 1
                    kw = _lookup(m123_r[j], slot, interpret); j += 1
                    match = jnp.where((kw == k3) & (maxd > 2), w, match)
                assert j == len(m123_r)
            wm = mt8[:]
            out_ref[pl.ds(lg * 8, 8), :] = jnp.where(wm > 0, wm, match)
            return c

        jax.lax.fori_loop(0, sub, group, jnp.int32(0))

    m123_arrays = (st_t.arrays[:n123] if st_t is not None else [])
    res_spec = pl.BlockSpec(
        (tile_rows, LANES), lambda i, s: (s[i], 0),
        memory_space=pltpu.VMEM)
    in_specs = [
        res_spec,
        pl.BlockSpec((tile_rows, LANES), lambda i, s: (s[i], 0),
                     memory_space=pltpu.VMEM),
    ]
    if tail_split:
        in_specs.append(pl.BlockSpec((brows, LANES), lambda i, s: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(
        (HALO_ROWS, LANES),
        lambda i, s: (jnp.minimum((s[i] + 1) * hb, halo_max), 0),
        memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((a.shape[0], LANES), lambda i, s: (0, 0),
                     memory_space=pltpu.VMEM)
        for a in list(m123_arrays) + list(wt.arrays)
    ]

    def run(s, res2d, data2d, tail2d, tables):
        # data2d rides twice: once blocked (tile_rows) for the block
        # window, once blocked (HALO_ROWS) for the lookahead window
        ops = [s, res2d, data2d]
        if tail_split:
            ops.append(tail2d)
        ops.append(data2d)
        ops += list(tables)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblocks,),
                in_specs=in_specs,
                out_specs=res_spec,
                scratch_shapes=[
                    pltpu.VMEM((brows, LANES), jnp.int32),   # staged bytes
                    pltpu.VMEM((8, LANES), jnp.int32),       # state
                    pltpu.VMEM((8, LANES), jnp.int32),       # match
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(res2d.shape, jnp.int32),
            input_output_aliases={1: 0},
            interpret=interpret,
        )(*ops)

    return run


# --------------------------------------------------------------------------
# XLA wrapper: compaction (row gathers only) + staged exact tail
# --------------------------------------------------------------------------

def _compact(bits: jax.Array, cap: int, npad: int, rank_offset=0,
             vals2d: jax.Array | None = None,
             bcum: jax.Array | None = None):
    """bits: (nb, 128) per-row-group alive bitmaps (bit s of lane j =
    position group*1024 + s*128 + j). Returns (pos[cap], count) for
    survivor ranks (rank_offset, rank_offset + cap]; padding entries hold
    npad (dropped by the scatter).

    With vals2d (npad//128, 128) given, also returns vals2d's entry at
    each survivor position (row gather + one-hot lane pick; no element
    gathers) — the walker branches use this to carry the kernel's exact
    depth-1..3 match through the merge."""
    if bcum is None:
        counts = jax.lax.population_count(bits).sum(axis=1)    # (nb,)
        bcum = _prefix_1d(counts)
    count = bcum[-1]
    q = jnp.arange(1, cap + 1, dtype=jnp.int32) + rank_offset
    blk, prev = _rank_rows(bcum, q)
    rank = q - prev
    rows = jnp.take(bits, blk, axis=0)                         # (cap,128) row gather
    # localize the rank-th set bit with popcount arithmetic — expanding
    # to (cap, 1024) bits + cumsum costs ~3 ms per 64K round in HBM
    # intermediates; this stays (cap, 128).
    # Enumeration is POSITION-MAJOR (bit s of a row covers positions
    # s*128..s*128+127, so sublane-first counting makes emitted positions
    # ascend with rank — the reduce contract, reference zip order:
    # PFAC/src/PFAC_reduce_kernel.cu:430-457).
    from .xla import _lane_prefix

    # per-sublane set-bit counts, 4 packed per byte lane so TWO lane
    # reduces recover all eight (counts <= 128 < 256 — no carry): eight
    # separate minor-axis reduces cost ~1 ms/round extra (measured)
    m_lo = ((rows & 1) | (((rows >> 1) & 1) << 8)
            | (((rows >> 2) & 1) << 16) | (((rows >> 3) & 1) << 24))
    m_hi = (((rows >> 4) & 1) | (((rows >> 5) & 1) << 8)
            | (((rows >> 6) & 1) << 16) | (((rows >> 7) & 1) << 24))
    s_lo = jnp.sum(m_lo, axis=1)
    s_hi = jnp.sum(m_hi, axis=1)
    cnts = ([(s_lo >> (8 * s)) & 0xFF for s in range(4)]
            + [(s_hi >> (8 * s)) & 0xFF for s in range(4)])
    ccum, acc = [], jnp.zeros(cap, jnp.int32)
    for s in range(8):
        acc = acc + cnts[s]
        ccum.append(acc)
    sbit = sum((c < rank).astype(jnp.int32) for c in ccum)     # first s with
    sbit = jnp.minimum(sbit, 7)                                # ccum >= rank
    prevc = jnp.zeros(cap, jnp.int32)
    for s in range(7):
        prevc = jnp.where(sbit == s + 1, ccum[s], prevc)
    plane = (rows >> sbit[:, None]) & 1                        # (cap,128)
    pcc = _lane_prefix(plane)                  # MXU prefix along lanes, f32
    rin_f = (rank - prevc)[:, None].astype(jnp.float32)
    lane = jnp.sum((pcc < rin_f).astype(jnp.int32), axis=1)
    lane = jnp.minimum(lane, LANES - 1)
    lane_iota = jnp.arange(LANES, dtype=jnp.int32)[None, :]
    onehot_l = lane_iota == lane[:, None]
    pos = blk * 1024 + sbit * 128 + lane
    # padding entries are DISTINCT ascending out-of-range values
    # (npad, npad+1, ...): scatters drop them, and the whole pos vector
    # stays sorted-unique so result scatters can carry
    # indices_are_sorted/unique_indices (~6x faster XLA scatter lowering)
    pos = jnp.where(q <= count, pos, npad + (q - 1 - count))
    if vals2d is None:
        return pos, count
    vrow = jnp.minimum(blk * 8 + sbit, vals2d.shape[0] - 1)
    vrows = jnp.take(vals2d, vrow, axis=0)                     # (cap,128)
    vals = jnp.sum(jnp.where(onehot_l, vrows, 0), axis=1)
    vals = jnp.where(q <= count, vals, 0)
    return pos, count, vals


REDUCE_CAP = 1 << 16    # match ranks per reduce chunk (64K measured best:
                        # per-chunk cost is pass-proportional, and larger
                        # intermediates spill — 43 ms vs 50 ms at 256K)


REDUCE_SCATTER_MAX = False  # r4 capture (experiments/logs_r4/
                            # reduce_micro.log): the sorted scatter-max
                            # pack is WRONG on TPU (duplicate indices
                            # under indices_are_sorted mis-lower) and
                            # 1184 ms/64 MB (per-index, not linear).
                            # Default = chunked rank-select row gathers.


def reduce_from_dense(result: jax.Array, cap: int = REDUCE_CAP):
    """Dense match vector -> compacted (ids, pos, count), positions
    ascending; entries past count are zero.

    Default path: xla._reduce_rowgather — chunked rank-select row
    gathers (~4 gathered rows per output rank). The scatter-max pack
    (xla._reduce_scatter_max) is kept only as a comparison arm: the r4
    on-chip capture showed its duplicate-index sorted scatters are both
    mis-lowered (wrong results) and per-index-slow on TPU."""
    if REDUCE_SCATTER_MAX:
        from .xla import _reduce_scatter_max
        return _reduce_scatter_max(result)
    from .xla import _reduce_rowgather
    return _reduce_rowgather(result, cap=min(cap, result.shape[0]))


# --------------------------------------------------------------------------
# Heavy regime: match-dense corpora where survivors exceed CAP_MID
# (the reference's "virus-dense" worst case, PFAC_hash_draft.pdf Table 5).
# Survivor ranks are processed in rounds of HEAVY_CAP; within a round the
# walk is depth-staged with active-set compaction so a few long matches
# don't hold 64K lanes lockstep for hundreds of steps. ~15-20x faster than
# the whole-corpus lockstep walker (see DESIGN_NOTES.md for why this
# regime is gather-bound on TPU either way).
# --------------------------------------------------------------------------

HEAVY_CAP = 1 << 15     # survivor ranks per heavy round — r4 cap sweep
                        # (round_profile.log): 32K x 8 rounds = 62.6
                        # ns/survivor vs 64K x 4 = 68.6 at equal coverage
PER_IDX_ROUNDS = 0      # tier-A per-index in-loop scatters DISABLED —
                        # r4 captures (scatter_micro.log,
                        # round_profile.log): plain per-index scatter is
                        # ~114 ns/index (6.11 ms marginal per 64K round),
                        # not the assumed ~8 ns, while the sorted+unique
                        # one-shot is a flat linear output pass (~3.2 ms
                        # at 128 MB npad) — buffering always wins
PER_IDX_NPAD_MIN = 23 << 20   # (unused while PER_IDX_ROUNDS == 0; kept
                        # with the tier machinery for re-capture)
R_BUF_ROUNDS = 32       # heavy rounds whose (pos, val) pairs are buffered
                        # for the single deferred scatter — 32 x 32K
                        # keeps the round-2-measured 1M-survivor / 8 MB
                        # buffered coverage at the r4 HEAVY_CAP; rounds
                        # past that — only pathological
                        # all-positions-match corpora — scatter directly
                        # per round (r4: ~5 ms/round worse than buffered,
                        # round_profile.log)
# depth stages with survivor-fraction headroom for realistic length mixes
# (virus-dense Snort-like: P(len>16)~0.55, P(len>48)~0.09, P(len>112)~0.005);
# consumed by the CSR row-gather walker (backends.xla_csr)
_HEAVY_D1 = 16          # all survivors walk this far
_HEAVY_B_FRAC = 4       # then <= 3/4 cap continue ...
_HEAVY_D2 = 48          # ... to here
_HEAVY_C_FRAC = 4       # then <= cap/4 continue ...
_HEAVY_D3 = 112         # ... to here
_HEAVY_E_FRAC = 16      # then <= cap/16 continue to max_len in cond-guarded steps


def _rank_select(flags: jax.Array, cap_out: int):
    """Indices of the first cap_out set flags (1-D). Padding entries hold
    len(flags) — out of range, so downstream scatters drop them.

    Row-gather form (r5): the old per-rank binary search cost log2(nf)
    ELEMENTWISE gathers per rank (~3 ms per 24K-rank prune at the chip's
    0.12 G elem/s elementwise rate — the dominant CSR-round cost,
    logs_r5/csr_profile.log); this is the same compare-sum + row-gather
    + MXU-lane-prefix shape as _compact, all fast-path traffic."""
    nf = flags.shape[0]
    nfp = -(-nf // LANES) * LANES
    f = flags.astype(jnp.int32)
    if nfp != nf:
        f = jnp.concatenate([f, jnp.zeros(nfp - nf, jnp.int32)])
    f2 = f.reshape(-1, LANES)
    bcum = _prefix_1d(f2.sum(axis=1))
    cnt = bcum[-1]
    q = jnp.arange(1, cap_out + 1, dtype=jnp.int32)
    row, prev = _rank_rows(bcum, q)
    vals = jnp.take(f2, row, axis=0)                 # (cap_out, 128)
    from .xla import _lane_prefix
    rcum = _lane_prefix(vals)                        # 0/1 flags, f32 exact
    within = jnp.sum((rcum < (q - prev)[:, None].astype(jnp.float32))
                     .astype(jnp.int32), axis=1)
    within = jnp.minimum(within, LANES - 1)
    idx = jnp.where(q <= cnt, row * LANES + within, nf)
    return idx, cnt


def _rank_select_gather(flags: jax.Array, cap_out: int, *vecs: jax.Array):
    """_rank_select plus row-gather extraction of companion vectors:
    returns (idx, cnt, v0[idx], v1[idx], ...) with the same fast-path
    traffic (an elementwise v[idx] would cost ~0.12 G elem/s). Entries
    past cnt hold garbage — callers mask on idx < len(flags)."""
    nf = flags.shape[0]
    nfp = -(-nf // LANES) * LANES
    f = flags.astype(jnp.int32)
    if nfp != nf:
        f = jnp.concatenate([f, jnp.zeros(nfp - nf, jnp.int32)])
    f2 = f.reshape(-1, LANES)
    bcum = _prefix_1d(f2.sum(axis=1))
    cnt = bcum[-1]
    q = jnp.arange(1, cap_out + 1, dtype=jnp.int32)
    row, prev = _rank_rows(bcum, q)
    vals = jnp.take(f2, row, axis=0)
    from .xla import _lane_prefix
    rcum = _lane_prefix(vals)
    within = jnp.sum((rcum < (q - prev)[:, None].astype(jnp.float32))
                     .astype(jnp.int32), axis=1)
    within = jnp.minimum(within, LANES - 1)
    idx = jnp.where(q <= cnt, row * LANES + within, nf)
    onehot = (jnp.arange(LANES, dtype=jnp.int32)[None, :]
              == within[:, None])
    outs = []
    for v in vecs:
        v1 = v
        if nfp != nf:
            v1 = jnp.concatenate([v1, jnp.zeros(nfp - nf, v1.dtype)])
        vr = jnp.take(v1.reshape(-1, LANES), row, axis=0)
        outs.append(jnp.sum(jnp.where(onehot, vr, 0), axis=1))
    return (idx, cnt, *outs)


def build_pipeline(automaton: Automaton, tables: SieveTables, *,
                   npad: int, cap: int, interpret: bool = False,
                   kernel_only: bool = False, aligned: bool = False,
                   tile_rows: int = TILE_ROWS, walk_tables=None,
                   csr_tables=None, unroll: int = UNROLL,
                   tail_split: bool = False,
                   split_loops: bool | None = None):
    """Pure pipeline function for one static geometry (npad positions,
    survivor capacity cap):

        run(table_args, dense_flat, data_u8, n_arr) -> (result, count, ovf)

    `table_args` is the sieve kernel's plane arrays followed by the deep
    engine's (walk_tables.arrays when given, else csr_tables.arrays) —
    the split is static. Not jitted — callable directly, under jax.jit,
    or inside shard_map (the distributed matcher runs it per shard with a
    ppermute halo). `n_arr` is a (1,) int32 giving the true byte count;
    positions at or past it report 0 and never match. With aligned=True
    the caller guarantees len(data_u8) == npad, skipping the
    padded-buffer copy (the lookahead halo comes from a separate zero
    block instead).

    The deep tail is the Pallas survivor-walk engine when the ruleset's
    walk tables exist (Snort-scale; exact, no stage capacities), else the
    CSR row-gather walker (backends.xla_csr — big/wide rulesets; staged
    capacities set the deferred overflow flag). `dense_flat` is unused by
    either tail and may be a dummy; it remains in the signature for the
    callers' stable arity.
    """
    if tile_rows % 64 or tile_rows <= 0:
        raise PfacError(
            PfacStatus.INVALID_PARAMETER,
            "tile_rows must be a positive multiple of 64",
        )
    grid = npad // (tile_rows * LANES)
    if split_loops is None:
        split_loops = SPLIT_LOOPS
    # dense-block escape: XLA-SIDE for the walker tier on both layouts
    # (the hot kernel carries zero escape code — round 4 measured the
    # in-kernel form costing 35% even when never taken, escape_ab.log).
    # The block-walk kernel's byte(j) lookahead reads at most
    # HALO_ROWS*LANES bytes past a row-group, so the escape must not arm
    # for deeper rulesets — today the VMEM walk-table budget keeps
    # max_len far below this, but the gate must not rest on that
    # unrelated constant (review finding).
    esc_ok = (walk_tables is not None
              and DENSE_ESCAPE_DIV > 0
              and tables.alive is not None
              and walk_tables.max_len + 4 <= HALO_ROWS * LANES
              and not kernel_only)
    esc_kb = max(1, min(ESC_BLOCK_BATCH,
                        grid - 1 if tail_split else grid))
    hb_ = tile_rows // HALO_ROWS
    if tail_split:
        esc_gb, esc_hmax = grid - 1, (grid - 1) * hb_ - 1
    elif aligned:
        esc_gb, esc_hmax = grid, grid * hb_ - 1
    else:
        esc_gb, esc_hmax = grid, grid * hb_   # rows_u8 carries HALO extra
    block_walk = (build_block_walk(walk_tables, tile_rows=tile_rows,
                                   grid_blocks=esc_gb, halo_max=esc_hmax,
                                   interpret=interpret, nblocks=esc_kb,
                                   tail_split=tail_split,
                                   sieve_tables=tables)
                  if esc_ok else None)
    kernel = _make_kernel(tables, grid, tile_rows, interpret, unroll,
                          tail_split, split_loops)
    sub = tile_rows // 8
    a = automaton
    has_alive = tables.alive is not None

    tab_specs = [
        pl.BlockSpec((t.shape[0], LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for t in tables.arrays
    ]
    hb = tile_rows // HALO_ROWS
    if tail_split:
        # sharded no-concat layout: the shard's own bytes (npad - one
        # block) arrive untouched; the final block (neighbor halo + zero
        # pad) is a separate constant-indexed input selected in-kernel —
        # no device-side concat of the whole shard per dispatch
        if grid < 2:
            raise PfacError(PfacStatus.INVALID_PARAMETER,
                            "tail_split needs at least 2 grid blocks")
        data_spec = pl.BlockSpec(
            (tile_rows, LANES),
            lambda i: (jnp.minimum(i, grid - 2), 0),
            memory_space=pltpu.VMEM)
        halo_spec = pl.BlockSpec(
            (HALO_ROWS, LANES),
            lambda i: (jnp.minimum((i + 1) * hb, (grid - 1) * hb - 1), 0),
            memory_space=pltpu.VMEM)
        tail_specs = [pl.BlockSpec((tile_rows + HALO_ROWS, LANES),
                                   lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)]
    else:
        data_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        tail_specs = []
        if aligned:
            # halo = next block's head, clamped for the final grid step:
            # its lookahead bytes are garbage there, but they only feed
            # c1..c3 of positions within 3 bytes of npad == n, which the
            # rd masks kill
            halo_spec = pl.BlockSpec(
                (HALO_ROWS, LANES),
                lambda i: (jnp.minimum((i + 1) * hb, grid * hb - 1), 0),
                memory_space=pltpu.VMEM)
        else:
            halo_spec = pl.BlockSpec(
                (HALO_ROWS, LANES),
                lambda i: ((i + 1) * hb, 0),
                memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        data_spec,
        halo_spec,
    ] + tail_specs + tab_specs
    # tail_split: the match output is sized to the OWNED range only —
    # the tail grid step stores nothing (its window revisits block
    # grid-2, left intact), so the sharded caller's result needs no
    # (npad -> shard_len) slice copy at all (r4 shard-efficiency gap:
    # 0.884 at 64 MB, the owned-slice relayout suspect)
    own_blocks = grid - 1 if tail_split else grid
    out_specs = [
        pl.BlockSpec((tile_rows, LANES),
                     (lambda i: (jnp.minimum(i, grid - 2), 0)) if tail_split
                     else (lambda i: (i, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((own_blocks * tile_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((grid * sub, LANES), jnp.int32),
    ]
    rows_u8 = grid * tile_rows + HALO_ROWS

    n_sieve_args = len(tables.arrays)
    wt = walk_tables

    def run(table_args, dense_flat, data_u8, n_arr, tail_u8=None):
        sieve_args = table_args[:n_sieve_args]
        walk_args = table_args[n_sieve_args:]
        n_smem = n_arr.reshape(1, 1)
        extra = []
        if tail_split:
            data2d = data_u8.reshape((grid - 1) * tile_rows, LANES)
            tail2d = tail_u8.reshape(tile_rows + HALO_ROWS, LANES)
            extra = [tail2d]
        elif aligned:
            data2d = data_u8.reshape(grid * tile_rows, LANES)
        else:
            padded = jnp.zeros(rows_u8 * LANES, jnp.uint8)
            padded = jax.lax.dynamic_update_slice(padded, data_u8, (0,))
            data2d = padded.reshape(rows_u8, LANES)
        out, bits = pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((tile_rows, LANES), jnp.int32)],
            interpret=interpret,
        )(n_smem, data2d, data2d, *extra, *sieve_args)
        if kernel_only:
            return out.reshape(-1), bits
        # survivor windows source: the sharded no-concat layout reads
        # boundary-straddling windows from (main, tail) via a dual gather
        win_src = (data2d, tail2d) if tail_split else data2d
        if not has_alive and csr_tables is None:
            return out.reshape(-1), jnp.int32(0), jnp.int32(0)
        if not has_alive:
            # big tier (alive keys past _ALIVE_CHD_MAX): the kernel emits
            # zero bits; survivors come from ONE XLA row gather against
            # the CSR keys-only table — exact 4-byte-prefix membership
            from .xla_csr import entry_filter_bits
            if tail_split:
                flat = jnp.concatenate([data2d.reshape(-1),
                                        tail2d.reshape(-1)])
            else:
                flat = data2d.reshape(-1)
                if int(flat.shape[0]) < npad + 3:
                    flat = jnp.concatenate(
                        [flat, jnp.zeros(npad + 3 - int(flat.shape[0]),
                                         jnp.uint8)])
            bits = entry_filter_bits(csr_tables, walk_args[-1], flat,
                                     npad, n_arr[0])
            if tail_split:
                # tail-block positions are the neighbor's: drop them like
                # the kernel's own bitmap path does
                riota = jnp.arange(grid * sub, dtype=jnp.int32)[:, None]
                bits = jnp.where(riota < own_blocks * sub, bits, 0)
        rowcnt = jax.lax.population_count(bits).sum(axis=1)  # (grid*sub,)

        if esc_ok:
            # ---- dense-block escape (XLA side): blocks whose survivor
            # count crossed block_positions/DENSE_ESCAPE_DIV would cost
            # ~35 ns x up to 64K survivors EACH through the per-survivor
            # walker rounds; instead each dense block walks ALL its
            # positions through the standalone block-walk kernel (no
            # window gathers, no compaction) and its rows are dropped
            # from the survivor counts. The while_loop runs ZERO
            # iterations — and costs only this popcount reduce, already
            # needed for compaction — on every non-pathological corpus.
            blkcnt = rowcnt.reshape(grid, sub).sum(axis=1)       # (grid,)
            thresh = (tile_rows * LANES) // DENSE_ESCAPE_DIV
            esc_flags = blkcnt >= thresh
            if tail_split:
                # the tail block's positions belong to the neighbor (the
                # owned slice drops them) — never escape it
                esc_flags = esc_flags & (
                    jnp.arange(grid, dtype=jnp.int32) < grid - 1)
            blk_ids, n_esc = _rank_select(esc_flags, min(grid, 1 << 15))
            n_scalar = n_arr[0]

            from .pallas_walk import _n_m123_refs
            esc_tabs = (list(sieve_args[:_n_m123_refs(tables)])
                        + list(walk_args))
            esc_tail = tail2d if tail_split else None

            def esc_body(s):
                # ESC_BLOCK_BATCH blocks per iteration, ONE pallas
                # launch each: the in-place kernel DMAs its own block
                # windows (prefetch-driven input maps) and writes every
                # block's COMPLETE result straight into the aliased
                # match buffer — no per-block HLOs (a
                # dynamic_update_slice pair per block cost ~25 us of
                # dispatch each and dominated the all-match regime;
                # row scatters measured ~30x slower than row gathers).
                # Padding (final iteration) repeats the last block id;
                # the overwrite is idempotent.
                i, res2d = s
                ranks = jnp.minimum(
                    i * esc_kb + jnp.arange(esc_kb, dtype=jnp.int32),
                    jnp.maximum(n_esc - 1, 0))
                bids = jnp.take(blk_ids, ranks)
                sv = jnp.concatenate([bids, n_scalar.reshape(1)])
                return i + 1, block_walk(sv, res2d, data2d, esc_tail,
                                         esc_tabs)

            _, out = jax.lax.while_loop(
                lambda s: s[0] * esc_kb < n_esc, esc_body,
                (jnp.int32(0), out))
            # escaped blocks leave the survivor counts entirely (their
            # positions were walked to full depth above); one fused pass
            # replaces per-iteration bitmap-row updates
            rowcnt = jnp.where(jnp.repeat(esc_flags, sub), 0, rowcnt)

        matches = out.reshape(-1)
        bcum = _prefix_1d(rowcnt)
        count = bcum[-1].astype(jnp.int32)

        if wt is not None:
            # ---- Pallas survivor-walk engine (backends/pallas_walk.py):
            # exact deep walks over depth-sliced VMEM tables; every
            # survivor walks to full depth, so no stage capacities and no
            # overflow flag. The kernel's exact depth-1..3 match rides
            # along from compaction; a deeper walker match overrides it
            # (longest match wins).
            from .pallas_walk import GROUP, _n_m123_refs, build_walker

            # the walker computes depth-1..3 itself (from the sieve's own
            # m1/m2/m3 tables), so a round never READS the dense result it
            # scatters into — reading it would force XLA to copy the
            # 512 MB while-loop carry every heavy round
            m123_args = sieve_args[:_n_m123_refs(tables)]
            walkfns: dict = {}

            def get_walkfn(cw):
                if cw not in walkfns:
                    walkfns[cw] = build_walker(wt, cap=cw,
                                               interpret=interpret,
                                               sieve_tables=tables)
                return walkfns[cw]

            def walker_round(walkfn, cw, off):
                pos, _ = _compact(bits, cw, npad, rank_offset=off,
                                  bcum=bcum)
                merged = walkfn(list(m123_args) + list(walk_args),
                                win_src, pos, n_arr)
                return pos, merged

            # NO density switch: one always-on light round (ranks
            # [0, cl)) plus a while_loop of heavy rounds that runs ZERO
            # iterations for typical corpora. A lax.switch here cost
            # ~1.5 ms/dispatch in 512 MB branch-boundary copies; the
            # straight-line form pays only one in-place scatter.
            cl = min(-(-cap // GROUP) * GROUP, npad)
            pos0, merged0 = walker_round(get_walkfn(cl), cl, 0)
            # the LIGHT round scatters few indices: the default per-index
            # lowering beats the sorted full-output-pass lowering below
            # ~16K indices (measured; the heavy rounds use sorted)
            result = matches.at[pos0].set(merged0, mode="drop")

            hc = min(-(-HEAVY_CAP // GROUP) * GROUP, npad)
            heavy_walkfn = get_walkfn(hc)

            # Tier A: on large corpora the first PER_IDX_ROUNDS heavy
            # rounds scatter PER-INDEX inside the loop. A sorted scatter
            # is a full-output pass (npad-shaped: ~5.9 ms on a 512 MB
            # result) while per-index cost is hc-shaped (~0.5 ms/round at
            # 64K incl. dropped padding), so the rounds that cover every
            # realistic match-bearing density (DEFCON ~2) never pay the
            # full pass. Zero iterations — zero cost — when the light
            # round covered everything. The gate is STATIC on npad: below
            # the crossover one full pass is cheaper than one per-index
            # round, so small corpora keep the pure buffered form.
            pir = PER_IDX_ROUNDS if npad >= PER_IDX_NPAD_MIN else 0
            if pir:
                def cond_a(s):
                    i, _ = s
                    return (cl + i * hc < count) & (i < pir)

                def body_a(s):
                    i, res = s
                    pos, merged = walker_round(heavy_walkfn, hc,
                                               cl + i * hc)
                    return i + 1, res.at[pos].set(merged, mode="drop")

                _, result = jax.lax.while_loop(
                    cond_a, body_a, (jnp.int32(0), result))

            # Tier B: rounds past tier A BUFFER their (pos, merged) pairs
            # and scatter ONCE after the loop (the match-dense regime,
            # where per-round full-output passes made round count the
            # dominant cost). The buffer stays globally sorted-unique:
            # ranks ascend with position, _compact pads ascend from npad
            # with global rank (bounded by npad + cl + (pir+R)*hc), and
            # unwritten buffer slots are initialized past both.
            bb = R_BUF_ROUNDS * hc
            pad_base = npad + cl + (pir + R_BUF_ROUNDS + 1) * hc
            if pad_base + bb >= (1 << 31):    # all python ints at trace time
                raise PfacError(
                    PfacStatus.INVALID_PARAMETER,
                    "deferred-scatter buffer init exceeds int32: lower "
                    "HEAVY_CAP/R_BUF_ROUNDS/PER_IDX_ROUNDS or shard the "
                    "input",
                )
            bpos0 = pad_base + jnp.arange(bb, dtype=jnp.int32)
            bval0 = jnp.zeros(bb, jnp.int32)

            def cond(s):
                i, _, _ = s
                return (cl + (pir + i) * hc < count) & (i < R_BUF_ROUNDS)

            def body(s):
                i, bp, bv = s
                pos, merged = walker_round(heavy_walkfn, hc,
                                           cl + (pir + i) * hc)
                return (i + 1,
                        jax.lax.dynamic_update_slice(bp, pos, (i * hc,)),
                        jax.lax.dynamic_update_slice(bv, merged, (i * hc,)))

            nr, bpos, bval = jax.lax.while_loop(
                cond, body, (jnp.int32(0), bpos0, bval0))

            # one-shot scatter: zero iterations (hence zero cost) when no
            # tier-B round ran — the usual case for typical corpora
            def cond_s(s):
                j, _ = s
                return (j == 0) & (nr > 0)

            def body_s(s):
                j, res = s
                return j + 1, res.at[bpos].set(
                    bval, mode="drop", indices_are_sorted=True,
                    unique_indices=True)

            _, result = jax.lax.while_loop(
                cond_s, body_s, (jnp.int32(0), result))

            # pathological tail (survivors past the buffered rounds, e.g.
            # every position matching): direct per-round scatters, zero
            # iterations unless the buffer filled
            def cond_t(s):
                i, _ = s
                return cl + i * hc < count

            def body_t(s):
                i, res = s
                pos, merged = walker_round(heavy_walkfn, hc, cl + i * hc)
                return i + 1, res.at[pos].set(
                    merged, mode="drop", indices_are_sorted=True,
                    unique_indices=True)

            _, result = jax.lax.while_loop(
                cond_t, body_t, (jnp.int32(pir) + nr, result))
            return result, count, jnp.int32(0)
        else:
            # ---- CSR row-gather walker (backends.xla_csr): big/wide
            # rulesets (pattern IDs or per-depth state counts >= 2^16, or
            # walk tables past the VMEM budget). Rounds of hc ranks in one
            # while_loop; only positive deep matches scatter, so the
            # kernel's exact depth-1..3 results survive the merge.
            if csr_tables is None:
                raise PfacError(
                    PfacStatus.INTERNAL_ERROR,
                    "pipeline needs walk_tables or csr_tables for the "
                    "deep tail",
                )
            from .pallas_walk import GROUP
            from .xla_csr import build_csr_walker

            hc = min(-(-HEAVY_CAP // GROUP) * GROUP, npad)
            csr_walkfn = build_csr_walker(csr_tables, cap=hc,
                                          interpret=interpret)

            out2d = matches.reshape(-1, LANES)

            def csr_round(i):
                pos, _, kvals = _compact(bits, hc, npad, rank_offset=i * hc,
                                         bcum=bcum, vals2d=out2d)
                merged, o = csr_walkfn(list(walk_args), win_src, pos, n_arr)
                # deep match overrides; else rewrite the kernel's own
                # depth-1..3 value — keeps pos sorted-unique (masking pos
                # instead would interleave out-of-range values)
                return pos, jnp.where(merged > 0, merged, kvals), o

            # same tiered round structure as the walker branch above:
            # per-index in-loop scatters for the first rounds on large
            # corpora (tier A), then buffered rounds + one sorted scatter,
            # then the direct-scatter overflow tail. Tier A reads kvals
            # from the ORIGINAL kernel output (out2d) — rank ranges are
            # disjoint, so earlier tier-A writes never cover a later
            # round's positions.
            pir = PER_IDX_ROUNDS if npad >= PER_IDX_NPAD_MIN else 0
            result = matches
            overflow0 = jnp.int32(0)
            if pir:
                def cond_a(s):
                    i, _, _ = s
                    return (i * hc < count) & (i < pir)

                def body_a(s):
                    i, res, ovf = s
                    pos, val, o = csr_round(i)
                    return (i + 1, res.at[pos].set(val, mode="drop"),
                            ovf | o)

                _, result, overflow0 = jax.lax.while_loop(
                    cond_a, body_a, (jnp.int32(0), result, overflow0))

            bb = R_BUF_ROUNDS * hc
            pad_base = npad + (pir + R_BUF_ROUNDS + 1) * hc
            if pad_base + bb >= (1 << 31):    # all python ints at trace time
                raise PfacError(
                    PfacStatus.INVALID_PARAMETER,
                    "deferred-scatter buffer init exceeds int32: lower "
                    "HEAVY_CAP/R_BUF_ROUNDS/PER_IDX_ROUNDS or shard the "
                    "input",
                )
            bpos0 = pad_base + jnp.arange(bb, dtype=jnp.int32)
            bval0 = jnp.zeros(bb, jnp.int32)

            def cond(s):
                i, _, _, _ = s
                return ((pir + i) * hc < count) & (i < R_BUF_ROUNDS)

            def body(s):
                i, bp, bv, ovf = s
                pos, val, o = csr_round(pir + i)
                return (i + 1,
                        jax.lax.dynamic_update_slice(bp, pos, (i * hc,)),
                        jax.lax.dynamic_update_slice(bv, val, (i * hc,)),
                        ovf | o)

            nr, bpos, bval, overflow = jax.lax.while_loop(
                cond, body, (jnp.int32(0), bpos0, bval0, overflow0))

            def cond_s(s):
                j, _ = s
                return (j == 0) & (nr > 0)

            def body_s(s):
                j, res = s
                return j + 1, res.at[bpos].set(
                    bval, mode="drop", indices_are_sorted=True,
                    unique_indices=True)

            _, result = jax.lax.while_loop(
                cond_s, body_s, (jnp.int32(0), result))

            def cond_t(s):
                i, _, _ = s
                return i * hc < count

            def body_t(s):
                i, res, ovf = s
                pos, val, o = csr_round(i)
                return i + 1, res.at[pos].set(
                    val, mode="drop", indices_are_sorted=True,
                    unique_indices=True), ovf | o

            _, result, overflow = jax.lax.while_loop(
                cond_t, body_t, (jnp.int32(pir) + nr, result, overflow))
            return result, count, overflow

    return run


def npad_for(n: int, tile_rows: int = TILE_ROWS) -> int:
    """Positions padded up to the kernel's grid-step granularity."""
    block = tile_rows * LANES
    return max(1, -(-n // block)) * block


_WALK_VMEM_BUDGET = 6 << 20


def build_walk_tables_gated(automaton: Automaton, tables: SieveTables):
    """Survivor-walk tables when the ruleset supports them and they fit
    VMEM; None routes the pipeline's tail to the XLA fallback walkers."""
    if tables.alive is None:
        return None                     # no length>=4 patterns: no tail
    from .pallas_walk import build_walk_tables

    wt = build_walk_tables(automaton)
    if wt is not None and wt.vmem_bytes > _WALK_VMEM_BUDGET:
        return None
    return wt


class SieveMatcher:
    """Device matcher backed by the Pallas sieve kernel + exact XLA tail.

    Interface-compatible with backends.xla.XlaMatcher.
    """

    def __init__(self, automaton: Automaton, *, tile_rows: int | None = None,
                 interpret: bool = False, device=None):
        if tile_rows is None:
            # interpret mode (CPU tests) drags every grid step through the
            # Pallas interpreter — small tiles keep the suite fast; the
            # compiled path keeps the measured-optimal production geometry
            tile_rows = 64 if interpret else TILE_ROWS
        self.tile_rows = tile_rows
        self.automaton = automaton
        self.interpret = interpret
        self.device = device
        self.tables = SieveTables.build(automaton)
        self.walk_tables = build_walk_tables_gated(
            automaton, self.tables)
        self.csr_tables = None
        if self.walk_tables is None:
            # big/wide ruleset: the CSR row-gather walker serves the tail
            # (returns None when there are no length>=4 patterns; the
            # big tier — alive keys past _ALIVE_CHD_MAX, tables.alive is
            # None — also draws its XLA entry filter from these tables)
            from .xla_csr import build_csr_tables
            self.csr_tables = build_csr_tables(automaton)
        deep = (self.walk_tables.arrays if self.walk_tables is not None
                else self.csr_tables.arrays if self.csr_tables is not None
                else [])
        put = lambda x: jax.device_put(jnp.asarray(x), device)
        self._table_args = [put(a) for a in self.tables.arrays + deep]
        # neither deep tail reads the dense table; a 1-element dummy keeps
        # the pipeline arity (a 100K-pattern dense table would be GBs)
        self._dense_flat = put(np.zeros(1, np.int32))
        self._fns: dict = {}
        self._cap = 1 << 12
        self._pending: list = []
        self._fallback_engine = None

    def _fallback(self):
        if self._fallback_engine is None:
            from .xla import XlaMatcher
            self._fallback_engine = XlaMatcher(
                self.automaton, perf_mode="dense", device=self.device
            )
        return self._fallback_engine

    # ------------------------------------------------------------ pipeline
    def _npad(self, n: int) -> int:
        return npad_for(n, self.tile_rows)

    def _pipeline_fn(self, npad: int, cap: int, aligned: bool = False):
        key = (npad, cap, aligned)
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(build_pipeline(
                self.automaton, self.tables, npad=npad, cap=cap,
                interpret=self.interpret, aligned=aligned,
                tile_rows=self.tile_rows, walk_tables=self.walk_tables,
                csr_tables=self.csr_tables,
            ))
            self._fns[key] = fn
        return fn

    def _dispatch(self, data_u8: jax.Array, n: int | None = None):
        """-> (result, count, overflow). The pipeline handles EVERY
        survivor density in one program (light/mid/heavy switch); overflow
        is nonzero only when a heavy-stage capacity was exceeded (very
        deep AND very dense rulesets), in which case the result is
        incomplete and the caller must use the fallback walker.

        `n` is the true byte count when data_u8 is already bucket-padded
        (positions at or past n report 0)."""
        if n is None:
            n = int(data_u8.shape[0])
        # margin covers npad rounding + _compact's distinct out-of-range
        # padding AND the deferred-scatter buffer init (bpos0 reaches
        # npad + cl + (PER_IDX_ROUNDS + 2*R_BUF_ROUNDS + 1)*HEAVY_CAP - 1
        # ~ npad + 2.4M at defaults; wrap would break the one-shot
        # scatter's sorted-unique claim — build_pipeline re-asserts the
        # exact bound, so constant bumps can't silently outgrow this)
        if n > (1 << 31) - (1 << 22):
            raise PfacError(
                PfacStatus.INVALID_PARAMETER,
                "input exceeds int32 position range; shard it "
                "(dist.ShardedMatcher) or feed <2 GiB chunks",
            )
        npad = self._npad(n)
        cap = min(self._cap, npad)
        fn = self._pipeline_fn(npad, cap,
                               aligned=(int(data_u8.shape[0]) == npad))
        n_arr = jnp.full((1,), n, jnp.int32)
        return fn(self._table_args, self._dense_flat, data_u8, n_arr)

    def match_device(self, data_u8: jax.Array) -> jax.Array:
        """uint8[N] on device -> int32[npad] match ids (padded tail = 0).

        Stage-overflow checking is DEFERRED: a device→host readback costs
        ~30 ms on tunneled runtimes, so this path does not sync per call.
        The (rare) heavy-stage overflow flags are validated lazily — every
        `_FLUSH_EVERY` dispatches, or whenever `flush_checks()` / a
        host-materializing API (`match`, `match_reduce`) runs. On overflow
        PfacError is raised; results returned since the previous flush
        must be recomputed via `match()`.
        """
        result, _, overflow = self._dispatch(data_u8)
        self._pending.append(overflow)
        if len(self._pending) >= self._FLUSH_EVERY:
            self.flush_checks()
        return result

    _FLUSH_EVERY = 64

    def flush_checks(self) -> None:
        """Validate pending heavy-stage overflow flags (one round trip)."""
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        if any(int(o) for o in jax.device_get(pending)):
            raise PfacError(
                PfacStatus.INTERNAL_ERROR,
                "heavy-stage capacity exceeded (very deep + dense corpus); "
                "rerun the affected inputs via match(), which falls back "
                "to the lockstep walker",
            )

    # ------------------------------------------------------------ host API
    def match(self, data) -> np.ndarray:
        arr = _to_u8(data)
        n = arr.shape[0]
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        # pad host-side to the npad bucket: every input length in the
        # bucket then shares ONE compiled (aligned) pipeline instead of
        # retracing per byte-length (n_arr carries the true count)
        npad = self._npad(n)
        if n != npad:
            arr = np.pad(arr, (0, npad - n))
        data_dev = jax.device_put(arr, self.device)
        result, _, overflow = self._dispatch(data_dev, n=n)
        # one batched transfer: result + flag in a single round trip
        res_np, ovf = jax.device_get((result, overflow))
        if int(ovf):
            # a heavy-stage capacity overflowed (extremely deep + dense):
            # the lockstep walker is the last-resort correct engine
            return self._fallback().match(data)
        return res_np[:n]

    def match_reduce_device(self, data_u8):
        result = self.match_device(data_u8)
        key = ("reduce", result.shape[0])
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(reduce_from_dense)
            self._fns[key] = fn
        return fn(result)

    def match_reduce(self, data):
        from .xla import host_reduce
        return host_reduce(self.match(data))
