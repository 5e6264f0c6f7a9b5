"""Pallas survivor-walk engine: exact deep walks at VPU speed.

Replaces the XLA elementwise-gather tail/heavy walkers (one `jnp.take`
per lane per DFA step at ~0.12 G elem/s on this chip) with a Pallas
kernel probing VMEM-resident perfect-hash tables. TPU-native rethink of
the reference's space-driven deep-walk kernel (reference:
PFAC/src/PFAC_kernel_spaceDriven.cu:465-558), exploiting a property the
CUDA code never needed: in a failureless-AC walk every lane is at the
SAME trie depth at step d, so the transition table can be sliced by
depth and each step probes only that depth's (tiny) edge set.

* **Depth-sliced, 2-byte-stepping edge tables.** States at each depth get
  compact per-depth indices (< 2^16). One walk step consumes TWO bytes:
  key32 = parent_idx<<16 | b1<<8 | b2, probed against a fused-hash CHD
  whose stored key word is compared in full — transitions are EXACT, no
  residual false positives. Values (next index, pattern IDs) are 16-bit,
  packed 2/word. Mid-step (odd-depth) and end-step (even-depth) final
  states are separate tiny exact probes, present only at depths that have
  finals (static per-step layout). Total table footprint for a
  Snort-scale ruleset is ~2-4 MB — it fits VMEM, where the dense table
  (~40 MB) never could.

* **Survivor windows via row gathers + in-kernel alignment.** Each
  survivor's byte window is fetched with corpus-tile-width (128-byte)
  row gathers — the only fast gather shape on this chip, and the only
  row width that avoids an XLA relayout of the whole corpus — with NO
  host/XLA realignment: the kernel aligns each lane's window once with a
  32-way row select into VMEM scratch, then every step reads
  statically-indexed scratch rows and does a 4-way byte select.

* **End-of-input masking by depth, not bytes.** Gathered windows may
  carry garbage past the input's end; instead of byte sentinels, each
  lane carries maxd = n - pos and every probe's hit is masked with the
  depth it would imply (the sieve kernel's `rd` masks, generalized).

The walker reports matches of length >= 4 only; the caller merges with
the sieve kernel's exact depth-1..3 results (longest match wins, so any
walker match overrides).
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
from .pallas_sieve import (
    LANES,
    _expand_planes,
    _pack_u16,
    _pack_u8,
    _lookup,
    _probe_slot,
    _I32,
)

DEAD = 0xFFFF              # never a valid per-depth compact index
# window gather granularity = the corpus tile width (128 bytes): the u8
# (rows, 128) array feeds jnp.take directly — ANY other row width forces
# XLA to re-lay-out (and lane-pad) the whole corpus per dispatch
ROW_BYTES = 128
ROW_WORDS = ROW_BYTES // 4
GROUP = 8 * LANES          # survivors per kernel grid step

WINDOWS_U8_BITCAST = True   # prepare_windows: u8 transpose + LE bitcast
                            # beats i32 strided-select 2.34 vs 2.54 ms
                            # per 64K-survivor round (r4 capture,
                            # experiments/logs_r4/windows_profile.log,
                            # parity exact both ways)

ALIGN_TREE = False          # window alignment as a select TREE over wv's
                            # 5 bits (31 selects + 5 shared bit tests per
                            # word) vs the linear scan (31 compares + 31
                            # selects, 2 live rows). The tree holds all 32
                            # candidate rows live at once — register-
                            # pressure risk; A/B on chip
                            # (experiments/align_micro.py)

# (Removed round 5) ALIGN_SUBGATHER: the sublane (axis-0) take_along_axis
# alignment is UNIMPLEMENTABLE on this chip — Mosaic's gather lowering
# asserts indices.shape == input.shape + (1,) (no (8,128) indices into a
# tall block), and the equal-shape axis-0 form fails in the compiler with
# INVALID_ARGUMENT (r5 capture, experiments/logs_r5/axis0_gather_probe).
# Lane (axis-1) gathers remain the only dynamic gather shape.


# --------------------------------------------------------------------------
# host-side table construction
# --------------------------------------------------------------------------

@dataclasses.dataclass
class WProbe:
    """An exact probe: full-key compare + u16-packed value.

    Layout mirrors pallas_sieve._Probe but values are always packed two
    16-bit payloads per word (halves the value plane scan).
    """
    disp: np.ndarray | None    # packed displacement planes (None = nodisp)
    keyw: np.ndarray           # key-word planes (full 32-bit compare)
    valw: np.ndarray           # u16-packed value planes
    lg_b: int
    lg_r: int
    slot_mul: int
    disp_u8: bool = False
    nodisp: bool = False

    @classmethod
    def build(cls, keys: np.ndarray, vals: np.ndarray) -> "WProbe":
        keys = np.asarray(keys, dtype=np.uint32)
        vals = np.asarray(vals, dtype=np.uint32)
        assert keys.size > 0 and vals.max() < (1 << 16)
        # canonical key order: the CHD fill of EMPTY slots is keys[0]
        # (member-key trick), so table bytes depend on input order —
        # callers that iterate sets/dicts would otherwise build tables
        # that differ per PYTHONHASHSEED, breaking the multi-process
        # replicated-table contract (caught by multihost_smoke r5)
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
        built = (chd.build_exact_wide2_nodisp(keys, vals)
                 if keys.size <= 64 else None)
        t, kw = built if built is not None else chd.build_exact_wide2(keys, vals)
        valw = _expand_planes(_pack_u16(np.asarray(t.slot_words, np.uint32)
                                        & np.uint32(0xFFFF)))
        if getattr(t, "nodisp_mul", None) is not None:
            return cls(disp=None, keyw=_expand_planes(kw), valw=valw,
                       lg_b=0, lg_r=t.lg_slots, slot_mul=t.nodisp_mul,
                       nodisp=True)
        disp_u8 = bool(t.disp.max() < 256) and t.num_buckets // 2 > LANES
        pack = _pack_u8 if disp_u8 else _pack_u16
        return cls(disp=_expand_planes(pack(t.disp)),
                   keyw=_expand_planes(kw), valw=valw,
                   lg_b=int(np.log2(t.num_buckets)), lg_r=t.lg_slots,
                   slot_mul=chd.slot_multiplier(t.salt), disp_u8=disp_u8)

    @property
    def arrays(self) -> list[np.ndarray]:
        out = [] if self.disp is None else [self.disp]
        out.extend([self.keyw, self.valw])
        return out

    # ---- host oracle (bit-exact mirror of the kernel probe)
    def lookup(self, key: int) -> tuple[bool, int]:
        prod = np.uint32((int(key) * int(self.slot_mul)) & 0xFFFFFFFF)
        if self.nodisp:
            slot = int(prod >> np.uint32(32 - self.lg_r))
        else:
            bk = int(prod >> np.uint32(32 - self.lg_b)) & ((1 << self.lg_b) - 1)
            h1 = (int(prod >> np.uint32(32 - self.lg_b - self.lg_r))
                  & ((1 << self.lg_r) - 1))
            if self.disp_u8:
                w = int(np.uint32(self.disp[(bk >> 2) // LANES * 8,
                                            (bk >> 2) % LANES]))
                d = (w >> (8 * (bk & 3))) & 0xFF
            else:
                w = int(np.uint32(self.disp[(bk >> 1) // LANES * 8,
                                            (bk >> 1) % LANES]))
                d = (w >> (16 * (bk & 1))) & 0xFFFF
            slot = (h1 ^ d) & ((1 << self.lg_r) - 1)
        kw = int(np.uint32(self.keyw[slot // LANES * 8, slot % LANES]))
        if kw != int(np.uint32(key)):
            return False, 0
        vw = int(np.uint32(self.valw[(slot >> 1) // LANES * 8,
                                     (slot >> 1) % LANES]))
        return True, (vw >> (16 * (slot & 1))) & 0xFFFF


@dataclasses.dataclass
class StepTables:
    """One 2-byte walk step, depth d -> d+2."""
    depth: int                 # d (parent depth)
    main: WProbe | None        # (parent<<16|b1<<8|b2) -> next per-depth idx
    odd: WProbe | None         # (parent<<8|b1) -> pid of depth-(d+1) final
    even: WProbe | None        # (parent<<16|b1<<8|b2) -> pid of depth-(d+2) final


@dataclasses.dataclass
class WalkTables:
    entry: WProbe              # 4-byte window -> depth-4 idx
    entry_final: WProbe | None  # 4-byte window -> pid (length-4 patterns)
    steps: list[StepTables]
    max_len: int
    vmem_bytes: int

    @property
    def arrays(self) -> list[np.ndarray]:
        out = list(self.entry.arrays)
        if self.entry_final is not None:
            out.extend(self.entry_final.arrays)
        for s in self.steps:
            for p in (s.main, s.odd, s.even):
                if p is not None:
                    out.extend(p.arrays)
        return out


def build_walk_tables(automaton: Automaton) -> WalkTables | None:
    """Depth-sliced edge tables from the automaton's sorted pattern pool.

    The per-depth state set IS the set of distinct depth-d prefixes (the
    trie is a prefix tree; reference state numbering is irrelevant here —
    only pattern IDs surface). Returns None when the encoding can't
    represent the ruleset (pattern IDs or per-depth state counts >= 2^16,
    or no length>=4 patterns); callers fall back to the XLA walkers.
    """
    a = automaton
    if a.num_final_states >= DEAD:
        return None
    pats = [bytes(p) for p in a.sorted_patterns]
    pids = [int(x) for x in a.pattern_ids]
    max_len = max((len(p) for p in pats), default=0)
    if max_len < 4:
        return None

    final_of: dict[bytes, int] = {}
    for p, pid in zip(pats, pids):
        final_of[p] = pid          # duplicate pattern: later sorted ID wins

    def prefixes(d: int) -> list[bytes]:
        return sorted({p[:d] for p in pats if len(p) >= d})

    # compact per-depth indices at even depths (parents of steps)
    idx_at: dict[int, dict[bytes, int]] = {}
    for d in range(4, max_len + 1, 2):
        ps = prefixes(d)
        if len(ps) >= DEAD:
            return None
        idx_at[d] = {q: i for i, q in enumerate(ps)}

    def be32(q: bytes) -> int:
        return int.from_bytes(q, "big")

    e4 = idx_at[4]
    entry = WProbe.build(np.array([be32(q) for q in e4], np.uint32),
                         np.array(list(e4.values()), np.uint32))
    f4 = {q: final_of[q] for q in e4 if q in final_of}
    entry_final = None
    if f4:
        entry_final = WProbe.build(
            np.array([be32(q) for q in f4], np.uint32),
            np.array(list(f4.values()), np.uint32))

    steps: list[StepTables] = []
    d = 4
    while d < max_len:
        parents = idx_at[d]
        nxt = idx_at.get(d + 2, {})
        main = None
        if nxt:
            keys = [(parents[q[:d]] << 16) | (q[d] << 8) | q[d + 1]
                    for q in nxt]
            main = WProbe.build(np.array(keys, np.uint32),
                                np.array(list(nxt.values()), np.uint32))
        oddf = {q: final_of[q] for q in
                {p[:d + 1] for p in pats if len(p) == d + 1}}
        odd = None
        if oddf:
            keys = [(parents[q[:d]] << 8) | q[d] for q in oddf]
            odd = WProbe.build(np.array(keys, np.uint32),
                               np.array(list(oddf.values()), np.uint32))
        evenf = {q: final_of[q] for q in nxt if q in final_of}
        even = None
        if evenf:
            keys = [(parents[q[:d]] << 16) | (q[d] << 8) | q[d + 1]
                    for q in evenf]
            even = WProbe.build(np.array(keys, np.uint32),
                                np.array(list(evenf.values()), np.uint32))
        steps.append(StepTables(depth=d, main=main, odd=odd, even=even))
        d += 2

    t = WalkTables(entry=entry, entry_final=entry_final, steps=steps,
                   max_len=max_len, vmem_bytes=0)
    t.vmem_bytes = sum(x.size for x in t.arrays) * 4
    return t


def walk_oracle(tables: WalkTables, data: bytes, pos: int, n: int) -> int:
    """Host-side bit-exact mirror of the kernel walk for one position.
    Returns the longest length>=4 match ID starting at pos, else 0."""
    maxd = n - pos
    window = data[pos: pos + tables.max_len + 2]
    if maxd < 4 or len(window) < 4:
        return 0
    key4 = int.from_bytes(window[:4], "big")
    hit, idx = tables.entry.lookup(key4)
    match = 0
    if tables.entry_final is not None:
        fhit, pid = tables.entry_final.lookup(key4)
        if fhit and pid:
            match = pid
    state = idx if hit else DEAD
    for s in tables.steps:
        d = s.depth
        b1 = window[d] if d < len(window) else 0
        b2 = window[d + 1] if d + 1 < len(window) else 0
        if s.odd is not None and maxd >= d + 1:
            ohit, pid = s.odd.lookup((state << 8) | b1)
            if ohit and pid:
                match = pid
        if s.main is None:
            break
        mhit, nxt = s.main.lookup((state << 16) | (b1 << 8) | b2)
        mhit = mhit and maxd >= d + 2
        if s.even is not None and mhit:
            ehit, pid = s.even.lookup((state << 16) | (b1 << 8) | b2)
            if ehit and pid:
                match = pid
        state = nxt if mhit else DEAD
    return match


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _probe(p: WProbe, refs: list, key, interpret: bool = False):
    """Exact probe against plane refs [disp?, keyw, valw] -> (hit, val16).

    Empty slots hold a member key (chd.build_exact_wide2 fill), so key
    equality alone decides the hit — no valid-bit gather."""
    i = 0
    disp = None
    if not p.nodisp:
        disp = refs[i]; i += 1
    keyw, valw = refs[i], refs[i + 1]
    prod = key * _I32(p.slot_mul)
    slot = _probe_slot(p, disp, prod, interpret)
    kw = _lookup(keyw, slot, interpret)
    vw = _lookup(valw, slot >> 1, interpret)
    val = jnp.where((slot & 1) == 1, vw >> 16, vw) & 0xFFFF
    return kw == key, val


def _nrefs(p: WProbe | None) -> int:
    if p is None:
        return 0
    return 2 if p.nodisp else 3


_EXIT_BLOCK = 4            # steps per early-exit check (8 bytes of depth)


def _n_m123_refs(sieve_tables) -> int:
    """How many of the sieve's table arrays the walker consumes when it
    computes depth-1..3 matches itself (everything except the alive
    filter's arrays, incl. the bucket2 overflow table's)."""
    if sieve_tables is None:
        return 0
    n = len(sieve_tables.arrays)
    for p in (sieve_tables.alive, getattr(sieve_tables, "alive_ovf", None)):
        if p is not None:
            n -= len(p.arrays)
    return n


def _make_walk_kernel(tables: WalkTables, w_raw: int, w_out: int,
                      interpret: bool = False, sieve_tables=None):
    t = tables
    st_t = sieve_tables

    def kernel(n_ref, pos_ref, raw_ref, *refs):
        i = 0
        def take(p):
            nonlocal i
            if p is None:
                return None
            r = list(refs[i: i + _nrefs(p)])
            i += _nrefs(p)
            return r
        def take_n(k):
            nonlocal i
            r = list(refs[i: i + k])
            i += k
            return r
        m123_r = take_n(_n_m123_refs(st_t))
        entry_r = take(t.entry)
        entryf_r = take(t.entry_final)
        step_r = [(take(s.main), take(s.odd), take(s.even)) for s in t.steps]
        out_ref, win, st, mt = refs[i], refs[i + 1], refs[i + 2], refs[i + 3]

        pos = pos_ref[:]                       # (8,128) int32 positions
        n = n_ref[0, 0]
        maxd = n - pos                         # bytes available from pos
        o = pos & (ROW_BYTES - 1)
        wv = o >> 2                            # word offset within raw rows
        ob = o & 3                             # byte offset within word 0

        # lazily align window rows (win[w] = raw[wv + w], a 32-way
        # static-row select per word): each early-exit block aligns only
        # the rows it actually reaches, so vregs whose lanes all die
        # shallow never pay for the deep window
        aligned = [0]

        def ensure(w_hi):
            for w in range(aligned[0], min(w_hi, w_out)):
                if ALIGN_TREE:
                    rows = [raw_ref[(w + s) * 8:(w + s + 1) * 8, :]
                            for s in range(ROW_WORDS)]
                    bit = 1
                    while len(rows) > 1:
                        hi = (wv & bit) != 0
                        rows = [jnp.where(hi, rows[k + 1], rows[k])
                                for k in range(0, len(rows), 2)]
                        bit <<= 1
                    acc = rows[0]
                else:
                    acc = raw_ref[w * 8:(w + 1) * 8, :]
                    for s in range(1, ROW_WORDS):
                        cand = raw_ref[(w + s) * 8:(w + s + 1) * 8, :]
                        acc = jnp.where(wv == s, cand, acc)
                win[w * 8:(w + 1) * 8, :] = acc
            aligned[0] = max(aligned[0], min(w_hi, w_out))

        def byte_at(j):
            """window byte j (data[pos + j]), via 2 static scratch rows +
            4-way shift select (little-endian words)."""
            a0 = win[(j >> 2) * 8:((j >> 2) + 1) * 8, :]
            a1 = win[((j >> 2) + 1) * 8:((j >> 2) + 2) * 8, :]
            idx = ob + (j & 3)                 # in [0, 7)
            wsel = jnp.where(idx >= 4, a1, a0)
            sh = idx & 3
            r = jnp.where(sh == 1, wsel >> 8, wsel)
            r = jnp.where(sh == 2, wsel >> 16, r)
            r = jnp.where(sh == 3, wsel >> 24, r)
            return r & 0xFF

        ensure(2)
        b0, b1, b2, b3 = byte_at(0), byte_at(1), byte_at(2), byte_at(3)
        match = jnp.zeros((8, LANES), jnp.int32)
        if st_t is not None:
            # depth-1..3 matches computed HERE (same probes as the sieve
            # kernel, masked by maxd): the caller's merge then never has
            # to READ the dense result it scatters into — which would
            # force XLA to copy the 512 MB while-loop carry every round
            j = 0
            if st_t.m1_chain is not None:
                for ch, pid in st_t.m1_chain:
                    match = jnp.where((b0 == ch) & (maxd > 0), pid, match)
            elif st_t.m1 is not None and st_t.m1_packed:
                w = _lookup(m123_r[j], b0 >> 1, interpret); j += 1
                m1 = jnp.where((b0 & 1) == 1, w >> 16, w) & 0xFFFF
                match = jnp.where(maxd > 0, m1, match)
            elif st_t.m1 is not None:
                m1 = _lookup(m123_r[j], b0, interpret); j += 1
                match = jnp.where(maxd > 0, m1, match)
            if st_t.m2 is not None:
                m2 = st_t.m2
                k2 = (b1 << 8) | b0    # sieve keys are little-endian
                prod = k2 * _I32(m2.slot_mul)
                m2_disp = None
                if not m2.nodisp:
                    m2_disp = m123_r[j]; j += 1
                slot = _probe_slot(m2, m2_disp, prod, interpret)
                w = _lookup(m123_r[j], slot, interpret); j += 1
                if m2.keyw is not None:          # wide (ids > 15 bits)
                    kw = _lookup(m123_r[j], slot, interpret); j += 1
                    match = jnp.where((kw == k2) & (maxd > 1), w, match)
                else:
                    hit2 = (((w >> 16) & 0xFFFF) == k2) & (maxd > 1)
                    match = jnp.where(hit2, w & 0x7FFF, match)
            if st_t.m3 is not None:
                m3 = st_t.m3
                k3 = (b2 << 16) | (b1 << 8) | b0
                prod = k3 * _I32(m3.slot_mul)
                m3_disp = None
                if not m3.nodisp:
                    m3_disp = m123_r[j]; j += 1
                w = _lookup(m123_r[j], slot3 := _probe_slot(m3, m3_disp, prod, interpret), interpret); j += 1
                kw = _lookup(m123_r[j], slot3, interpret); j += 1
                match = jnp.where((kw == k3) & (maxd > 2), w, match)
            assert j == len(m123_r)
        key4 = (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
        ok4 = maxd > 3
        hit, idx4 = _probe(t.entry, entry_r, key4, interpret)
        st[:] = jnp.where(hit & ok4, idx4, DEAD)
        if t.entry_final is not None:
            fh, pid = _probe(t.entry_final, entryf_r, key4, interpret)
            match = jnp.where(fh & ok4, pid, match)
        mt[:] = match

        def run_block(blk):
            state, match = st[:], mt[:]
            for s, (main_r, odd_r, even_r) in blk:
                d = s.depth
                c1 = byte_at(d)
                if s.odd is not None:
                    oh, pid = _probe(s.odd, odd_r, (state << 8) | c1,
                                     interpret)
                    match = jnp.where(oh & (maxd > d), pid, match)
                if s.main is None:
                    break                      # no deeper states exist
                c2 = byte_at(d + 1)
                mkey = (state << 16) | (c1 << 8) | c2
                mh, nxt = _probe(s.main, main_r, mkey, interpret)
                mh = mh & (maxd > d + 1)
                if s.even is not None:
                    eh, pid = _probe(s.even, even_r, mkey, interpret)
                    match = jnp.where(eh & (maxd > d + 1), pid, match)
                state = jnp.where(mh, nxt, DEAD)
            st[:] = state
            mt[:] = match

        steps = list(zip(t.steps, step_r))
        for bi in range(0, len(steps), _EXIT_BLOCK):
            blk = steps[bi: bi + _EXIT_BLOCK]
            j_hi = blk[-1][0].depth + 1
            w_hi = (j_hi >> 2) + 2
            if bi == 0:
                ensure(w_hi)
                run_block(blk)
            else:
                # all-dead vregs skip the rest of the walk: aliveness is
                # monotone, so a skipped block implies every later block
                # also skips — the lazy aligns inside stay consistent
                @pl.when(jnp.any(st[:] != DEAD))
                def _(blk=blk, w_hi=w_hi):
                    ensure(w_hi)
                    run_block(blk)

        out_ref[:] = mt[:]

    return kernel


def n_walk_refs(t: WalkTables) -> int:
    """How many plane arrays t.arrays contributes (kernel ref arity)."""
    return len(t.arrays)


def emit_block_walk(t: WalkTables, refs, byte, maxd, st, mt,
                    interpret: bool = False):
    """Emit the full depth-sliced walk for one (8,128) position group,
    reading bytes through `byte(j)` (relative byte j for every lane).

    refs: t.arrays' kernel refs in t.arrays order. st/mt: (8,128) i32
    scratch refs (state / best match). On return mt holds the longest
    length>=4 match id per lane (0 if none), masked by maxd. The step
    loop early-exits per vreg every _EXIT_BLOCK steps, so shallow
    corpora pay only the entry probe. Used by the sieve kernel's
    dense-block escape (pallas_sieve: all-match regimes) — the probes
    and semantics are identical to the survivor walker above."""
    i = 0

    def take(p):
        nonlocal i
        if p is None:
            return None
        r = list(refs[i: i + _nrefs(p)])
        i += _nrefs(p)
        return r

    entry_r = take(t.entry)
    entryf_r = take(t.entry_final)
    step_r = [(take(s.main), take(s.odd), take(s.even)) for s in t.steps]
    assert i == len(t.arrays)

    b0, b1, b2, b3 = byte(0), byte(1), byte(2), byte(3)
    key4 = (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
    ok4 = maxd > 3
    hit, idx4 = _probe(t.entry, entry_r, key4, interpret)
    st[:] = jnp.where(hit & ok4, idx4, DEAD)
    match = jnp.zeros((8, LANES), jnp.int32)
    if t.entry_final is not None:
        fh, pid = _probe(t.entry_final, entryf_r, key4, interpret)
        match = jnp.where(fh & ok4, pid, match)
    mt[:] = match

    def run_block(blk):
        state, match = st[:], mt[:]
        for s, (main_r, odd_r, even_r) in blk:
            d = s.depth
            c1 = byte(d)
            if s.odd is not None:
                oh, pid = _probe(s.odd, odd_r, (state << 8) | c1, interpret)
                match = jnp.where(oh & (maxd > d), pid, match)
            if s.main is None:
                break
            c2 = byte(d + 1)
            mkey = (state << 16) | (c1 << 8) | c2
            mh, nxt = _probe(s.main, main_r, mkey, interpret)
            mh = mh & (maxd > d + 1)
            if s.even is not None:
                eh, pid = _probe(s.even, even_r, mkey, interpret)
                match = jnp.where(eh & (maxd > d + 1), pid, match)
            state = jnp.where(mh, nxt, DEAD)
        st[:] = state
        mt[:] = match

    steps = list(zip(t.steps, step_r))
    for bi in range(0, len(steps), _EXIT_BLOCK):
        blk = steps[bi: bi + _EXIT_BLOCK]
        if bi == 0:
            run_block(blk)
        else:
            @pl.when(jnp.any(st[:] != DEAD))
            def _(blk=blk):
                run_block(blk)


def window_geometry(max_len: int) -> tuple[int, int]:
    """(w_out aligned words, w_raw gathered words) for a ruleset."""
    j_max = max_len                       # deepest byte index read
    w_out = (j_max >> 2) + 2
    w_raw = -(-(w_out + ROW_WORDS - 1) // ROW_WORDS) * ROW_WORDS
    return w_out, w_raw


def prepare_windows(data2d_u8, pos: jax.Array, w_raw: int):
    """Row-gather each survivor's raw byte window, transposed for the
    kernel: (cap,) positions -> (G*w_raw*8, 128) int32 words where word w
    of survivor g*1024 + s*128 + l sits at row (g*w_raw + w)*8 + s.

    Rows are gathered as uint8 and wordified AFTER the gather, so every
    intermediate is survivor-proportional (a corpus-wide u8->u32 bitcast
    pads 32x on TPU — 16 GB of HBM for a 128 MB corpus). Out-of-range
    rows clamp — the resulting garbage bytes are masked by depth
    in-kernel.

    data2d_u8 may be a (main, tail) tuple (the sharded no-concat layout):
    rows past main's end come from the small tail block instead — a dual
    gather + row select, paid only on the sharded path."""
    cap = pos.shape[0]
    g = cap // GROUP
    if isinstance(data2d_u8, tuple):
        main, tailb = data2d_u8
        nm, nt = main.shape[0], tailb.shape[0]
        r0 = jnp.clip(pos >> 7, 0, nm + nt - 1)
        parts = []
        for i in range(w_raw // ROW_WORDS):
            r = jnp.minimum(r0 + i, nm + nt - 1)
            pm = jnp.take(main, jnp.minimum(r, nm - 1), axis=0)
            pt = jnp.take(tailb, jnp.clip(r - nm, 0, nt - 1), axis=0)
            parts.append(jnp.where((r < nm)[:, None], pm, pt))
    else:
        rows2d = data2d_u8                                   # (nr, 128) u8
        nr = rows2d.shape[0]
        r0 = jnp.clip(pos >> 7, 0, nr - 1)
        parts = [
            jnp.take(rows2d, jnp.minimum(r0 + i, nr - 1), axis=0)
            for i in range(w_raw // ROW_WORDS)
        ]
    if WINDOWS_U8_BITCAST:
        # stay u8 through the transpose (4x less data moved than the
        # i32 strided-select form), then one pure little-endian bitcast
        # (..., 4) u8 -> i32. Survivor-proportional, so the corpus-wide
        # bitcast padding trap (DESIGN_NOTES) does not apply.
        b = jnp.concatenate(parts, axis=1)                   # (cap, 4*w_raw)
        t = (b.reshape(g, 8, LANES, w_raw, 4)
             .transpose(0, 3, 1, 2, 4))
        raw = jax.lax.bitcast_convert_type(t, jnp.int32)
        return raw.reshape(g * w_raw * 8, LANES)
    b = jnp.concatenate(parts, axis=1).astype(jnp.int32)     # (cap, 4*w_raw)
    raw = (b[:, 0::4] | (b[:, 1::4] << 8)
           | (b[:, 2::4] << 16) | (b[:, 3::4] << 24))        # LE words
    return (raw.reshape(g, 8, LANES, w_raw)
            .transpose(0, 3, 1, 2)
            .reshape(g * w_raw * 8, LANES))


def _make_align_kernel(w_out: int):
    """Word-align gathered windows: out[w] = raw[(pos%128)//4 + w] per
    lane (a 32-way static-row select). The byte-in-word offset (pos%4)
    stays with the caller — XLA extracts bytes with per-lane variable
    shifts, which the VPU does natively."""
    def kernel(pos_ref, raw_ref, out_ref):
        pos = pos_ref[:]
        wv = (pos & (ROW_BYTES - 1)) >> 2
        for w in range(w_out):
            acc = raw_ref[w * 8:(w + 1) * 8, :]
            for s in range(1, ROW_WORDS):
                acc = jnp.where(wv == s,
                                raw_ref[(w + s) * 8:(w + s + 1) * 8, :], acc)
            out_ref[w * 8:(w + 1) * 8, :] = acc
    return kernel


def build_align(*, cap: int, w_out: int, interpret: bool = False):
    """run(data2d_u8, pos) -> aligned int32 (cap//1024 * w_out * 8, 128).

    Word w of survivor g*1024+s*128+l sits at row (g*w_out + w)*8 + s;
    byte j of a survivor's window = (word[(ob+j)>>2] >> 8*((ob+j)&3))
    & 0xFF with ob = pos & 3 (LE words). Used by the CSR row-gather
    walker (backends.xla_csr), which needs whole word columns in XLA."""
    assert cap % GROUP == 0
    g = cap // GROUP
    w_raw = -(-(w_out + ROW_WORDS - 1) // ROW_WORDS) * ROW_WORDS
    kernel = _make_align_kernel(w_out)
    in_specs = [
        pl.BlockSpec((8, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w_raw * 8, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]

    def run(data2d_u8, pos):
        raw = prepare_windows(data2d_u8, pos, w_raw)
        pos2d = pos.reshape(g * 8, LANES)
        return pl.pallas_call(
            kernel,
            grid=(g,),
            out_shape=jax.ShapeDtypeStruct((g * w_out * 8, LANES), jnp.int32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((w_out * 8, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(pos2d, raw)

    return run


def build_walker(tables: WalkTables, *, cap: int, interpret: bool = False,
                 sieve_tables=None):
    """run(walk_args, data2d_u8, pos, n_arr) -> match int32[cap].

    pos entries >= n (compaction padding) report 0. cap must be a
    multiple of GROUP (1024). With sieve_tables given, walk_args must be
    the sieve's m1/m2/m3 arrays followed by tables.arrays, and the output
    covers ALL depths (the walker computes depth-1..3 itself)."""
    assert cap % GROUP == 0
    g = cap // GROUP
    w_out, w_raw = window_geometry(tables.max_len)
    kernel = _make_walk_kernel(tables, w_raw, w_out, interpret, sieve_tables)
    n123 = _n_m123_refs(sieve_tables)
    m123_arrays = (sieve_tables.arrays[:n123] if sieve_tables is not None
                   else [])
    tab_specs = [
        pl.BlockSpec((a.shape[0], LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for a in m123_arrays + tables.arrays
    ]
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w_raw * 8, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + tab_specs

    def run(walk_args, data2d_u8, pos, n_arr):
        raw = prepare_windows(data2d_u8, pos, w_raw)
        pos2d = pos.reshape(g * 8, LANES)
        out = pl.pallas_call(
            kernel,
            grid=(g,),
            out_shape=jax.ShapeDtypeStruct((g * 8, LANES), jnp.int32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((w_out * 8, LANES), jnp.int32),
                            pltpu.VMEM((8, LANES), jnp.int32),   # state
                            pltpu.VMEM((8, LANES), jnp.int32)],  # match
            interpret=interpret,
        )(n_arr.reshape(1, 1), pos2d, raw, *walk_args)
        return out.reshape(-1)

    return run
