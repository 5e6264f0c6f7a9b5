"""CSR row-gather walker: the deep-walk tier for rulesets beyond the
VMEM walk engine's encoding (pattern IDs or per-depth state counts >=
2^16, or walk tables past the VMEM budget — e.g. 100K-pattern
ClamAV-scale sets).

TPU-native rethink of the reference's space-driven kernel serving tables
up to 2^27 entries from texture/global memory (reference:
PFAC/src/PFAC_kernel_spaceDriven.cu:465-558, PFAC/src/PFAC.cpp:69). The
two fast random-access shapes on this chip are the VPU's VMEM lane
gather (bounded by table size: every probe scans all planes) and the XLA
row gather (~5 ns/row from HBM, any table size). Big tables therefore
live in HBM as per-depth CSR rows probed by row gathers:

* **Depth-sliced 4-byte-stepping CSR.** States at depth d (multiple of
  4) get compact int32 indices (row 0 reserved = empty). A step probes
  ONE row gather: rows[state] holds up to W entry triples
  (key, meta, pid) where meta packs the key length (1-4 bytes) and the
  next-state index; finals at depths d+1..d+4 and the d+4 transition are
  entries of the same row. Hot states overflow into continuation rows
  (klen=0 sentinel), followed by extra chained gathers only at depths
  where the host build actually produced chains.

* **Hash-bucketed entry.** The depth-0..4 step is a bucketed hash table
  over the distinct 4-byte prefixes: bucket = top bits of key4*MUL, one
  row gather + at most max-occupancy compares (host-sized, exact).

* **Survivor windows via row gathers + a Pallas word-align kernel.**
  Bytes come from 128-byte-row gathers (backends.pallas_walk.
  prepare_windows), word-aligned once per stage by a tiny Pallas kernel;
  per-step byte extraction is then static column slices + per-lane
  variable shifts — no per-position gathers.

* **Capacity-staged pruning.** Same depth stages as the legacy heavy
  walker (16 / 48 / 112 / max_len with 3/4, 1/4, 1/16 capacity
  headroom) via rank-select compaction; stage-capacity overflow sets the
  pipeline's deferred overflow flag (checked by flush_checks /
  PFAC_synchronize) and routes the caller to the lockstep XLA walker.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.automaton import Automaton

ENTRY_MUL = 0x9E3779B1          # bucket hash multiplier (odd, high-entropy)
W_ENTRIES = 8                   # entry triples per CSR row before chaining
_NEXT_MASK = 0x0FFFFFFF
_KLEN_EMPTY = 0xF


def _i32(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, np.uint32).view(np.int32) if np.asarray(x).dtype != np.int32 else np.asarray(x)


@dataclasses.dataclass
class CsrStep:
    depth: int                  # parent depth d; covers finals d+1..d+4
    rows: np.ndarray            # int32 (num_rows, 3*W): triples (key, meta, pid)
    chain: int                  # max continuation-chain length (extra gathers)


FK_W = 4                        # keys per filter row (keys-only table)


@dataclasses.dataclass
class CsrTables:
    entry_rows: np.ndarray      # int32 (B, 3*E): triples (key4, 1<<28|idx, pid)
    entry_lgb: int
    entry_width: int            # E
    steps: list[CsrStep]
    max_len: int
    hbm_bytes: int
    # keys-only filter rows (round 5): the big-tier pipeline's alive
    # filter is ONE XLA row gather against this low-load table (FK_W
    # exact key compares per position) instead of a several-hundred-
    # plane in-kernel VMEM scan (~70+ ms/64 MB at 100K keys). Buckets
    # holding more than FK_W keys (vanishingly rare at load 1/4) are
    # recorded in fkeys_ovf and treated as always-hit (a false positive
    # dies in the exact walker).
    fkeys: np.ndarray | None = None     # int32 (BF, FK_W)
    fkeys_lgb: int = 0
    fkeys_ovf: tuple = ()

    @property
    def arrays(self) -> list[np.ndarray]:
        out = [self.entry_rows] + [s.rows for s in self.steps]
        if self.fkeys is not None:
            out.append(self.fkeys)
        return out


def build_csr_tables(automaton: Automaton) -> CsrTables | None:
    """Build per-depth CSR tables from the sorted pattern pool.

    Returns None when there are no length>=4 patterns (no deep tail)."""
    a = automaton
    pats = [bytes(p) for p in a.sorted_patterns]
    pids = [int(x) for x in a.pattern_ids]
    max_len = max((len(p) for p in pats), default=0)
    if max_len < 4:
        return None
    final_of: dict[bytes, int] = {}
    for p, pid in zip(pats, pids):
        final_of[p] = pid            # duplicate pattern: later sorted ID wins

    long_pats = [p for p in pats if len(p) >= 4]

    def prefixes(d: int) -> list[bytes]:
        return sorted({p[:d] for p in long_pats if len(p) >= d})

    # compact indices at depths 4, 8, 12, ... (1-based; row 0 = empty)
    idx_at: dict[int, dict[bytes, int]] = {}
    d = 4
    while True:
        ps = prefixes(d)
        if not ps:
            break
        idx_at[d] = {q: i + 1 for i, q in enumerate(ps)}
        d += 4

    # ---- entry: bucketed hash over depth-4 prefixes
    e4 = idx_at[4]
    n4 = len(e4)
    lgb = max(3, int(np.ceil(np.log2(n4 * 2))))
    b = 1 << lgb
    buckets: list[list[tuple[int, int, int]]] = [[] for _ in range(b)]
    for q, idx in e4.items():
        key4 = int.from_bytes(q, "big")
        pid = final_of.get(q, 0)
        bk = ((key4 * ENTRY_MUL) & 0xFFFFFFFF) >> (32 - lgb)
        buckets[bk].append((key4, (1 << 28) | idx, pid))
    e_width = max(1, max(len(x) for x in buckets))
    entry = np.zeros((b, 3 * e_width), np.int64)
    for bk, items in enumerate(buckets):
        for j, (k, m, pid) in enumerate(items):
            entry[bk, 3 * j:3 * j + 3] = [np.int64(np.int32(np.uint32(k))),
                                          m, pid]
    entry_rows = entry.astype(np.int32)

    # ---- steps
    steps: list[CsrStep] = []
    d = 4
    while d in idx_at:
        parents = idx_at[d]
        nxt = idx_at.get(d + 4, {})
        # collect entries per parent
        per: dict[int, list[tuple[int, int, int]]] = {}
        # finals at depths d+1..d+4
        for k in range(1, 5):
            # sorted: set iteration order follows PYTHONHASHSEED, and row
            # entry order must be byte-identical across processes for the
            # replicated-table contract (multihost_smoke r5)
            for q in sorted({p[:d + k] for p in long_pats if len(p) == d + k}):
                pid = final_of.get(q)
                if not pid:
                    continue
                s = parents.get(q[:d])
                if s is None:
                    continue
                key = int.from_bytes(q[d:d + k], "big")
                per.setdefault(s, []).append((key, k << 28, pid))
        # transitions to depth d+4 (merge with the k=4 final when present)
        for q, nidx in nxt.items():
            s = parents[q[:d]]
            key = int.from_bytes(q[d:d + 4], "big")
            lst = per.setdefault(s, [])
            for j, (ek, em, ep) in enumerate(lst):
                if (em >> 28) == 4 and ek == key:
                    lst[j] = (ek, (4 << 28) | nidx, ep)
                    break
            else:
                lst.append((key, (4 << 28) | nidx, 0))

        # rows with continuation chaining for hot states
        num_parents = len(parents)
        empty_row = np.zeros(3 * W_ENTRIES, np.int64)
        empty_row[1::3] = _KLEN_EMPTY << 28
        rows_fixed = [empty_row.copy() for _ in range(num_parents + 1)]
        overflow_rows: list[np.ndarray] = []
        chain_max = 0
        for s in range(1, num_parents + 1):
            entries = per.get(s, [])
            chain = 0
            target = rows_fixed[s]
            while len(entries) > W_ENTRIES:
                # fill W-1 entries + a continuation pointer (klen=0)
                head, entries = entries[:W_ENTRIES - 1], entries[W_ENTRIES - 1:]
                for j, (k, m, pid) in enumerate(head):
                    target[3 * j:3 * j + 3] = [np.int64(np.int32(np.uint32(k))), m, pid]
                cont_idx = num_parents + 1 + len(overflow_rows)
                target[3 * (W_ENTRIES - 1):3 * W_ENTRIES] = [0, cont_idx, 0]
                nrow = empty_row.copy()
                overflow_rows.append(nrow)
                target = nrow
                chain += 1
            for j, (k, m, pid) in enumerate(entries):
                target[3 * j:3 * j + 3] = [np.int64(np.int32(np.uint32(k))), m, pid]
            chain_max = max(chain_max, chain)
        all_rows = np.stack(rows_fixed + overflow_rows) if overflow_rows \
            else np.stack(rows_fixed)
        steps.append(CsrStep(depth=d, rows=all_rows.astype(np.int32),
                             chain=chain_max))
        d += 4

    # ---- keys-only filter table (see CsrTables.fkeys)
    f_lgb = max(3, int(np.ceil(np.log2(max(1, n4) * 4))))
    bf = 1 << f_lgb
    keys4 = sorted(int.from_bytes(q, "big") for q in e4)
    fill = np.uint32(keys4[0])       # member-key fill: empty slots can
    fkeys = np.full((bf, FK_W), fill, np.uint32)    # only FP on a real prefix
    occ = np.zeros(bf, np.int32)
    ovf: list[int] = []
    for k in keys4:
        bk = ((k * ENTRY_MUL) & 0xFFFFFFFF) >> (32 - f_lgb)
        if occ[bk] < FK_W:
            fkeys[bk, occ[bk]] = np.uint32(k)
            occ[bk] += 1
        elif bk not in ovf:
            ovf.append(bk)           # always-hit bucket (rare; FP only)

    t = CsrTables(entry_rows=entry_rows, entry_lgb=lgb, entry_width=e_width,
                  steps=steps, max_len=max_len, hbm_bytes=0,
                  fkeys=fkeys.view(np.int32), fkeys_lgb=f_lgb,
                  fkeys_ovf=tuple(ovf))
    t.hbm_bytes = sum(x.size for x in t.arrays) * 4
    return t


# --------------------------------------------------------------------------
# host oracle (mirrors the device probe bit-for-bit; tests + debugging)
# --------------------------------------------------------------------------

def csr_oracle_walk(t: CsrTables, data: bytes, pos: int, n: int) -> int:
    """Longest length>=4 match ID starting at pos, else 0."""
    maxd = n - pos
    if maxd < 4:
        return 0
    key4 = int.from_bytes(data[pos:pos + 4], "big")
    bk = ((key4 * ENTRY_MUL) & 0xFFFFFFFF) >> (32 - t.entry_lgb)
    row = t.entry_rows[bk]
    state, match = 0, 0
    for j in range(t.entry_width):
        k, m, pid = (int(np.uint32(row[3 * j])), int(row[3 * j + 1]),
                     int(row[3 * j + 2]))
        if (m >> 28) == 1 and k == int(np.uint32(key4)):
            state = m & _NEXT_MASK
            if pid:
                match = pid
            break
    for s in t.steps:
        if state == 0:
            break
        d = s.depth
        window = data[pos + d: pos + d + 4]
        best_k, best_pid, nxt = 0, 0, 0
        cur = state
        for _ in range(s.chain + 1):
            if cur == 0 or cur >= s.rows.shape[0]:
                break
            row = s.rows[cur]
            cont = 0
            for j in range(W_ENTRIES):
                k = int(np.uint32(row[3 * j]))
                m = int(row[3 * j + 1])
                pid = int(row[3 * j + 2])
                klen = (m >> 28) & 0xF
                if klen == 0 and (m & _NEXT_MASK):
                    cont = m & _NEXT_MASK
                    continue
                if klen < 1 or klen > 4 or maxd < d + klen or len(window) < klen:
                    continue
                kv = int.from_bytes(window[:klen], "big")
                if kv != k:
                    continue
                if pid and klen >= best_k:
                    best_k, best_pid = klen, pid
                if klen == 4 and (m & _NEXT_MASK):
                    nxt = m & _NEXT_MASK
            cur = cont
        if best_pid:
            match = best_pid
        state = nxt
    return match


# --------------------------------------------------------------------------
# big-tier alive filter: one XLA row gather over the keys-only table
# --------------------------------------------------------------------------

def entry_filter_bits(t: CsrTables, fkeys_dev, flat_u8_ext, npad: int,
                      n_scalar):
    """Per-position 4-byte-prefix membership, packed as the sieve
    kernel's (npad//1024, 128) bitmap layout (bit s of lane j = position
    group*1024 + s*128 + j).

    The big tier (alive-key count past pallas_sieve._ALIVE_CHD_MAX) has
    no in-kernel alive filter — a 100K-key resid8 scan costs ~320 VMEM
    planes per probe. Here each position's big-endian key4 row-gathers
    FK_W candidate keys (~40 G elem/s on this chip) and compares exactly;
    empty slots hold a member key and overflow buckets always hit, so
    false positives exist (they die in the exact CSR walker) but false
    negatives cannot. flat_u8_ext must expose at least npad+3 bytes."""
    ext = flat_u8_ext.astype(jnp.int32)
    c0 = jax.lax.slice(ext, (0,), (npad,))
    c1 = jax.lax.slice(ext, (1,), (npad + 1,))
    c2 = jax.lax.slice(ext, (2,), (npad + 2,))
    c3 = jax.lax.slice(ext, (3,), (npad + 3,))
    k4 = (c0 << 24) | (c1 << 16) | (c2 << 8) | c3
    prod = k4 * jnp.int32(np.int32(np.uint32(ENTRY_MUL)))
    bk = jax.lax.shift_right_logical(prod, 32 - t.fkeys_lgb)
    rows = jnp.take(fkeys_dev, bk, axis=0)           # (npad, FK_W) rows
    hit = rows[:, 0] == k4
    for j in range(1, rows.shape[1]):
        hit = hit | (rows[:, j] == k4)
    for ob in t.fkeys_ovf:
        hit = hit | (bk == ob)
    pos_ok = jnp.arange(npad, dtype=jnp.int32) <= (n_scalar - 4)
    h3 = (hit & pos_ok).astype(jnp.int32).reshape(-1, 8, 128)
    bits = h3[:, 0, :]
    for s in range(1, 8):
        bits = bits | (h3[:, s, :] << s)
    return bits


# --------------------------------------------------------------------------
# device walk
# --------------------------------------------------------------------------

def _byte_reader(aligned, ob, g, w_out):
    """aligned: (g*w_out*8, 128) word-aligned windows (pallas_walk.
    build_align layout); ob = pos & 3. byte(j) -> (cap,) int32."""
    a4 = aligned.reshape(g, w_out, 8, 128)

    def byte(j):
        idx = ob + (j & 3)                      # in [0, 7)
        wA = a4[:, (j >> 2)].reshape(-1)
        wB = a4[:, (j >> 2) + 1].reshape(-1)
        wsel = jnp.where(idx >= 4, wB, wA)
        return (wsel >> ((idx & 3) * 8)) & 0xFF

    return byte


def _entry_probe(entry_rows, lgb, e_width, key4, maxd):
    prod = key4 * jnp.int32(np.int32(np.uint32(ENTRY_MUL)))
    bk = jax.lax.shift_right_logical(prod, 32 - lgb)
    row = jnp.take(entry_rows, bk, axis=0)       # (cap, 3E) row gather
    state = jnp.zeros_like(key4)
    match = jnp.zeros_like(key4)
    for j in range(e_width):
        k, m, pid = row[:, 3 * j], row[:, 3 * j + 1], row[:, 3 * j + 2]
        hit = (k == key4) & ((m >> 28) == 1) & (maxd >= 4)
        state = jnp.where(hit, m & _NEXT_MASK, state)
        match = jnp.where(hit & (pid > 0), pid, match)
    return state, match


def _probe_step(rows_dev, state, k1, k2, k3, k4, maxd, d, chain, match):
    """One CSR step for a lane vector: row gather + in-row compares.

    Returns (next_state, match'). All shapes (cap,)."""
    w3 = rows_dev.shape[1]
    nxt = jnp.zeros_like(state)
    best_k = jnp.zeros_like(state)
    best_pid = jnp.zeros_like(state)
    cur = state
    for _ in range(chain + 1):
        row = jnp.take(rows_dev, jnp.clip(cur, 0, rows_dev.shape[0] - 1),
                       axis=0)                       # (cap, 3W) row gather
        row = jnp.where((cur > 0)[:, None], row, 0)
        cont = jnp.zeros_like(state)
        for j in range(w3 // 3):
            key, meta, pid = row[:, 3 * j], row[:, 3 * j + 1], row[:, 3 * j + 2]
            klen = (meta >> 28) & 0xF
            nxt_j = meta & _NEXT_MASK
            kcmp = jnp.where(klen == 1, k1,
                             jnp.where(klen == 2, k2,
                                       jnp.where(klen == 3, k3, k4)))
            hit = (key == kcmp) & (klen >= 1) & (klen <= 4) \
                & (maxd >= d + klen)
            fin = hit & (pid > 0)
            upd = fin & (klen >= best_k)
            best_k = jnp.where(upd, klen, best_k)
            best_pid = jnp.where(upd, pid, best_pid)
            nxt = jnp.where(hit & (klen == 4) & (nxt_j > 0), nxt_j, nxt)
            cont = jnp.where((klen == 0) & (nxt_j > 0), nxt_j, cont)
        cur = cont
    match = jnp.where(best_pid > 0, best_pid, match)
    return nxt, match


# --------------------------------------------------------------------------
# staged walker
# --------------------------------------------------------------------------

def _stage_wout(n_bytes: int) -> int:
    """Aligned-window words needed to read relative bytes [0, n_bytes)."""
    return ((n_bytes - 1) >> 2) + 2


def build_csr_walker(t: CsrTables, *, cap: int, interpret: bool = False):
    """run(csr_args, data2d_u8, pos, n_arr) -> (match int32[cap], overflow).

    csr_args = [entry_rows, step0.rows, step1.rows, ...] on device.
    pos padding entries must be >= n (they walk nothing). Capacity-staged
    like the legacy heavy walker; overflow != 0 means a stage capacity
    was exceeded and the result is incomplete (callers route to the
    lockstep fallback)."""
    from .pallas_sieve import (_HEAVY_D1, _HEAVY_D2, _HEAVY_D3,
                               _HEAVY_B_FRAC, _HEAVY_C_FRAC, _HEAVY_E_FRAC,
                               _rank_select_gather)
    from .pallas_walk import GROUP, build_align

    assert cap % GROUP == 0
    rnd = lambda x: max(GROUP, -(-x // GROUP) * GROUP)
    shrink = cap > GROUP        # tiny caps (tests) skip capacity shrinking
    capB = rnd(cap * 3 // _HEAVY_B_FRAC) if shrink else cap
    capC = rnd(cap // _HEAVY_C_FRAC) if shrink else cap
    capE = rnd(cap // _HEAVY_E_FRAC) if shrink else cap

    d1 = min(t.max_len, _HEAVY_D1)
    d2 = min(t.max_len, _HEAVY_D2)
    d3 = min(t.max_len, _HEAVY_D3)
    stA = [s for s in t.steps if s.depth < _HEAVY_D1]
    stB = [s for s in t.steps if _HEAVY_D1 <= s.depth < _HEAVY_D2]
    stC = [s for s in t.steps if _HEAVY_D2 <= s.depth < _HEAVY_D3]
    stE = [s for s in t.steps if s.depth >= _HEAVY_D3]

    # +4 lookahead: stage A's deepest step (depth d <= d1-2) reads byte
    # d+3 for its klen-4 entries; without the extra word that read's
    # static word index can land past the window when max_len % 4 == 0
    # (JAX clamps it silently — garbage k4 bytes, ADVICE r3)
    wA = _stage_wout(min(t.max_len, d1) + 4)
    assert all(((s.depth + 3) >> 2) + 1 <= wA - 1 for s in stA), \
        "stage-A window must cover every step's d+3 byte read"
    alignA = build_align(cap=cap, w_out=wA, interpret=interpret)
    alignB = alignC = alignE = None
    if stB:
        wB = _stage_wout(min(t.max_len, d2) - d1 + 4)
        alignB = build_align(cap=capB, w_out=wB, interpret=interpret)
    if stC:
        wC = _stage_wout(min(t.max_len, d3) - d2 + 4)
        alignC = build_align(cap=capC, w_out=wC, interpret=interpret)
    if stE:
        wE = _stage_wout(t.max_len - d3 + 4)
        alignE = build_align(cap=capE, w_out=wE, interpret=interpret)

    step_index = {s.depth: i for i, s in enumerate(t.steps)}

    def run(csr_args, data2d_u8, pos, n_arr):
        entry_rows = csr_args[0]
        step_rows = list(csr_args[1:1 + len(t.steps)])   # fkeys rides last
        n = n_arr[0]

        def walk(steps_sub, rows_by_step, state, match, byte, maxd,
                 base_d, guarded):
            for s in steps_sub:
                rows_dev = rows_by_step[step_index[s.depth]]
                d = s.depth

                def do(sm, s=s, rows_dev=rows_dev, d=d):
                    st, m = sm
                    b1 = byte(d - base_d)
                    b2 = byte(d - base_d + 1)
                    b3 = byte(d - base_d + 2)
                    b4 = byte(d - base_d + 3)
                    k2 = (b1 << 8) | b2
                    k3 = (k2 << 8) | b3
                    k4 = (k3 << 8) | b4
                    return _probe_step(rows_dev, st, b1, k2, k3, k4, maxd,
                                       d, s.chain, m)

                if guarded:
                    state, match = jax.lax.cond(
                        jnp.any(state > 0), do, lambda sm: sm, (state, match))
                else:
                    state, match = do((state, match))
            return state, match

        def prune(state, pos_v, cap_in, cap_out):
            # row-gather rank select + companion extraction: the old
            # binary search + elementwise takes cost ~3.5 ms per prune
            # (the dominant CSR-round cost, logs_r5/csr_profile.log)
            idx, cnt, posx, stx = _rank_select_gather(
                state > 0, cap_out, pos_v, state)
            ovf = (cnt > cap_out).astype(jnp.int32)
            val = idx < cap_in
            posx = jnp.where(val, posx, n)
            stx = jnp.where(val, stx, 0)
            return idx, posx, stx, ovf

        # ---- stage A: entry + steps to depth d1, full cap
        maxd = n - pos
        alignedA = alignA(data2d_u8, pos)
        byteA = _byte_reader(alignedA, pos & 3, cap // GROUP, wA)
        b0, b1, b2, b3 = byteA(0), byteA(1), byteA(2), byteA(3)
        key4 = (((((b0 << 8) | b1) << 8) | b2) << 8) | b3
        state, match = _entry_probe(entry_rows, t.entry_lgb, t.entry_width,
                                    key4, maxd)
        state, match = walk(stA, step_rows, state, match, byteA, maxd, 0,
                            False)
        overflow = jnp.int32(0)
        if stB:
            idxB, posB, stB_v, ovf = prune(state, pos, cap, capB)
            overflow |= ovf
            alignedB = alignB(data2d_u8, posB + d1)
            byteB = _byte_reader(alignedB, (posB + d1) & 3, capB // GROUP, wB)
            maxdB = n - posB
            mB = jnp.zeros(capB, jnp.int32)
            stB_v, mB = walk(stB, step_rows, stB_v, mB, byteB, maxdB, d1,
                             False)
            if stC:
                idxC, posC, stC_v, ovf = prune(stB_v, posB, capB, capC)
                overflow |= ovf
                alignedC = alignC(data2d_u8, posC + d2)
                byteC = _byte_reader(alignedC, (posC + d2) & 3,
                                     capC // GROUP, wC)
                maxdC = n - posC
                mC = jnp.zeros(capC, jnp.int32)
                stC_v, mC = walk(stC, step_rows, stC_v, mC, byteC, maxdC,
                                 d2, True)
                if stE:
                    idxE, posE, stE_v, ovf = prune(stC_v, posC, capC, capE)
                    overflow |= ovf
                    alignedE = alignE(data2d_u8, posE + d3)
                    byteE = _byte_reader(alignedE, (posE + d3) & 3,
                                         capE // GROUP, wE)
                    maxdE = n - posE
                    mE = jnp.zeros(capE, jnp.int32)
                    _, mE = walk(stE, step_rows, stE_v, mE, byteE, maxdE,
                                 d3, True)
                    mC = mC.at[jnp.where(mE > 0, idxE, capC)].set(
                        mE, mode="drop")
                mB = mB.at[jnp.where(mC > 0, idxC, capB)].set(
                    mC, mode="drop")
            match = match.at[jnp.where(mB > 0, idxB, cap)].set(
                mB, mode="drop")
        return match, overflow

    return run
