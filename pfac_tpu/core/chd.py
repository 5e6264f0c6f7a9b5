"""CHD (compress-hash-displace) perfect-hash tables for the Pallas kernels.

Kernel-side tables are probed with the VPU's dynamic lane gather over
8x128 "planes"; probe cost is dominated by the NUMBER OF GATHERS, so
tables must be as small and as packed as possible. Three generations of
builders live here:

* classic split-hash CHD (`build_exact`/`build_resid`) — used by the
  gen-1 ladder kernel: slot = (h1(k) XOR disp[h0(k)]) mod R with
  independent multiplicative hashes.
* fused-hash CHD (`build_exact2`/`build_exact_wide2`/`build_resid2`) —
  the sieve kernel's tables: bucket, slot AND the 16-bit residual all
  derive from ONE key*mul product (one multiply per probe), and empty
  exact slots hold a member key so key equality alone decides hits.
* displacement-FREE perfect hashes (`build_*_nodisp`) — for small key
  sets a vectorized multiplier search finds slot = top bits of key*mul
  collision-free, removing the displacement gather entirely.

All hash arithmetic is in wrapping 32-bit integers with shift-and-mask
so the kernel can reproduce it with signed-int32 VPU ops. The Python
lookup_* functions are the bit-exact oracles for the kernel probes.
"""
from __future__ import annotations

import dataclasses

import numpy as np

# multiplicative mix constants (odd, high-entropy)
MIX_BUCKET = np.uint32(0x9E3779B1)
MIX_SLOT = np.uint32(0x85EBCA6B)
MIX_RESID = np.uint32(0xC2B2AE35)


def _pow2(x: int) -> int:
    return 1 << max(3, int(np.ceil(np.log2(max(1, x)))))


def _h_bucket(keys: np.ndarray, b: int) -> np.ndarray:
    lg = int(np.log2(b))
    return ((keys.astype(np.uint32) * MIX_BUCKET) >> np.uint32(32 - lg)).astype(np.int64) & (b - 1)


def slot_multiplier(salt: int) -> int:
    """Salted odd multiplier for the slot hash (salt baked into the kernel)."""
    return ((int(MIX_SLOT) + 2 * salt * 0x27D4EB2F) | 1) & 0xFFFFFFFF


def _h_slot(keys: np.ndarray, r: int, salt: int = 0) -> np.ndarray:
    lg = int(np.log2(r))
    m = np.uint32(slot_multiplier(salt))
    return ((keys.astype(np.uint32) * m) >> np.uint32(32 - lg)).astype(np.int64) & (r - 1)


def h_resid(keys: np.ndarray, bits: int = 8) -> np.ndarray:
    return ((keys.astype(np.uint32) * MIX_RESID) >> np.uint32(32 - bits)).astype(np.int64) & ((1 << bits) - 1)


@dataclasses.dataclass
class ChdTable:
    """A built CHD table. slots[] meaning depends on the flavor."""

    disp: np.ndarray        # uint16 [B] displacement per bucket
    slot_words: np.ndarray  # int32 [R_words] packed payload
    num_buckets: int
    num_slots: int
    kind: str               # "exact" | "resid"
    salt: int = 0
    lg_slots: int = 0

    def __post_init__(self):
        self.lg_slots = int(np.log2(self.num_slots))


def _h_fused(keys: np.ndarray, b: int, r: int, salt: int):
    """Fused hashing: bucket, h1 AND the 16-bit residual all come from ONE
    product key*mul — the kernel then needs a single multiply per probe
    (bucket = top lg_b bits, h1 = next lg_r bits, residual = low 16)."""
    lg_b, lg_r = int(np.log2(b)), int(np.log2(r))
    assert lg_b + lg_r <= 32
    prod = keys.astype(np.uint32) * np.uint32(slot_multiplier(salt))
    bucket = (prod >> np.uint32(32 - lg_b)).astype(np.int64) & (b - 1)
    h1 = (prod >> np.uint32(32 - lg_b - lg_r)).astype(np.int64) & (r - 1)
    resid = (prod & np.uint32(0xFFFF)).astype(np.int64)
    return bucket, h1, resid


def _assign_slots(keys: np.ndarray, r: int, b: int, salt: int,
                  fused: bool = False) -> tuple[np.ndarray, np.ndarray] | None:
    """CHD displacement search. Returns (disp[B], slot_of_key[n]) or None.

    The native C++ implementation (native/pfac_host.cpp::chd_assign) is
    used when available; this Python version is the oracle and fallback.
    Both iterate buckets in stable big-first order so results are
    bit-identical.
    """
    from . import native

    nat = native.chd_assign(keys, r, b, slot_multiplier(salt), fused=fused)
    if nat is not NotImplemented:
        return nat  # (disp, slot_of) or None (infeasible)

    n = keys.shape[0]
    if fused:
        buckets, h1, _ = _h_fused(keys, b, r, salt)
    else:
        buckets = _h_bucket(keys, b)
        h1 = _h_slot(keys, r, salt)
    order = np.argsort(-np.bincount(buckets, minlength=b), kind="stable")
    by_bucket: list[list[int]] = [[] for _ in range(b)]
    for i, bk in enumerate(buckets):
        by_bucket[bk].append(i)

    disp = np.zeros(b, dtype=np.uint16)
    occupied = np.zeros(r, dtype=bool)
    slot_of = np.full(n, -1, dtype=np.int64)
    for bk in order:
        members = by_bucket[bk]
        if not members:
            continue
        hs = h1[members]
        if len(set(hs.tolist())) != len(members):
            return None  # intra-bucket h1 collision: caller must grow R
        found = False
        for d in range(min(65536, 4 * r)):
            slots = (hs ^ d) & (r - 1)
            if not occupied[slots].any():
                occupied[slots] = True
                slot_of[members] = slots
                disp[bk] = d
                found = True
                break
        if not found:
            return None
    return disp, slot_of


def _build(keys: np.ndarray, r: int | None = None,
           fused: bool = False) -> tuple[np.ndarray, np.ndarray, int, int, int]:
    """Search (R, B, salt) combos in ascending kernel-cost order.

    Kernel probe cost is linear in table words scanned, so prefer the
    tightest R (even at ~0.98 load) with the smallest workable B.
    """
    keys = np.asarray(keys, dtype=np.uint32)
    n = keys.shape[0]
    if np.unique(keys).shape[0] != n:
        raise ValueError("CHD keys must be unique")
    r_min = r or _pow2(int(np.ceil(n * 1.02)))
    candidates = []
    for r_try in (r_min, r_min * 2, r_min * 4, r_min * 8):
        for b_try in (_pow2(max(8, n // 8)), _pow2(max(8, n // 4)),
                      _pow2(max(8, n // 2)), _pow2(max(8, n))):
            if fused and int(np.log2(r_try)) + int(np.log2(b_try)) > 32:
                continue
            candidates.append((r_try, b_try))
    # ascending total scanned words (resid packing: R/4 + B/2 as proxy)
    candidates.sort(key=lambda rb: rb[0] + rb[1])
    seen = set()
    for r_try, b_try in candidates:
        if (r_try, b_try) in seen:
            continue
        seen.add((r_try, b_try))
        first = None
        for salt in range(24):
            res = _assign_slots(keys, r_try, b_try, salt, fused=fused)
            if res is not None:
                disp, slot_of = res
                if int(disp.max()) < 256:
                    # byte-sized displacements pack 4/word: one fewer
                    # probe gather in the kernel — worth scanning salts for
                    return disp, slot_of, r_try, b_try, salt
                if first is None:
                    first = (disp, slot_of, r_try, b_try, salt)
        if first is not None:
            return first
    raise RuntimeError("CHD build failed to converge")


def build_exact(keys: np.ndarray, values: np.ndarray) -> ChdTable:
    """Exact table: word = key16<<16 | value15<<1 | 1; empty = 0.

    keys must be < 2^16; values < 2^15 (enforced by caller).
    """
    keys = np.asarray(keys, dtype=np.uint32)
    values = np.asarray(values, dtype=np.uint32)
    if keys.size == 0:
        return ChdTable(disp=np.zeros(8, np.uint16), slot_words=np.zeros(8, np.int32),
                        num_buckets=8, num_slots=8, kind="exact")
    assert keys.max() < (1 << 16) and values.max() < (1 << 15)
    disp, slot_of, r, b, salt = _build(keys)
    words = np.zeros(r, dtype=np.uint32)
    words[slot_of] = (keys << np.uint32(16)) | (values << np.uint32(1)) | np.uint32(1)
    return ChdTable(disp=disp, slot_words=words.astype(np.int32),
                    num_buckets=b, num_slots=r, kind="exact", salt=salt)


def build_resid(keys: np.ndarray, bits: int = 16) -> ChdTable:
    """Residual membership filter: a `bits`-wide secondary hash per slot
    (16-bit default: 2 per int32 word, FP ~2^-16); empty slots hold an
    arbitrary value — a false positive only costs exact-tail time."""
    assert bits in (8, 16)
    per_word = 32 // bits
    keys = np.asarray(keys, dtype=np.uint32)
    if keys.size == 0:
        return ChdTable(disp=np.zeros(8, np.uint16), slot_words=np.zeros(8, np.int32),
                        num_buckets=8, num_slots=8, kind=f"resid{bits}")
    disp, slot_of, r, b, salt = _build(keys)
    resid = np.full(r, 0xAAAA & ((1 << bits) - 1), dtype=np.uint32)
    resid[slot_of] = h_resid(keys, bits)
    words = np.zeros(r // per_word, dtype=np.uint32)
    for j in range(per_word):
        words |= resid[j::per_word] << np.uint32(bits * j)
    return ChdTable(disp=disp, slot_words=words.astype(np.int32),
                    num_buckets=b, num_slots=r, kind=f"resid{bits}", salt=salt)


def build_exact_wide(keys: np.ndarray, values: np.ndarray) -> tuple[ChdTable, np.ndarray]:
    """Exact table for keys up to 32 bits: the full key is stored in a
    second word array, so lookups are exact with no width limit.

    Returns (table, key_words) where table.slot_words holds
    ``value<<1 | 1`` (0 = empty) and key_words holds the key per slot
    (empty slots hold -1, which no masked kernel key can equal).
    """
    keys = np.asarray(keys, dtype=np.uint32)
    values = np.asarray(values, dtype=np.uint32)
    if keys.size == 0:
        t = ChdTable(disp=np.zeros(8, np.uint16), slot_words=np.zeros(8, np.int32),
                     num_buckets=8, num_slots=8, kind="exact_wide")
        return t, np.full(8, -1, np.int32)
    assert values.max() < (1 << 30)
    disp, slot_of, r, b, salt = _build(keys)
    words = np.zeros(r, dtype=np.uint32)
    words[slot_of] = (values << np.uint32(1)) | np.uint32(1)
    key_words = np.full(r, -1, dtype=np.int64)
    key_words[slot_of] = keys
    t = ChdTable(disp=disp, slot_words=words.astype(np.int32),
                 num_buckets=b, num_slots=r, kind="exact_wide", salt=salt)
    return t, key_words.astype(np.uint32).view(np.int32)


def lookup_exact_wide(t: ChdTable, key_words: np.ndarray, key: int) -> int:
    """Host-side oracle for the wide exact probe: value+... returns value if
    present (values are pattern IDs >= 1 passed by the caller), else 0."""
    k = np.uint32(key)
    bk = int(_h_bucket(np.array([k], np.uint32), t.num_buckets)[0])
    h1 = int(_h_slot(np.array([k], np.uint32), t.num_slots, t.salt)[0])
    slot = (h1 ^ int(t.disp[bk])) & (t.num_slots - 1)
    w = int(np.uint32(t.slot_words[slot]))
    if (w & 1) and np.uint32(key_words[slot]) == k:
        return w >> 1
    return 0


def lookup_exact(t: ChdTable, key: int) -> int:
    """Host-side oracle for the kernel's exact probe: value+1 if present, 0."""
    k = np.uint32(key)
    bk = int(_h_bucket(np.array([k], np.uint32), t.num_buckets)[0])
    h1 = int(_h_slot(np.array([k], np.uint32), t.num_slots, t.salt)[0])
    slot = (h1 ^ int(t.disp[bk])) & (t.num_slots - 1)
    w = int(np.uint32(t.slot_words[slot]))
    if (w & 1) and (w >> 16) == int(key) and key < (1 << 16):
        return ((w >> 1) & 0x7FFF) + 1
    return 0


def lookup_resid(t: ChdTable, key: int) -> bool:
    """Host-side oracle for the residual probe (may false-positive)."""
    bits = 8 if t.kind == "resid8" else 16
    per_word = 32 // bits
    k = np.uint32(key)
    bk = int(_h_bucket(np.array([k], np.uint32), t.num_buckets)[0])
    h1 = int(_h_slot(np.array([k], np.uint32), t.num_slots, t.salt)[0])
    slot = (h1 ^ int(t.disp[bk])) & (t.num_slots - 1)
    w = int(np.uint32(t.slot_words[slot // per_word]))
    stored = (w >> (bits * (slot % per_word))) & ((1 << bits) - 1)
    return stored == int(h_resid(np.array([k], np.uint32), bits)[0])


# ---------------------------------------------------------------------------
# Fused-hash builders (the sieve kernel's tables): ONE multiply per probe
# derives bucket (top bits), h1 (next bits) and the 16-bit residual (low
# bits). Exact tables use the "member-key fill" trick for empty slots:
# an empty slot's key field holds an arbitrary MEMBER key, which no probe
# can match there (members always probe their own slots), so the kernel
# needs no valid-bit test at all.
# ---------------------------------------------------------------------------

def build_exact2(keys: np.ndarray, values: np.ndarray) -> ChdTable:
    """Fused exact table: word = key16 << 16 | value15; empty slots hold
    (member_key << 16) so key-compare alone decides the hit."""
    keys = np.asarray(keys, dtype=np.uint32)
    values = np.asarray(values, dtype=np.uint32)
    assert keys.size > 0 and keys.max() < (1 << 16) and values.max() < (1 << 15)
    disp, slot_of, r, b, salt = _build(keys, fused=True)
    words = np.full(r, np.uint32(keys[0]) << np.uint32(16), dtype=np.uint32)
    words[slot_of] = (keys << np.uint32(16)) | values
    return ChdTable(disp=disp, slot_words=words.astype(np.int32),
                    num_buckets=b, num_slots=r, kind="exact2", salt=salt)


def build_exact_wide2(keys: np.ndarray, values: np.ndarray) -> tuple[ChdTable, np.ndarray]:
    """Fused wide exact table: full key word + bare value word."""
    keys = np.asarray(keys, dtype=np.uint32)
    values = np.asarray(values, dtype=np.uint32)
    assert keys.size > 0 and values.max() < (1 << 30)
    disp, slot_of, r, b, salt = _build(keys, fused=True)
    words = np.zeros(r, dtype=np.uint32)
    words[slot_of] = values
    key_words = np.full(r, keys[0], dtype=np.uint32)
    key_words[slot_of] = keys
    t = ChdTable(disp=disp, slot_words=words.astype(np.int32),
                 num_buckets=b, num_slots=r, kind="exact_wide2", salt=salt)
    return t, key_words.view(np.int32)


def build_resid2(keys: np.ndarray, bits: int = 16) -> ChdTable:
    """Fused-slot residual filter: bucket/h1 come from the fused product,
    but the stored residual is the TOP `bits` bits of an INDEPENDENT
    product key*MIX_RESID (h_resid), packed 32//bits per word.

    The residual must be independent of the slot hash: the original
    fused form stored low product bits, which OVERLAP the h1 bit range
    once lg_b + lg_r approaches 32 — at 100K keys the "2^-16" filter
    actually passed ~1% of random probes (r5 capture,
    experiments/logs_r5/csr_profile.log: 715K survivors where the exact
    count was ~5K). One extra VPU multiply per probe buys the nominal
    FP rate at every table size.

    bits=16 (FP ~2^-16) is the default; bits=8 (FP ~2^-8, half the probe
    planes) pays off only where a false positive is walker-cheap (see
    pallas_sieve._RESID8_THRESHOLD)."""
    assert bits in (8, 16)
    per_word = 32 // bits
    mask = np.uint32((1 << bits) - 1)
    keys = np.asarray(keys, dtype=np.uint32)
    assert keys.size > 0
    disp, slot_of, r, b, salt = _build(keys, fused=True)
    resid_of = h_resid(keys, bits)
    resid = np.full(r, np.uint32(0x5555) & mask, dtype=np.uint32)
    resid[slot_of] = resid_of.astype(np.uint32) & mask
    words = np.zeros(r // per_word, dtype=np.uint32)
    for j in range(per_word):
        words |= resid[j::per_word] << np.uint32(bits * j)
    return ChdTable(disp=disp, slot_words=words.astype(np.int32),
                    num_buckets=b, num_slots=r, kind=f"resid2_{bits}",
                    salt=salt)


def _fused_slot(t: ChdTable, key: int) -> tuple[int, int]:
    k = np.uint32(key)
    b, r = t.num_buckets, t.num_slots
    lg_b, lg_r = int(np.log2(b)), int(np.log2(r))
    # wrapping 32-bit multiply (mask via int, not uint32*uint32 — numpy
    # warns on intended uint32 overflow)
    prod = np.uint32((int(k) * slot_multiplier(t.salt)) & 0xFFFFFFFF)
    bk = int(prod >> np.uint32(32 - lg_b)) & (b - 1)
    h1 = int(prod >> np.uint32(32 - lg_b - lg_r)) & (r - 1)
    slot = (h1 ^ int(t.disp[bk])) & (r - 1)
    return slot, int(prod & np.uint32(0xFFFF))


def lookup_exact2(t: ChdTable, key: int) -> int:
    """Oracle: value if key present else 0 (value 0 never stored)."""
    slot, _ = _fused_slot(t, key)
    w = int(np.uint32(t.slot_words[slot]))
    return (w & 0x7FFF) if (w >> 16) == int(key) else 0


def lookup_exact_wide2(t: ChdTable, key_words: np.ndarray, key: int) -> int:
    slot, _ = _fused_slot(t, key)
    if np.uint32(key_words[slot]) == np.uint32(key):
        return int(np.uint32(t.slot_words[slot]))
    return 0


def lookup_resid2(t: ChdTable, key: int) -> bool:
    bits = 8 if t.kind.endswith("_8") else 16
    per_word = 32 // bits
    slot, _ = _fused_slot(t, key)
    w = int(np.uint32(t.slot_words[slot // per_word]))
    stored = (w >> (bits * (slot % per_word))) & ((1 << bits) - 1)
    return stored == int(h_resid(np.array([key], np.uint32), bits)[0])


# ---------------------------------------------------------------------------
# Bucket-fingerprint filter (round 5): ONE gather level for the sieve's
# alive filter. Each bucket is a single int32 word holding TWO 16-bit
# fingerprints (low bits of the same key*mul product that picks the
# bucket); keys landing third-or-later in a bucket overflow into a small
# fused CHD residual table probed IN PARALLEL (independent chain — its
# latency hides under the main probe's). No false negatives; false
# positives ~2^-15 + the overflow table's ~2^-16. Motivation: the
# two-level CHD alive probe is the sieve kernel's latency sink (64% of
# kernel time, MEASUREMENTS.md probe-family split) because its word
# gather depends on its displacement gather; this structure has no
# dependent gather at all.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Bucket2Table:
    words: np.ndarray           # int32 [m]: fp16 lo | fp16 hi
    mul: int                    # odd multiplier (fp = low 16 bits of prod)
    lg_m: int
    overflow: ChdTable | None   # resid2 CHD over third-or-later keys
    salt: int = 0


def build_bucket2(keys: np.ndarray, lg_m_delta: int = 0,
                  salts: int = 16) -> Bucket2Table:
    """Bucket-fingerprint filter over unique uint32 keys.

    m = pow2(n) * 2^lg_m_delta buckets; the salt minimizing the overflow
    count wins (fewer overflow keys -> smaller parallel CHD)."""
    keys = np.asarray(keys, dtype=np.uint32)
    n = keys.shape[0]
    assert n > 0 and np.unique(keys).shape[0] == n
    m = max(8, _pow2(n) << lg_m_delta if lg_m_delta >= 0
            else _pow2(n) >> -lg_m_delta)
    lg_m = int(np.log2(m))
    best = None
    for salt in range(salts):
        mul = np.uint32(slot_multiplier(salt))
        prod = keys * mul
        bucket = (prod >> np.uint32(32 - lg_m)).astype(np.int64)
        cnt = np.bincount(bucket, minlength=m)
        ovf = int(np.maximum(cnt - 2, 0).sum())
        if best is None or ovf < best[0]:
            best = (ovf, salt, mul, prod, bucket)
        if ovf == 0:
            break
    _, salt, mul, prod, bucket = best
    fp = (prod & np.uint32(0xFFFF)).astype(np.uint32)
    lo = np.full(m, -1, np.int64)       # -1 = empty
    hi = np.full(m, -1, np.int64)
    ovf_keys = []
    order = np.argsort(bucket, kind="stable")   # deterministic fill
    for i in order:
        b = bucket[i]
        if lo[b] < 0:
            lo[b] = fp[i]
        elif hi[b] < 0:
            hi[b] = fp[i]
        elif fp[i] == lo[b] or fp[i] == hi[b]:
            pass                         # same fingerprint already stored
        else:
            ovf_keys.append(keys[i])
    # empty halves duplicate the other half (or 0 for fully-empty
    # buckets): duplicates add no false positives beyond the stored fp
    lo = np.where(lo < 0, np.maximum(hi, 0), lo)
    hi = np.where(hi < 0, lo, hi)
    words = (lo | (hi << np.int64(16))).astype(np.uint32).view(np.int32)
    overflow = (build_resid2(np.array(sorted(int(k) for k in ovf_keys),
                                      dtype=np.uint32))
                if ovf_keys else None)
    return Bucket2Table(words=words, mul=int(mul), lg_m=lg_m,
                        overflow=overflow, salt=salt)


def lookup_bucket2(t: Bucket2Table, key: int) -> bool:
    """Host oracle for the bucket-fingerprint probe (may false-positive)."""
    prod = np.uint32((int(key) * t.mul) & 0xFFFFFFFF)
    b = int(prod >> np.uint32(32 - t.lg_m))
    w = int(np.uint32(t.words[b]))
    fp = int(prod & np.uint32(0xFFFF))
    if (w & 0xFFFF) == fp or ((w >> 16) & 0xFFFF) == fp:
        return True
    return t.overflow is not None and lookup_resid2(t.overflow, key)


def _search_nodisp_mul(keys: np.ndarray, r: int, tries: int = 1 << 17) -> int | None:
    """Find an odd multiplier making slot = (key*mul) >> (32-lg_r) perfect
    (no displacement array at all — saves the probe's disp gather).
    Practical only for small key sets (collision prob ~ n^2/2r per try)."""
    lg_r = int(np.log2(r))
    n = keys.shape[0]
    if n > r:
        return None
    rng = np.random.default_rng(0xC0FFEE ^ (n * 2654435761) & 0xFFFFFFFF)
    max_chunk = max(1, (1 << 22) // max(1, n))
    # grow the batch geometrically: small key sets usually succeed within
    # the first few dozen tries, so don't pay a multi-million-row batch
    chunk = min(max_chunk, 512)
    done = 0
    while done < tries:
        muls = (rng.integers(0, 1 << 31, size=chunk, dtype=np.int64) * 2 + 1
                ).astype(np.uint32)
        prods = keys[None, :].astype(np.uint32) * muls[:, None]
        slots = (prods >> np.uint32(32 - lg_r)).astype(np.int64)
        slots.sort(axis=1)
        ok = (np.diff(slots, axis=1) != 0).all(axis=1)
        hit = np.nonzero(ok)[0]
        if hit.size:
            return int(muls[hit[0]])
        done += chunk
        chunk = min(max_chunk, chunk * 4)
    return None


def build_exact2_nodisp(keys: np.ndarray, values: np.ndarray) -> ChdTable | None:
    """Displacement-free fused exact table (one gather per probe).
    Returns None when no perfect multiplier is found quickly."""
    keys = np.asarray(keys, dtype=np.uint32)
    values = np.asarray(values, dtype=np.uint32)
    assert keys.size > 0 and keys.max() < (1 << 16) and values.max() < (1 << 15)
    for r in (_pow2(int(keys.size * 1.5)), _pow2(int(keys.size * 1.5)) * 2):
        mul = _search_nodisp_mul(keys, r)
        if mul is None:
            continue
        lg_r = int(np.log2(r))
        slots = (keys * np.uint32(mul)) >> np.uint32(32 - lg_r)
        words = np.full(r, np.uint32(keys[0]) << np.uint32(16), dtype=np.uint32)
        words[slots] = (keys << np.uint32(16)) | values
        t = ChdTable(disp=np.zeros(1, np.uint16), slot_words=words.astype(np.int32),
                     num_buckets=1, num_slots=r, kind="exact2_nodisp")
        t.salt = -1
        t.nodisp_mul = mul
        return t
    return None


def build_exact_wide2_nodisp(keys: np.ndarray, values: np.ndarray):
    """Displacement-free fused wide table. Returns (table, key_words) or None."""
    keys = np.asarray(keys, dtype=np.uint32)
    values = np.asarray(values, dtype=np.uint32)
    assert keys.size > 0 and values.max() < (1 << 30)
    for r in (_pow2(int(keys.size * 1.5)), _pow2(int(keys.size * 1.5)) * 2):
        mul = _search_nodisp_mul(keys, r)
        if mul is None:
            continue
        lg_r = int(np.log2(r))
        slots = (keys * np.uint32(mul)) >> np.uint32(32 - lg_r)
        words = np.zeros(r, dtype=np.uint32)
        words[slots] = values
        key_words = np.full(r, keys[0], dtype=np.uint32)
        key_words[slots] = keys
        t = ChdTable(disp=np.zeros(1, np.uint16), slot_words=words.astype(np.int32),
                     num_buckets=1, num_slots=r, kind="exact_wide2_nodisp")
        t.salt = -1
        t.nodisp_mul = mul
        return t, key_words.view(np.int32)
    return None


def lookup_nodisp(t: ChdTable, key: int) -> int:
    """Oracle slot for nodisp tables."""
    lg_r = int(np.log2(t.num_slots))
    prod = np.uint32((int(key) * int(t.nodisp_mul)) & 0xFFFFFFFF)
    return int(prod >> np.uint32(32 - lg_r))

