"""CSR row-gather walker: host build/oracle and device-path parity.

The CSR tier serves rulesets the VMEM walk engine can't encode
(reference analog: the space-driven kernel's large-table path,
PFAC/src/PFAC_kernel_spaceDriven.cu:465-558). Tests run the sieve
pipeline in interpret mode with walk tables force-disabled so the CSR
tail is the engine under test.
"""
import numpy as np
import pytest

from pfac_tpu import Automaton
from pfac_tpu.backends import golden
from pfac_tpu.backends import xla_csr
from pfac_tpu.backends.pallas_sieve import SieveMatcher


def _csr_matcher(pats, monkeypatch):
    """SieveMatcher with the VMEM walker disabled -> CSR tail."""
    import pfac_tpu.backends.pallas_sieve as S
    monkeypatch.setattr(S, "build_walk_tables_gated", lambda *a: None)
    a = Automaton.from_patterns(pats)
    m = SieveMatcher(a, interpret=True)
    assert m.walk_tables is None and m.csr_tables is not None
    return a, m


class TestCsrBuild:
    def test_oracle_basic(self):
        pats = [b"wxyzab", b"wxyz", b"q", b"longerpatternhere"]
        a = Automaton.from_patterns(pats)
        t = xla_csr.build_csr_tables(a)
        data = b"..wxyzab..longerpatternhere.."
        n = len(data)
        for pos, want in ((2, 1), (10, 4), (0, 0), (6, 0)):
            got = xla_csr.csr_oracle_walk(t, data, pos, n)
            # IDs are 1-based file order
            assert got == want, (pos, got, want)

    def test_oracle_matches_golden_randomly(self):
        rng = np.random.default_rng(11)
        pats = [bytes(rng.integers(97, 105, size=int(l)).astype(np.uint8))
                for l in rng.integers(4, 40, size=60)]
        pats = list(dict.fromkeys(pats))
        a = Automaton.from_patterns(pats)
        t = xla_csr.build_csr_tables(a)
        data = bytes(rng.integers(97, 105, size=3000, dtype=np.uint8))
        exp = golden.match_dense(a, data)
        # oracle covers length>=4 only; compare where expected len >= 4
        lens = {int(i): len(p) for i, p in
                zip(a.pattern_ids, a.sorted_patterns)}
        for pos in range(0, 3000, 7):
            got = xla_csr.csr_oracle_walk(t, data, pos, len(data))
            e = int(exp[pos])
            if e and lens[e] >= 4:
                assert got == e, pos
            else:
                assert got == 0 or lens.get(got, 0) >= 4

    def test_chaining_hot_state(self):
        # one shared 4-byte prefix with > W_ENTRIES distinct extensions
        # forces continuation rows
        exts = [bytes([x, 120, 121, 122]) for x in range(97, 97 + 20)]
        pats = [b"HOT!" + e for e in exts]
        a = Automaton.from_patterns(pats)
        t = xla_csr.build_csr_tables(a)
        assert any(s.chain >= 1 for s in t.steps)
        for i, p in enumerate(pats):
            data = b"__" + p + b"__"
            assert xla_csr.csr_oracle_walk(t, data, 2, len(data)) == i + 1


class TestCsrPipeline:
    def test_parity_random(self, monkeypatch):
        rng = np.random.default_rng(5)
        pats = [bytes(rng.integers(97, 107, size=int(l)).astype(np.uint8))
                for l in rng.integers(1, 30, size=80)]
        pats = list(dict.fromkeys(pats))
        a, m = _csr_matcher(pats, monkeypatch)
        data = bytes(rng.integers(97, 107, size=5000, dtype=np.uint8))
        assert m.match(data).tolist() == golden.match_dense(a, data).tolist()
        m.flush_checks()

    def test_deep_stages(self, monkeypatch):
        # pattern lengths straddling every stage boundary (16/48/112/243)
        rng = np.random.default_rng(6)
        base = bytes(rng.integers(65, 91, size=243, dtype=np.uint8))
        pats = [base[:k] for k in (4, 15, 16, 17, 47, 48, 49, 111, 112,
                                   113, 243)]
        a, m = _csr_matcher(pats, monkeypatch)
        data = b"\x00" * 37 + base + b"\x00" * 100
        exp = golden.match_dense(a, data)
        assert m.match(data).tolist() == exp.tolist()
        m.flush_checks()

    def test_boundary_straddle(self, monkeypatch):
        # matches crossing the 1024-position block and 128-byte row lines
        pat = b"HELLOWORLD!!"
        pats = [pat, b"HELL", b"HE"]
        a, m = _csr_matcher(pats, monkeypatch)
        data = bytearray(3000)
        for off in (0, 1, 63, 64, 120, 127, 128, 1020, 1023, 1024, 2040):
            data[off:off + len(pat)] = pat
        data = bytes(data)
        assert m.match(data).tolist() == \
            golden.match_dense(a, data).tolist()
        m.flush_checks()

    def test_match_at_end_truncated(self, monkeypatch):
        a, m = _csr_matcher([b"abcdef", b"abcd"], monkeypatch)
        # full match at the very end; deeper pattern truncated
        data = b"zzzzabcd"
        assert m.match(data).tolist() == \
            golden.match_dense(a, data).tolist()
        m.flush_checks()

    def test_big_ruleset_resid8(self, monkeypatch):
        # the resid8 kernel probe is kept as an A/B arm only (r5 flip:
        # resid8's corpus-sized false survivors lose on every real tier);
        # force it here so the 8-bit probe + CSR tail stay covered
        import pfac_tpu.backends.pallas_sieve as S
        monkeypatch.setattr(S, "_RESID8_THRESHOLD", 8192)
        rng = np.random.default_rng(17)
        raw = rng.integers(0, 256, size=9000 * 12, dtype=np.uint8)
        pats = list(dict.fromkeys(
            raw[i * 12:i * 12 + 12].tobytes() for i in range(9000)))
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        assert m.tables.alive.resid_bits == 8
        data = bytearray(rng.integers(0, 256, size=4000, dtype=np.uint8))
        for off in (0, 777, 1500, 3988):
            p = pats[int(rng.integers(0, len(pats)))]
            data[off:off + len(p)] = p
        data = bytes(data)
        assert m.match(data).tolist() == \
            golden.match_dense_batch(a, data).tolist()
        m.flush_checks()

    def test_multiple_rounds(self, monkeypatch):
        # survivors exceeding one round capacity (cap = npad here is
        # bounded by the corpus; shrink HEAVY_CAP instead)
        import pfac_tpu.backends.pallas_sieve as S
        monkeypatch.setattr(S, "HEAVY_CAP", 1024)
        a, m = _csr_matcher([b"aaaa", b"aaaaaaaa"], monkeypatch)
        data = b"a" * 5000
        assert m.match(data).tolist() == \
            golden.match_dense(a, data).tolist()
        m.flush_checks()

    def test_deferred_buffer_overflow_tail(self, monkeypatch):
        # survivors past R_BUF_ROUNDS * HEAVY_CAP on the CSR branch: the
        # direct-scatter tail after the one-shot buffer scatter must stay
        # exact (mirror of the walker branch's tail test)
        import pfac_tpu.backends.pallas_sieve as S
        monkeypatch.setattr(S, "HEAVY_CAP", 1024)
        monkeypatch.setattr(S, "R_BUF_ROUNDS", 2)
        a, m = _csr_matcher([b"aaaa", b"aaaaaaaa"], monkeypatch)
        data = b"a" * 9000      # ~9K survivors > 2 * 1024 buffered
        assert m.match(data).tolist() == \
            golden.match_dense(a, data).tolist()
        m.flush_checks()

    def test_per_index_tier_csr(self, monkeypatch):
        # tier A (per-index in-loop scatters) on the CSR branch, spanning
        # into the buffered tier and the direct tail
        import pfac_tpu.backends.pallas_sieve as S
        monkeypatch.setattr(S, "HEAVY_CAP", 1024)
        monkeypatch.setattr(S, "R_BUF_ROUNDS", 2)
        monkeypatch.setattr(S, "PER_IDX_ROUNDS", 2)
        monkeypatch.setattr(S, "PER_IDX_NPAD_MIN", 0)
        a, m = _csr_matcher([b"aaaa", b"aaaaaaaa"], monkeypatch)
        data = b"a" * 9000      # spans 2 per-index + 2 buffered + tail
        assert m.match(data).tolist() == \
            golden.match_dense(a, data).tolist()
        m.flush_checks()
