"""Survivor-walk engine: host table builder + oracle + Pallas kernel parity.

The oracle (walk_oracle) is the bit-exact host mirror of the kernel walk;
these tests pin it against an independent brute-force longest-match and
then (in TestWalkKernel) pin the Pallas kernel against the oracle in
interpret mode.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pfac_tpu import Automaton
from pfac_tpu.backends import pallas_walk as W


def brute_deep_match(patterns, data: bytes, pos: int) -> int:
    """Longest pattern of length >= 4 starting at pos (later dup wins)."""
    best_id, best_len = 0, 3
    for pid, p in enumerate(patterns, start=1):
        lp = len(p)
        if lp >= 4 and lp >= best_len and data[pos:pos + lp] == p:
            best_id, best_len = pid, lp
    return best_id


def _tables(patterns):
    a = Automaton.from_patterns(patterns)
    t = W.build_walk_tables(a)
    assert t is not None
    return a, t


class TestWalkTablesOracle:
    def test_simple_chain(self):
        pats = [b"abcd", b"abcde", b"abcdef", b"abcdefgh", b"zzzz"]
        a, t = _tables(pats)
        data = b"xxabcdefghyyzzzzabcde"
        for pos in range(len(data)):
            got = W.walk_oracle(t, data, pos, len(data))
            assert got == brute_deep_match(pats, data, pos), pos

    def test_truncated_matches_masked(self):
        pats = [b"abcdef", b"abcd"]
        a, t = _tables(pats)
        # n cuts into the pattern: only the short one fits
        data = b"abcdef"
        assert W.walk_oracle(t, data, 0, 4) == 2      # 'abcd' exactly fits
        assert W.walk_oracle(t, data, 0, 3) == 0      # nothing fits
        assert W.walk_oracle(t, data, 0, 6) == 1

    def test_odd_length_leaf_finals(self):
        # odd-depth finals with NO deeper continuation (the case 2-byte
        # stepping must catch via the odd probe)
        pats = [b"abcde", b"qwertyz"]
        a, t = _tables(pats)
        data = b"abcdeXqwertyzX"
        assert W.walk_oracle(t, data, 0, len(data)) == 1
        assert W.walk_oracle(t, data, 6, len(data)) == 2

    def test_odd_final_with_divergent_continuation(self):
        # 'abcde' matched even though the next byte diverges from 'abcdef'
        pats = [b"abcde", b"abcdef"]
        a, t = _tables(pats)
        assert W.walk_oracle(t, b"abcdeX", 0, 6) == 1
        assert W.walk_oracle(t, b"abcdef", 0, 6) == 2

    def test_duplicate_patterns_later_id(self):
        pats = [b"wxyz!", b"wxyz!"]
        a, t = _tables(pats)
        assert W.walk_oracle(t, b"wxyz!", 0, 5) == 2

    @pytest.mark.parametrize("seed", range(8))
    def test_random_vs_brute(self, seed):
        rng = np.random.default_rng(seed)
        alpha = rng.integers(0, 256, size=int(rng.integers(2, 5))).astype(np.uint8)
        k = int(rng.integers(1, 20))
        pats = []
        for _ in range(k):
            ln = int(rng.integers(1, 14))
            pats.append(bytes(alpha[rng.integers(0, len(alpha), size=ln)]))
        if not any(len(p) >= 4 for p in pats):
            pats.append(bytes(alpha[rng.integers(0, len(alpha), size=6)]))
        a = Automaton.from_patterns(pats)
        t = W.build_walk_tables(a)
        assert t is not None
        data = bytes(alpha[rng.integers(0, len(alpha), size=200)])
        for pos in range(len(data)):
            got = W.walk_oracle(t, data, pos, len(data))
            assert got == brute_deep_match(pats, data, pos), (pats, data, pos)

    def test_unsupported_rulesets(self):
        a = Automaton.from_patterns([b"ab", b"c"])     # no len>=4 patterns
        assert W.build_walk_tables(a) is None

    def test_max_len_exactly_4(self):
        pats = [b"wxyz", b"wxyQ"]
        a, t = _tables(pats)
        assert t.steps == []
        assert W.walk_oracle(t, b"wxyzwxyQ", 0, 8) == 1
        assert W.walk_oracle(t, b"wxyzwxyQ", 4, 8) == 2
        assert W.walk_oracle(t, b"wxyzwxyQ", 5, 8) == 0


class TestWalkKernel:
    def _run(self, patterns, data: bytes, positions=None, n=None):
        import jax
        import jax.numpy as jnp

        a = Automaton.from_patterns(patterns)
        t = W.build_walk_tables(a)
        assert t is not None
        cap = W.GROUP
        n = len(data) if n is None else n
        if positions is None:
            positions = list(range(len(data)))
        pos = np.full(cap, len(data) + 64, np.int32)   # padding: past n
        pos[:len(positions)] = positions
        rows = -(-len(data) // 128)
        pad = np.zeros(max(1, rows) * 128, np.uint8)
        pad[:len(data)] = np.frombuffer(data, np.uint8)
        data2d = jnp.asarray(pad.reshape(-1, 128))
        run = W.build_walker(t, cap=cap, interpret=True)
        out = run([jnp.asarray(x) for x in t.arrays], data2d,
                  jnp.asarray(pos), jnp.full((1,), n, jnp.int32))
        got = np.asarray(out)[:len(positions)]
        want = [W.walk_oracle(t, data, int(p), n) for p in positions]
        brute = [brute_deep_match(patterns, data[:n], int(p))
                 if p < n else 0 for p in positions]
        assert want == brute, "oracle drifted from brute force"
        assert got.tolist() == want, (patterns, data)

    def test_kernel_simple(self):
        self._run([b"abcd", b"abcde", b"abcdefgh", b"zzzz"],
                  b"xxabcdefghyyzzzzabcdeQ" + bytes(30))

    def test_kernel_odd_finals(self):
        self._run([b"abcde", b"qwertyz", b"abcdef"],
                  b"abcdeXqwertyzXabcdef" + bytes(11))

    def test_kernel_row_straddle(self):
        # positions around the 128-byte gather-row boundary, matches
        # straddling rows; every (wv, ob) alignment class
        pat = b"HELLOWORLD!!"
        data = bytearray(400)
        for off in (0, 1, 3, 60, 61, 63, 64, 65, 127, 128, 200, 255, 256):
            data[off:off + len(pat)] = pat
        # overlapping plants clobber each other; just compare vs brute
        self._run([pat, b"HELL"], bytes(data))

    def test_kernel_end_of_input_masking(self):
        data = b"...." + b"abcdef"
        # n cuts the pattern: length-6 match must vanish, length-4 stays
        self._run([b"abcdef", b"abcd"], data, n=8)

    @pytest.mark.parametrize("seed", range(4))
    def test_kernel_random(self, seed):
        rng = np.random.default_rng(100 + seed)
        alpha = rng.integers(0, 256, size=3).astype(np.uint8)
        pats = []
        for _ in range(int(rng.integers(2, 16))):
            ln = int(rng.integers(1, 12))
            pats.append(bytes(alpha[rng.integers(0, 3, size=ln)]))
        if not any(len(p) >= 4 for p in pats):
            pats.append(bytes(alpha[rng.integers(0, 3, size=5)]))
        data = bytes(alpha[rng.integers(0, 3, size=300)])
        self._run(pats, data)


class TestPrepareWindowsVariants:
    def test_u8_bitcast_parity(self, monkeypatch):
        # both lowerings of prepare_windows must agree bit-for-bit,
        # including the sharded (main, tail) dual-gather layout
        import pfac_tpu.backends.pallas_walk as W
        rng = np.random.default_rng(11)
        nrows, w_raw = 64, W.ROW_WORDS * 3
        data2d = jnp.asarray(
            rng.integers(0, 256, size=(nrows, 128), dtype=np.uint8))
        cap = W.GROUP * 2
        pos = jnp.asarray(np.sort(rng.choice(
            nrows * 128, size=cap, replace=False)).astype(np.int32))
        main, tail = data2d[:48], data2d[48:]
        for src in (data2d, (main, tail)):
            monkeypatch.setattr(W, "WINDOWS_U8_BITCAST", False)
            base = np.asarray(W.prepare_windows(src, pos, w_raw))
            monkeypatch.setattr(W, "WINDOWS_U8_BITCAST", True)
            got = np.asarray(W.prepare_windows(src, pos, w_raw))
            assert np.array_equal(base, got)


class TestAlignTreeVariant:
    def test_align_tree_parity(self, monkeypatch):
        # the select-tree window alignment must match the linear scan at
        # every (wv, ob) alignment class, including row straddles
        monkeypatch.setattr(W, "ALIGN_TREE", True)
        pat = b"HELLOWORLD!!"
        data = bytearray(400)
        for off in (0, 1, 3, 60, 63, 64, 65, 127, 128, 200, 255, 256):
            data[off:off + len(pat)] = pat
        TestWalkKernel()._run([pat, b"HELL"], bytes(data))

    def test_align_tree_random(self, monkeypatch):
        monkeypatch.setattr(W, "ALIGN_TREE", True)
        rng = np.random.default_rng(77)
        alpha = rng.integers(0, 256, size=3).astype(np.uint8)
        pats = [bytes(alpha[rng.integers(0, 3, size=int(rng.integers(4, 12)))])
                for _ in range(8)]
        data = bytes(alpha[rng.integers(0, 3, size=300)])
        TestWalkKernel()._run(pats, data)
