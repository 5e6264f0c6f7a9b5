"""Pallas ladder kernel parity vs the golden model (interpret mode on CPU).

On real TPU the same code runs compiled; bench.py and the verify skill
exercise that path. Interpret mode validates kernel logic exactly.
"""
import numpy as np
import pytest

from pfac_tpu import Automaton
from pfac_tpu.backends import golden
from pfac_tpu.backends.pallas_ladder import LadderMatcher, LadderTables
from pfac_tpu.core import chd


class TestChd:
    @pytest.mark.parametrize("n", [1, 7, 100, 2000])
    def test_exact_roundtrip(self, n):
        rng = np.random.default_rng(n)
        keys = rng.choice(1 << 16, size=n, replace=False).astype(np.uint32)
        vals = rng.integers(1, 1 << 15, size=n).astype(np.uint32)
        t = chd.build_exact(keys, vals)
        for i in range(n):
            assert chd.lookup_exact(t, int(keys[i])) == int(vals[i]) + 1
        nonkeys = set(range(300)) - set(keys.tolist())
        assert all(chd.lookup_exact(t, k) == 0 for k in nonkeys)

    def test_resid_no_false_negatives(self):
        rng = np.random.default_rng(1)
        keys = rng.choice(1 << 16, size=500, replace=False).astype(np.uint32)
        t = chd.build_resid(keys)
        assert all(chd.lookup_resid(t, int(k)) for k in keys)
        nonkeys = [k for k in range(5000) if k not in set(keys.tolist())]
        fp = sum(chd.lookup_resid(t, k) for k in nonkeys) / len(nonkeys)
        assert fp < 0.05


def _ladder(patterns, tile_rows=8):
    a = Automaton.from_patterns(patterns)
    return a, LadderMatcher(a, tile_rows=tile_rows, interpret=True)


class TestLadderMatcher:
    def test_readme_example(self):
        a, m = _ladder([b"AB", b"ABG", b"BEDE", b"ED"])
        assert m.match(b"ABEDEDABG").tolist() == [1, 3, 4, 0, 4, 0, 2, 0, 0]

    def test_len1_only(self):
        a, m = _ladder([b"x", b"y"])
        assert m.match(b"xyzyx").tolist() == [1, 2, 0, 2, 1]

    def test_len2_only(self):
        a, m = _ladder([b"ab", b"ba"])
        assert m.match(b"abab").tolist() == [1, 2, 1, 0]

    def test_long_patterns_tail(self):
        pats = [b"abcdef", b"abq", b"zzzzzzzz"]
        a, m = _ladder(pats)
        data = b"xxabcdefyyabqzz" + b"z" * 10 + b"ab"
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist()

    def test_prefix_chains(self):
        pats = [b"a", b"ab", b"abc", b"abcd", b"abcde"]
        a, m = _ladder(pats)
        data = b"abcdeabcxab"
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist()

    @pytest.mark.parametrize("seed", range(6))
    def test_random_vs_golden(self, seed):
        rng = np.random.default_rng(seed)
        alpha = rng.integers(0, 256, size=int(rng.integers(2, 6))).astype(np.uint8)
        k = int(rng.integers(1, 12))
        pats = [
            bytes(alpha[rng.integers(0, len(alpha), size=int(rng.integers(1, 8)))])
            for _ in range(k)
        ]
        data = bytes(alpha[rng.integers(0, len(alpha), size=int(rng.integers(1, 300)))])
        a = Automaton.from_patterns(pats)
        m = LadderMatcher(a, tile_rows=8, interpret=True)
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist(), (pats, data)

    def test_binary_and_boundary(self):
        pats = [bytes([0, 255]), bytes([255, 255, 255]), bytes([10])]
        a, m = _ladder(pats)
        data = bytes([0, 255, 255, 255, 10, 0, 255])
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist()

    def test_match_reduce(self):
        a, m = _ladder([b"AB", b"ABG", b"BEDE", b"ED"])
        ids, pos, n = m.match_reduce(b"ABEDEDABG")
        assert (n, pos.tolist(), ids.tolist()) == (5, [0, 1, 2, 4, 6], [1, 3, 4, 4, 2])

    def test_multi_tile(self):
        a, m = _ladder([b"abc", b"bc"], tile_rows=8)  # 1024 positions per tile
        data = (b"xabcx" * 600)  # 3000 bytes -> 3 tiles
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist()

    def test_too_many_patterns_rejected(self):
        from pfac_tpu.status import PfacError

        a = Automaton.from_patterns([b"ab"])
        a.num_final_states = 40000  # simulate oversized ruleset
        with pytest.raises(PfacError):
            LadderTables.build(a)


class TestLadderViaMatcherApi:
    def test_backend_pallas_forced(self):
        from pfac_tpu import Matcher

        m = Matcher([b"AB", b"ABG", b"BEDE", b"ED"], backend="pallas")
        assert m.match(b"ABEDEDABG").tolist() == [1, 3, 4, 0, 4, 0, 2, 0, 0]

    def test_backend_auto_on_cpu_uses_xla(self):
        from pfac_tpu import Matcher
        from pfac_tpu.backends.xla import XlaMatcher

        m = Matcher([b"AB"], backend="auto", tile=64)
        assert isinstance(m._engine(), XlaMatcher)
