"""Golden-model conformance: the README worked example and the brute-force
oracle (SURVEY.md §4: cross-backend differential testing)."""
import numpy as np
import pytest

from pfac_tpu import Automaton
from pfac_tpu.backends import golden

# README.md:96-120 worked example: input ABEDEDABG, patterns AB=1 ABG=2 BEDE=3 ED=4
README_EXPECTED = [1, 3, 4, 0, 4, 0, 2, 0, 0]


class TestConformanceCorpus:
    def test_readme_example_dense(self, example_pattern_path, example_input):
        a = Automaton.from_pattern_file(example_pattern_path)
        got = golden.match_dense(a, example_input)
        # input file has a trailing '\n' (position 9, no match)
        assert got.tolist() == README_EXPECTED + [0]

    def test_readme_example_hash(self, example_pattern_path, example_input):
        a = Automaton.from_pattern_file(example_pattern_path, hashed=True)
        got = golden.match_hash(a, example_input)
        assert got.tolist() == README_EXPECTED + [0]

    def test_example2_vs_oracle(self, example_pattern2_path, example_input2, oracle):
        a = Automaton.from_pattern_file(example_pattern2_path, hashed=True)
        pats = [b"s", b"h", b"he", b"she", b"hers", b"her", b"his", b"iis", b"is", b"ii"]
        expected = oracle(pats, example_input2)
        assert golden.match_dense(a, example_input2).tolist() == expected.tolist()
        assert golden.match_hash(a, example_input2).tolist() == expected.tolist()


class TestGoldenProperties:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_vs_oracle(self, seed, oracle):
        rng = np.random.default_rng(seed)
        alphabet = rng.integers(0, 256, size=4).astype(np.uint8)  # small alphabet
        k = int(rng.integers(1, 12))
        pats = []
        for _ in range(k):
            ln = int(rng.integers(1, 6))
            pats.append(bytes(alphabet[rng.integers(0, len(alphabet), size=ln)]))
        # dedupe? no — duplicates exercise the overwrite path
        data = bytes(alphabet[rng.integers(0, len(alphabet), size=int(rng.integers(5, 200)))])
        a = Automaton.from_patterns(pats, hashed=True)
        expected = oracle(pats, data)
        assert golden.match_dense(a, data).tolist() == expected.tolist()
        assert golden.match_hash(a, data).tolist() == expected.tolist()

    def test_overlapping_matches(self, oracle):
        pats = [b"aa", b"aaa", b"aaaa"]
        data = b"aaaaaaa"
        a = Automaton.from_patterns(pats, hashed=True)
        expected = oracle(pats, data)
        assert golden.match_dense(a, data).tolist() == expected.tolist()
        assert golden.match_hash(a, data).tolist() == expected.tolist()

    def test_binary_input(self, oracle):
        pats = [b"\x00\x00", b"\xff", b"\x00\xff\x00"]
        data = bytes([0, 0, 255, 0, 255, 0, 0, 255])
        a = Automaton.from_patterns(pats, hashed=True)
        expected = oracle(pats, data)
        assert golden.match_dense(a, data).tolist() == expected.tolist()
        assert golden.match_hash(a, data).tolist() == expected.tolist()

    def test_reduce(self):
        m = np.array([1, 3, 4, 0, 4, 0, 2, 0, 0], dtype=np.int32)
        ids, pos, n = golden.reduce_result(m)
        assert n == 5
        assert pos.tolist() == [0, 1, 2, 4, 6]
        assert ids.tolist() == [1, 3, 4, 4, 2]


def test_edges_oracle_matches_dense_oracle():
    """match_edges_batch (O(edges) memory, for big automata) must be
    bit-identical to the dense-table oracle."""
    import numpy as np
    from pfac_tpu import Automaton
    from pfac_tpu.backends import golden

    rng = np.random.default_rng(5)
    pats = [bytes(rng.integers(0, 256, size=int(l), dtype=np.uint8))
            for l in list(rng.integers(1, 4, size=10))
            + list(rng.integers(4, 30, size=120))]
    pats = list(dict.fromkeys(pats))
    a = Automaton.from_patterns(pats)
    n = 40000
    d = rng.integers(0, 256, size=n, dtype=np.uint8)
    for i in range(0, n - 40, 89):
        p = pats[int(rng.integers(0, len(pats)))]
        d[i:i + len(p)] = np.frombuffer(p, np.uint8)
    assert np.array_equal(golden.match_edges_batch(a, bytes(d)),
                          golden.match_dense_batch(a, bytes(d)))


def test_edges_oracle_sentinel_no_alias():
    """Regression (round-4 review): with radix-256 keys the end-of-input
    sentinel byte (256) aliased the NEXT state's 0x00 edge
    (state*256 + 256 == (state+1)*256 + 0), so walks past the input end
    could take a real NUL transition. Radix-257 keys cannot alias."""
    import numpy as np
    from pfac_tpu import Automaton
    from pfac_tpu.backends import golden

    pats = [b"\x00", b"\x00\x02\x00\x00", b"\x01\x00\x00",
            b"\x00\x01\x02\x02", b"\x00\x02\x01",
            b"\x00\x02\x00\x00\x00", b"\x01"]
    a = Automaton.from_patterns(pats)
    data = bytes([0, 0, 2, 1, 1, 0, 1, 1, 0, 1, 2])
    assert np.array_equal(golden.match_edges_batch(a, data),
                          golden.match_dense_batch(a, data))
