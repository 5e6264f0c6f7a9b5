"""Core compiler tests: parser, trie, dense & hash tables, dump, save/load."""
import io
import os

import numpy as np
import pytest

from pfac_tpu import Automaton, PfacError, parse_pattern_bytes, patterns_from_list
from pfac_tpu.core.tables import build_hash_table, hash_lookup
from pfac_tpu.core.trie import TRAP_STATE, build_trie


class TestParser:
    def test_ids_by_file_order(self):
        p = parse_pattern_bytes(b"AB\nABG\nBEDE\nED\n")
        assert p.num_patterns == 4
        # sorted: AB, ABG, BEDE, ED -> original IDs 1, 2, 3, 4
        assert p.sorted_patterns == (b"AB", b"ABG", b"BEDE", b"ED")
        assert p.pattern_ids.tolist() == [1, 2, 3, 4]
        assert p.pattern_lens.tolist() == [0, 2, 3, 4, 2]

    def test_sort_prefix_first(self):
        p = parse_pattern_bytes(b"ABG\nAB\nZ\nA\n")
        assert p.sorted_patterns == (b"A", b"AB", b"ABG", b"Z")
        assert p.pattern_ids.tolist() == [4, 2, 1, 3]

    def test_trailing_line_without_newline_ignored(self):
        # reference only emits a pattern on seeing its '\n'
        # (PFAC_reorder_Table.cpp:181-193)
        p = parse_pattern_bytes(b"AB\nCD")
        assert p.num_patterns == 1
        assert p.sorted_patterns == (b"AB",)

    def test_empty_lines_skipped_ids_consecutive(self):
        p = parse_pattern_bytes(b"AB\n\n\nED\n")
        assert p.num_patterns == 2
        assert sorted(p.pattern_ids.tolist()) == [1, 2]
        assert p.sorted_patterns == (b"AB", b"ED")

    def test_binary_patterns(self):
        p = parse_pattern_bytes(b"\x00\x01\n\xff\xfe\xfd\n")
        assert p.sorted_patterns == (b"\x00\x01", b"\xff\xfe\xfd")

    def test_empty_pattern_list_rejected(self):
        with pytest.raises(PfacError):
            Automaton.from_patterns([])

    def test_pattern_with_newline_allowed_in_list_api(self):
        # the file format can't express 0x0A inside a pattern, but the
        # pythonic list API can — and matching must handle it
        from pfac_tpu.backends import golden

        a = Automaton.from_patterns([b"a\nb"])
        assert golden.match_dense(a, b"xa\nbx").tolist() == [0, 1, 0, 0, 0]


class TestTrie:
    def test_state_numbering_example(self):
        # patterns AB=1, ABG=2, BEDE=3, ED=4: k=4, initial=5, interiors from 6
        p = parse_pattern_bytes(b"AB\nABG\nBEDE\nED\n")
        t = build_trie(p)
        assert t.num_final_states == 4
        assert t.initial_state == 5
        assert t.num_states == 11
        # final state of pattern ID i is state i; AB's final state feeds ABG
        assert t.lookup(5, ord("A")) == 6
        assert t.lookup(6, ord("B")) == 1
        assert t.lookup(1, ord("G")) == 2   # final state reused as interior
        assert t.lookup(5, ord("B")) == 7
        assert t.lookup(7, ord("E")) == 8
        assert t.lookup(8, ord("D")) == 9
        assert t.lookup(9, ord("E")) == 3
        assert t.lookup(5, ord("E")) == 10
        assert t.lookup(10, ord("D")) == 4
        assert t.lookup(5, ord("Z")) == TRAP_STATE
        # leaves: finals with no outgoing transition = {2, 3, 4}
        assert t.num_leaves == 3

    def test_shared_prefix_single_path(self):
        p = patterns_from_list([b"abc", b"abd"])
        t = build_trie(p)
        # a->x, b->y shared; then c->1, d->2
        x = t.lookup(t.initial_state, ord("a"))
        y = t.lookup(x, ord("b"))
        assert t.lookup(y, ord("c")) == 1
        assert t.lookup(y, ord("d")) == 2


class TestDenseTable:
    def test_matches_trie(self):
        p = parse_pattern_bytes(b"AB\nABG\nBEDE\nED\n")
        t = build_trie(p)
        a = Automaton.from_parsed(p)
        d = a.ensure_dense()
        assert d.table.shape == (11, 256)
        for s in range(t.num_states):
            for ch in range(256):
                assert d.table[s, ch] == t.lookup(s, ch)


class TestHashTable:
    @pytest.mark.parametrize(
        "patterns",
        [
            [b"AB", b"ABG", b"BEDE", b"ED"],
            [b"s", b"h", b"he", b"she", b"hers", b"her", b"his", b"iis", b"is", b"ii"],
            [bytes([i]) for i in range(0, 256, 7)],  # wide fanout at init state
        ],
    )
    def test_hash_equals_dense(self, patterns):
        a = Automaton.from_patterns(patterns, dense=True, hashed=True)
        d, h = a.dense, a.hash
        for s in range(a.num_states):
            for ch in range(256):
                assert hash_lookup(h, s, ch) == d.table[s, ch], (s, ch)

    def test_init_row(self):
        a = Automaton.from_patterns([b"AB", b"ABG", b"BEDE", b"ED"], hashed=True)
        h = a.hash
        d = a.ensure_dense()
        assert h.init_row.tolist() == d.table[a.initial_state].tolist()

    def test_key_encoding(self):
        a = Automaton.from_patterns([b"AB"], hashed=True)
        h = a.hash
        # init state has one transition -> Si = 1, k = 1
        row = h.row_ptr[a.initial_state]
        assert row[0] >= 0
        assert (int(row[1]) & 0xFFFF) == 0        # Si - 1 == 0
        assert (int(row[1]) >> 16) == 1           # k == 1

    def test_compression_ratio_realistic(self):
        # many random patterns: hash table must be far smaller than dense
        rng = np.random.default_rng(0)
        pats = [bytes(rng.integers(97, 123, size=rng.integers(4, 12)).astype(np.uint8))
                for _ in range(300)]
        a = Automaton.from_patterns(pats, dense=True, hashed=True)
        dense_bytes = a.dense.size_in_bytes
        hash_bytes = a.hash.size_in_bytes + a.hash.row_ptr.size * 4 + 256 * 4
        assert hash_bytes < dense_bytes / 10


class TestDumpAndCheckpoint:
    def test_dump_format(self):
        a = Automaton.from_patterns([b"AB", b"ABG", b"BEDE", b"ED"])
        s = a.dump_transition_table()
        assert "# Transition table: number of states = 11, initial state = 5" in s
        assert "(   5,   A) -> 6" in s
        assert "(   1,   G) -> 2" in s
        assert "# Output table: number of final states = 4" in s
        assert '    1     1     2    "AB"' in s
        buf = io.StringIO()
        a.dump_transition_table(buf)
        assert buf.getvalue() == s

    def test_memory_usage_report(self):
        a = Automaton.from_patterns([b"AB", b"ABG", b"BEDE", b"ED"])
        rep = a.memory_usage("dense")
        assert "time-driven" in rep and "11 x 256 int" in rep
        rep2 = a.memory_usage("hash")
        assert "space-driven" in rep2 and "hashRowPtr" in rep2

    def test_save_load_roundtrip(self, tmp_path):
        a = Automaton.from_patterns([b"AB", b"ABG", b"BEDE", b"ED"],
                                    dense=True, hashed=True)
        path = os.path.join(tmp_path, "automaton.npz")
        a.save(path)
        b = Automaton.load(path)
        assert b.num_states == a.num_states
        assert b.initial_state == a.initial_state
        assert np.array_equal(b.dense.table, a.dense.table)
        assert np.array_equal(b.hash.val, a.hash.val)
        assert np.array_equal(b.hash.row_ptr, a.hash.row_ptr)
        assert b.sorted_patterns == a.sorted_patterns
        assert b.dump_transition_table() == a.dump_transition_table()


class TestIntrospectionExtras:
    def test_dump_reorder_pattern(self):
        from pfac_tpu import Automaton

        a = Automaton.from_patterns([b"AB", b"ABG", b"BEDE", b"ED"])
        s = a.dump_reorder_pattern()
        # lexicographic order with prefix-first tiebreak: AB, ABG, BEDE, ED
        lines = [l for l in s.splitlines() if not l.startswith("#")]
        ids = [int(l.split()[0]) for l in lines]
        assert ids == [1, 2, 3, 4]
        assert '"AB"' in lines[0] and '"ABG"' in lines[1]
        assert '"BEDE"' in lines[2] and '"ED"' in lines[3]

    def test_match_histogram(self):
        import numpy as np

        from pfac_tpu import Automaton, Matcher

        a = Automaton.from_patterns([b"AB", b"ABG", b"BEDE", b"ED"])
        m = Matcher(automaton=a, platform="cpu")
        hist = a.match_histogram(m.match(b"ABEDEDABG"))
        assert hist == {1: 1, 2: 1, 3: 1, 4: 2}
