"""Pallas sieve kernel parity vs the golden model (interpret mode on CPU).

On real TPU the same code runs compiled; bench.py and the verify skill
exercise that path. Interpret mode validates kernel logic exactly —
including the in-kernel byte assembly (lane rolls + halo), the CHD probes,
the bitmap compaction, and the staged exact tail.
"""
import numpy as np
import pytest

from pfac_tpu import Automaton
from pfac_tpu.backends import golden
from pfac_tpu.backends.pallas_sieve import SieveMatcher, SieveTables
from pfac_tpu.core import chd


class TestChdWide:
    @pytest.mark.parametrize("n", [1, 13, 200])
    def test_exact_wide_roundtrip(self, n):
        rng = np.random.default_rng(n)
        keys = rng.choice(1 << 24, size=n, replace=False).astype(np.uint32)
        vals = rng.integers(1, 1 << 15, size=n).astype(np.uint32)
        t, kw = chd.build_exact_wide(keys, vals)
        for i in range(n):
            assert chd.lookup_exact_wide(t, kw, int(keys[i])) == int(vals[i])
        nonkeys = set(range(300)) - set(keys.tolist())
        assert all(chd.lookup_exact_wide(t, kw, k) == 0 for k in nonkeys)


def _sieve(patterns):
    a = Automaton.from_patterns(patterns)
    return a, SieveMatcher(a, interpret=True)


def _check(patterns, data):
    a, m = _sieve(patterns)
    expected = golden.match_dense(a, data)
    got = m.match(data)
    assert got.tolist() == expected.tolist(), (patterns, data)


class TestSieveMatcher:
    def test_readme_example(self):
        a, m = _sieve([b"AB", b"ABG", b"BEDE", b"ED"])
        assert m.match(b"ABEDEDABG").tolist() == [1, 3, 4, 0, 4, 0, 2, 0, 0]

    def test_len1_only(self):
        _check([b"x", b"y"], b"xyzyx")

    def test_len1_packed_table(self):
        # > _M1_CHAIN_MAX len-1 patterns: the u16-packed 1-plane m1 table,
        # odd and even byte values, through the sieve AND walker paths
        pats = [b"a", b"b", b"c", b"x", b"ab", b"abc", b"abcdef", b"xyzw"]
        from pfac_tpu.backends.pallas_sieve import SieveTables
        from pfac_tpu.core.automaton import Automaton
        t = SieveTables.build(Automaton.from_patterns(pats))
        assert t.m1_packed and t.m1 is not None and t.m1.shape[0] == 8
        _check(pats, b"zabcdefxyzwzzabacx")

    def test_len2_only(self):
        _check([b"ab", b"ba"], b"abab")

    def test_len3_only(self):
        _check([b"abc", b"bca", b"cab"], b"abcabcx")

    def test_each_depth_class(self):
        # one pattern in each kernel class: m1, m2, m3, alive/tail
        _check([b"q", b"qw", b"qwe", b"qwert"], b"qwertyqweqwq")

    def test_zero_byte_patterns(self):
        # key 0 probing an empty m2 slot must not clobber the m1 match
        _check([b"\x00", b"\x00\x01", b"ABC", b"ABCD"],
               b"\x00\x00\x01ABCDAB" + bytes(100))

    def test_match_at_very_end(self):
        # matches whose window touches n: every boundary mask in the kernel
        for tail in (b"qwert", b"qwe", b"qw", b"q"):
            _check([b"q", b"qw", b"qwe", b"qwert"], b"xxxx" + tail)

    def test_truncated_at_end_no_match(self):
        # pattern prefix runs off the end -> must NOT match
        _check([b"abcd"], b"zzzabc")
        _check([b"abc"], b"zzzab")

    def test_long_patterns_tail(self):
        pats = [b"abcdef", b"abq", b"zzzzzzzz"]
        _check(pats, b"xxabcdefyyabqzz" + b"z" * 10 + b"ab")

    def test_prefix_chains(self):
        _check([b"a", b"ab", b"abc", b"abcd", b"abcde"], b"abcdeabcxab")

    def test_shared_4byte_prefix(self):
        # several len>=4 patterns sharing the alive key
        _check([b"wxyzA", b"wxyzB", b"wxyz99", b"wxyQ"],
               b"..wxyzA..wxyz99..wxyzB..wxyQ..wxy")

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
        m = SieveMatcher(a, interpret=True)
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist(), (pats, data)

    def test_binary_and_boundary(self):
        pats = [bytes([0, 255]), bytes([255, 255, 255]), bytes([10])]
        _check(pats, bytes([0, 255, 255, 255, 10, 0, 255]))

    def test_block_boundary_straddle(self):
        # a match spanning the 65536-position grid-step boundary exercises
        # the halo row (the kernel reads c1..c3 across blocks)
        pat = b"HELLO"
        data = bytearray(np.zeros(70000, np.uint8))
        for off in (65534, 65535, 65533, 131067):
            if off + len(pat) <= len(data):
                data[off:off + len(pat)] = pat
        _check([pat], bytes(data))

    def test_match_reduce(self):
        a, m = _sieve([b"AB", b"ABG", b"BEDE", b"ED"])
        ids, pos, n = m.match_reduce(b"ABEDEDABG")
        assert (n, pos.tolist(), ids.tolist()) == (5, [0, 1, 2, 4, 6], [1, 3, 4, 4, 2])

    def test_match_reduce_device_ascending_across_sublanes(self):
        # matches spread across all 8 sublane rows of a 1024-position
        # block: positions must come back globally ASCENDING (the
        # reference zip order) — lane-major bit enumeration would
        # interleave them
        rng = np.random.default_rng(7)
        pats = [b"qq", b"zzz", b"wxyzab"]
        a, m = _sieve(pats)
        data = bytearray(rng.integers(97, 123, size=6000, dtype=np.uint8))
        for off in (0, 5, 129, 257, 300, 385, 700, 901, 1023, 1200, 2049,
                    3333, 5990):
            data[off:off + 6] = b"wxyzab"
        data = bytes(data)
        import jax
        ids, pos, count = m.match_reduce_device(
            jax.device_put(np.frombuffer(data, np.uint8)))
        m.flush_checks()
        c = int(count)
        g_ids, g_pos, g_n = golden.reduce_result(golden.match_dense(a, data))
        assert c == g_n
        assert np.asarray(pos)[:c].tolist() == g_pos.tolist()
        assert np.asarray(ids)[:c].tolist() == g_ids.tolist()

    def test_reduce_from_dense_chunked(self):
        # count spanning multiple reduce chunks exercises the rank-select
        # while_loop — call _reduce_rowgather directly: reduce_from_dense
        # routes to the scatter-max variant by default, which has no chunks
        from pfac_tpu.backends.xla import _reduce_rowgather
        import jax
        rng = np.random.default_rng(3)
        dense = np.where(rng.random(8192) < 0.3, 5, 0).astype(np.int32)
        ids, pos, count = jax.jit(
            lambda r: _reduce_rowgather(r, cap=512))(jax.device_put(dense))
        c = int(count)
        exp = np.flatnonzero(dense)
        assert c == exp.shape[0]
        assert np.asarray(pos)[:c].tolist() == exp.tolist()
        assert np.asarray(ids)[:c].tolist() == dense[exp].tolist()

    def test_reduce_variants_parity(self):
        # both device-reduce lowerings against numpy, across densities and
        # edge shapes (no matches, all matches, leading/trailing gaps)
        import jax
        from pfac_tpu.backends.xla import (_reduce_rowgather,
                                           _reduce_scatter_max)
        rng = np.random.default_rng(11)
        cases = [
            np.zeros(4096, np.int32),
            np.full(4096, 7, np.int32),
            np.where(rng.random(4096) < 0.03, 9, 0).astype(np.int32),
            np.where(rng.random(4096) < 0.6, 3, 0).astype(np.int32),
        ]
        lead = np.zeros(4096, np.int32)
        lead[2000:2010] = 5            # dest = -1 drop path before first
        cases.append(lead)
        for dense in cases:
            exp = np.flatnonzero(dense)
            for fn in (_reduce_scatter_max,
                       lambda r: _reduce_rowgather(r, cap=512)):
                ids, pos, count = jax.jit(fn)(jax.device_put(dense))
                c = int(count)
                assert c == exp.shape[0]
                assert np.asarray(pos)[:c].tolist() == exp.tolist()
                assert np.asarray(ids)[:c].tolist() == dense[exp].tolist()

    def test_survivors_beyond_light_cap_one_dispatch(self):
        # corpus where EVERY position is alive: survivors >> the light
        # capacity — the in-program mid/heavy switch handles it with no
        # host retry and no incorrect intermediate results
        a = Automaton.from_patterns([b"aaaaaaa"])
        m = SieveMatcher(a, interpret=True)
        m._cap = 64
        data = b"a" * 1000
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist()

    def test_deferred_flush_clean_on_dense_corpus(self):
        import jax

        a = Automaton.from_patterns([b"aaaaaaa"])
        m = SieveMatcher(a, interpret=True)
        m._cap = 64
        data_dev = jax.device_put(np.frombuffer(b"a" * 1000, dtype=np.uint8))
        out = m.match_device(data_dev)
        m.flush_checks()      # no heavy-stage overflow -> no raise
        expected = golden.match_dense(a, b"a" * 1000)
        assert np.asarray(out)[:1000].tolist() == expected.tolist()

    def test_way_too_many_patterns_rejected(self):
        from pfac_tpu.status import PfacError

        a = Automaton.from_patterns([b"ab"])
        a.num_final_states = 1 << 30  # alive flag uses bit 30
        with pytest.raises(PfacError):
            SieveTables.build(a)

    def test_large_ruleset_wide_ids(self):
        # > 32767 patterns: m2/m3 switch to the wide (key word + value
        # word) CHD encoding; IDs up to num_patterns must round-trip
        rng = np.random.default_rng(9)
        keys = rng.choice(1 << 16, size=34000, replace=False)
        pats = [bytes([k >> 8, k & 0xFF]) for k in keys]     # len-2, unique
        pats += [b"XYZq", b"XY"]                             # one len-4, dup-range
        a = Automaton.from_patterns(pats)
        assert a.num_final_states > 0x7FFF
        m = SieveMatcher(a, interpret=True)
        data = bytes(rng.integers(0, 256, size=3000).astype(np.uint8))
        data += pats[-2] + pats[0] + pats[17000]
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist()

    def test_duplicate_patterns_later_id_wins(self):
        _check([b"ab", b"ab", b"abc"], b"zabcab")


class TestExactGridBoundaries:
    @pytest.mark.parametrize("n", [65536 - 1, 65536, 65536 + 1])
    def test_corpus_length_at_grid_multiple(self, n):
        rng = np.random.default_rng(n)
        pats = [b"ab", b"abc", b"abcd", b"d"]
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        data = bytearray(rng.integers(97, 101, size=n, dtype=np.uint8).tobytes())
        data[-4:] = b"abcd"      # match touching the exact end
        data = bytes(data)
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist()

    def test_count_exactly_cap(self):
        # survivors == cap exactly must not trigger overflow retry
        a = Automaton.from_patterns([b"wxyz!"])
        m = SieveMatcher(a, interpret=True)
        m._cap = 8
        data = bytearray(2000)
        for i in range(8):
            data[i * 100: i * 100 + 5] = b"wxyz!"
        got = m.match(bytes(data))
        expected = golden.match_dense(a, bytes(data))
        assert got.tolist() == expected.tolist()
        assert m._cap == 8  # no growth happened


class TestHeavyRegime:
    def test_virus_dense_heavy_branch(self, monkeypatch):
        # corpus of concatenated patterns: shrink the heavy round size so
        # the in-program walker rounds loop on a small corpus
        import pfac_tpu.backends.pallas_sieve as S

        monkeypatch.setattr(S, "HEAVY_CAP", 1024)
        rng = np.random.default_rng(5)
        pats = []
        for _ in range(20):
            ln = int(np.clip(rng.gamma(2.2, 9.0) + 4, 4, 40))
            pats.append(bytes(rng.integers(97, 103, size=ln).astype(np.uint8)))
        pats = list(dict.fromkeys(pats))
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        m._cap = 64
        chunks = [pats[int(rng.integers(0, len(pats)))] for _ in range(300)]
        data = b"".join(chunks)[:3500]
        expected = golden.match_dense(a, data)
        got = m.match(data)
        assert np.array_equal(got, expected)

    def test_heavy_multiple_rounds(self):
        # >HEAVY_CAP survivors: the in-program while loop runs 3 rounds
        rng = np.random.default_rng(6)
        pats = [b"aaaa", b"aaaaaaaaaa", b"bbbbb"]
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        data = (b"aaaa" * 40000) + b"bbbbb" * 100   # ~160K survivors
        expected = golden.match_dense(a, data)
        got = m.match(data)
        assert np.array_equal(got, expected)

    def test_per_index_tier_spans_all_tiers(self, monkeypatch):
        # tier A (per-index in-loop scatters) plus tier B (buffered) plus
        # the direct tail, all in one dispatch: survivors span
        # light + PER_IDX_ROUNDS + R_BUF_ROUNDS rounds and beyond.
        # PER_IDX_NPAD_MIN is forced to 0 — real corpora only enable
        # tier A above the full-output-pass crossover.
        import pfac_tpu.backends.pallas_sieve as S

        monkeypatch.setattr(S, "HEAVY_CAP", 1024)
        monkeypatch.setattr(S, "R_BUF_ROUNDS", 2)
        monkeypatch.setattr(S, "PER_IDX_ROUNDS", 2)
        monkeypatch.setattr(S, "PER_IDX_NPAD_MIN", 0)
        pats = [b"aaaa", b"aaaaaaaaaa", b"bbbbb"]
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        m._cap = 512
        data = (b"aaaa" * 2500) + b"bbbbb" * 20      # ~10K survivors
        expected = golden.match_dense(a, data)
        got = m.match(data)
        assert np.array_equal(got, expected)

    def test_per_index_tier_only(self, monkeypatch):
        # survivors that fit entirely inside tier A: the buffered loop
        # and tail run zero iterations
        import pfac_tpu.backends.pallas_sieve as S

        monkeypatch.setattr(S, "HEAVY_CAP", 1024)
        monkeypatch.setattr(S, "PER_IDX_ROUNDS", 4)
        monkeypatch.setattr(S, "PER_IDX_NPAD_MIN", 0)
        pats = [b"xyzw", b"xyzwxyzw"]
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        m._cap = 512
        data = b"xyzw" * 700 + b"-" * 100            # ~2.8K survivors
        expected = golden.match_dense(a, data)
        got = m.match(data)
        assert np.array_equal(got, expected)

    def test_heavy_rounds_past_buffer(self, monkeypatch):
        # survivors past R_BUF_ROUNDS * HEAVY_CAP: the deferred-scatter
        # buffer fills and the direct-scatter tail loop finishes the rest
        import pfac_tpu.backends.pallas_sieve as S

        monkeypatch.setattr(S, "HEAVY_CAP", 1024)
        monkeypatch.setattr(S, "R_BUF_ROUNDS", 2)
        pats = [b"aaaa", b"aaaaaaaaaa", b"bbbbb"]
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        m._cap = 512
        data = (b"aaaa" * 2500) + b"bbbbb" * 20      # ~10K survivors
        expected = golden.match_dense(a, data)
        got = m.match(data)
        assert np.array_equal(got, expected)


class TestFusedChd:
    def test_exact2_roundtrip(self):
        rng = np.random.default_rng(3)
        keys = rng.choice(1 << 16, size=300, replace=False).astype(np.uint32)
        vals = rng.integers(1, 1 << 15, size=300).astype(np.uint32)
        t = chd.build_exact2(keys, vals)
        for i in range(300):
            assert chd.lookup_exact2(t, int(keys[i])) == int(vals[i])
        miss = [k for k in range(500) if k not in set(keys.tolist())]
        assert all(chd.lookup_exact2(t, k) == 0 for k in miss)

    def test_exact_wide2_roundtrip(self):
        rng = np.random.default_rng(4)
        keys = rng.choice(1 << 24, size=150, replace=False).astype(np.uint32)
        vals = rng.integers(1, 1 << 20, size=150).astype(np.uint32)
        t, kw = chd.build_exact_wide2(keys, vals)
        for i in range(150):
            assert chd.lookup_exact_wide2(t, kw, int(keys[i])) == int(vals[i])
        miss = [k for k in range(400) if k not in set(keys.tolist())]
        assert all(chd.lookup_exact_wide2(t, kw, k) == 0 for k in miss)

    def test_resid2_no_false_negatives(self):
        rng = np.random.default_rng(5)
        keys = rng.choice(1 << 28, size=1500, replace=False).astype(np.uint32)
        t = chd.build_resid2(keys)
        assert all(chd.lookup_resid2(t, int(k)) for k in keys)
        miss = [k for k in range(40000) if k not in set(keys.tolist())]
        fp = sum(chd.lookup_resid2(t, k) for k in miss) / len(miss)
        assert fp < 0.01

    def test_nodisp_builders(self):
        rng = np.random.default_rng(6)
        keys = rng.choice(1 << 16, size=40, replace=False).astype(np.uint32)
        vals = rng.integers(1, 1 << 15, size=40).astype(np.uint32)
        t = chd.build_exact2_nodisp(keys, vals)
        assert t is not None
        lg_r = int(np.log2(t.num_slots))
        slots = [chd.lookup_nodisp(t, int(k)) for k in keys]
        assert len(set(slots)) == len(keys)          # perfect
        for i, k in enumerate(keys):
            w = int(np.uint32(t.slot_words[slots[i]]))
            assert (w >> 16) == int(k) and (w & 0x7FFF) == int(vals[i])

        tw = chd.build_exact_wide2_nodisp(keys.astype(np.uint32),
                                          vals.astype(np.uint32))
        assert tw is not None


class TestCheckpointedAutomaton:
    def test_saved_loaded_automaton_through_sieve(self, tmp_path):
        # checkpoint/resume (Automaton.save/load) must feed every engine
        pats = [b"q", b"qw", b"qwe", b"qwert", b"hello"]
        a = Automaton.from_patterns(pats)
        path = str(tmp_path / "a.npz")
        a.save(path)
        b = Automaton.load(path)
        m = SieveMatcher(b, interpret=True)
        data = b"xxqwertyhelloqw"
        expected = golden.match_dense(a, data)
        assert m.match(data).tolist() == expected.tolist()


class TestTileGeometry:
    def test_full_production_geometry_smoke(self):
        # one smoke at the compiled path's (512,128) geometry; every other
        # interpret test uses the small (64,128) tiles for suite speed
        a = Automaton.from_patterns([b"AB", b"ABG", b"BEDE", b"ED"])
        m = SieveMatcher(a, interpret=True, tile_rows=512)
        assert m.match(b"ABEDEDABG").tolist() == [1, 3, 4, 0, 4, 0, 2, 0, 0]

    def test_geometries_agree(self):
        rng = np.random.default_rng(11)
        pats = [b"ab", b"abc", b"abcd", b"dd", b"q"]
        a = Automaton.from_patterns(pats)
        data = bytes(rng.integers(97, 101, size=9000, dtype=np.uint8).tobytes())
        expected = golden.match_dense(a, data)
        for tr in (64, 128):
            m = SieveMatcher(a, interpret=True, tile_rows=tr)
            assert m.match(data).tolist() == expected.tolist(), tr

    def test_bad_tile_rows_rejected(self):
        from pfac_tpu.status import PfacError

        a = Automaton.from_patterns([b"ab"])
        m = SieveMatcher(a, interpret=True, tile_rows=48)
        with pytest.raises(PfacError):
            m.match(b"ababab")



class TestDenseBlockEscape:
    """The in-kernel dense-block escape (all-match regimes): blocks whose
    survivor count crosses block_positions/DENSE_ESCAPE_DIV walk every
    position in-kernel and zero their bitmaps (reference Benchmark I,
    PFAC/doc/PFAC_hash_draft.pdf Table 4)."""

    def test_all_match_single_pattern(self):
        a = Automaton.from_patterns([b"aaaa"])
        m = SieveMatcher(a, interpret=True)
        data = b"a" * 3000
        exp = golden.match_dense_batch(a, data)
        assert np.array_equal(m.match(data), exp)

    def test_mixed_density_blocks_and_deep_patterns(self):
        rng = np.random.default_rng(3)
        pats = [bytes(rng.integers(0, 256, size=int(l), dtype=np.uint8))
                for l in list(rng.integers(1, 4, size=10))
                + list(rng.integers(4, 30, size=60))]
        pats = list(dict.fromkeys(pats)) + [b"zzzz", b"zzzzzzzz"]
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        n = 3 * 8192 + 1111          # several blocks at tile_rows=64
        d = rng.integers(0, 256, size=n, dtype=np.uint8)
        d[8192:16384] = ord("z")     # middle block escapes; others sparse
        for i in range(0, n - 40, 177):
            p = pats[int(rng.integers(0, len(pats)))]
            d[i:i + len(p)] = np.frombuffer(p, np.uint8)
        exp = golden.match_dense_batch(a, bytes(d))
        assert np.array_equal(m.match(bytes(d)), exp)

    def test_escape_block_boundary_straddle(self):
        # a long match STARTING in an escaped block must resolve through
        # the halo bytes of the next block
        pats = [b"z" * 40]
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        n = 2 * 8192
        d = np.zeros(n, np.uint8)
        d[8192 - 20: 8192 + 60] = ord("z")   # straddles the block edge
        d[:8192] = ord("z")                  # block 0 all-survivor
        exp = golden.match_dense_batch(a, bytes(d))
        assert np.array_equal(m.match(bytes(d)), exp)


class TestKernelVariants:
    """The A/B-able kernel structures (experiments/kernel_ab2.py) must all
    be bit-exact: select-tree vs linear plane merge, split vs fused
    loops, unroll widths."""

    @pytest.mark.parametrize("tree,split,unroll", [
        (False, True, 8), (True, True, 4), (True, False, 8),
    ])
    def test_variants_exact(self, tree, split, unroll):
        import jax.numpy as jnp
        import pfac_tpu.backends.pallas_sieve as S

        rng = np.random.default_rng(11)
        pats = [bytes(rng.integers(0, 256, size=int(l), dtype=np.uint8))
                for l in list(rng.integers(1, 4, size=8))
                + list(rng.integers(4, 14, size=40))]
        pats = list(dict.fromkeys(pats))
        a = Automaton.from_patterns(pats)
        t = SieveTables.build(a)
        wt = S.build_walk_tables_gated(a, t)
        n = 4096
        data = rng.integers(0, 256, size=n, dtype=np.uint8)
        for i in range(0, n - 16, 53):
            p = pats[int(rng.integers(0, len(pats)))]
            data[i:i + len(p)] = np.frombuffer(p, np.uint8)
        exp = golden.match_dense_batch(a, bytes(data))
        npad = S.npad_for(n, 64)
        datap = np.pad(data, (0, npad - n))
        args = ([jnp.asarray(x) for x in t.arrays]
                + [jnp.asarray(x) for x in wt.arrays])
        old = S.LOOKUP_TREE_MIN
        try:
            S.LOOKUP_TREE_MIN = 4 if tree else (1 << 30)
            fn = S.build_pipeline(
                a, t, npad=npad, cap=1024, interpret=True, aligned=True,
                tile_rows=64, walk_tables=wt, unroll=unroll,
                split_loops=split)
            out, _, _ = fn(args, jnp.zeros(1, jnp.int32),
                           jnp.asarray(datap),
                           jnp.full((1,), n, jnp.int32))
            assert np.array_equal(np.asarray(out)[:n], exp)
        finally:
            S.LOOKUP_TREE_MIN = old

    def test_resid8_forced_exact(self, monkeypatch):
        """Forcing 8-bit alive residuals (the kernel_ab2 resid8 arm /
        VERDICT r3 lever b) only ADDS ~2^-8 false survivors, which the
        exact walk kills — the full pipeline stays bit-exact."""
        import jax.numpy as jnp
        import pfac_tpu.backends.pallas_sieve as S

        monkeypatch.setattr(S, "_RESID8_THRESHOLD", 0)
        rng = np.random.default_rng(12)
        pats = [bytes(rng.integers(0, 256, size=int(l), dtype=np.uint8))
                for l in list(rng.integers(1, 4, size=6))
                + list(rng.integers(4, 14, size=40))]
        pats = list(dict.fromkeys(pats))
        a = Automaton.from_patterns(pats)
        t = SieveTables.build(a)
        assert t.alive is not None and t.alive.resid_bits == 8
        wt = S.build_walk_tables_gated(a, t)
        n = 4096
        data = rng.integers(0, 256, size=n, dtype=np.uint8)
        for i in range(0, n - 16, 53):
            p = pats[int(rng.integers(0, len(pats)))]
            data[i:i + len(p)] = np.frombuffer(p, np.uint8)
        exp = golden.match_dense_batch(a, bytes(data))
        npad = S.npad_for(n, 64)
        datap = np.pad(data, (0, npad - n))
        args = ([jnp.asarray(x) for x in t.arrays]
                + [jnp.asarray(x) for x in wt.arrays])
        fn = S.build_pipeline(
            a, t, npad=npad, cap=1024, interpret=True, aligned=True,
            tile_rows=64, walk_tables=wt)
        out, _, _ = fn(args, jnp.zeros(1, jnp.int32),
                       jnp.asarray(datap),
                       jnp.full((1,), n, jnp.int32))
        assert np.array_equal(np.asarray(out)[:n], exp)


class TestAliveStructures:
    """Alternative alive-filter structures: the bucket-fingerprint form
    (kept as a measured A/B arm — it LOST on chip, logs_r5/alive_ab.log)
    and the big-tier XLA entry filter (no in-kernel alive at all past
    _ALIVE_CHD_MAX keys)."""

    def _ruleset(self, seed=13, deep=40):
        rng = np.random.default_rng(seed)
        pats = [bytes(rng.integers(0, 256, size=int(l), dtype=np.uint8))
                for l in list(rng.integers(1, 4, size=6))
                + list(rng.integers(4, 14, size=deep))]
        return list(dict.fromkeys(pats)), rng

    def test_bucket2_no_false_negatives(self):
        from pfac_tpu.core import chd

        rng = np.random.default_rng(5)
        for n in (3, 64, 1500):
            ks = np.unique(rng.integers(0, 1 << 32, size=n,
                                        dtype=np.uint64).astype(np.uint32))
            for delta in (-1, 0):
                t = chd.build_bucket2(ks, lg_m_delta=delta)
                assert all(chd.lookup_bucket2(t, int(k)) for k in ks)

    def test_bucket2_end_to_end(self, monkeypatch):
        import pfac_tpu.backends.pallas_sieve as S

        monkeypatch.setattr(S, "ALIVE_BUCKET2_MAX", 1 << 20)
        pats, rng = self._ruleset()
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        assert m.tables.alive is not None and m.tables.alive.bucket2
        n = 4096
        d = rng.integers(0, 256, size=n, dtype=np.uint8)
        for i in range(0, n - 16, 53):
            p = pats[int(rng.integers(0, len(pats)))]
            d[i:i + len(p)] = np.frombuffer(p, np.uint8)
        d = bytes(d)
        assert np.array_equal(m.match(d), golden.match_dense_batch(a, d))

    def test_big_tier_entry_filter(self, monkeypatch):
        # alive keys past _ALIVE_CHD_MAX: no in-kernel alive filter; the
        # pipeline's survivors come from xla_csr.entry_filter_bits
        import pfac_tpu.backends.pallas_sieve as S

        monkeypatch.setattr(S, "_ALIVE_CHD_MAX", 4)
        pats, rng = self._ruleset(seed=14, deep=30)
        a = Automaton.from_patterns(pats)
        m = SieveMatcher(a, interpret=True)
        assert m.tables.alive is None and m.csr_tables is not None
        assert m.csr_tables.fkeys is not None
        n = 3000
        d = bytearray(rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
        for i in range(0, n - 16, 101):
            p = pats[int(rng.integers(0, len(pats)))]
            d[i:i + len(p)] = p
        deep = [p for p in pats if len(p) >= 4][0]
        d[n - len(deep):] = deep          # match at the very end
        d = bytes(d)
        assert np.array_equal(m.match(d), golden.match_dense_batch(a, d))


class TestRankSelect:
    """_rank_select / _rank_select_gather: the row-gather rank-select
    forms (r5) must match the reference nonzero semantics at every
    density, including non-128-multiple lengths and zero/full flags."""

    def test_rank_select_property(self):
        import jax.numpy as jnp
        from pfac_tpu.backends.pallas_sieve import (_rank_select,
                                                    _rank_select_gather)

        rng = np.random.default_rng(0)
        for nf in (5, 128, 200, 1024, 5000):
            for density in (0.0, 0.03, 0.5, 1.0):
                flags = rng.random(nf) < density
                for cap in (8, 1024):
                    idx, cnt = _rank_select(jnp.asarray(flags), cap)
                    idx, cnt = np.asarray(idx), int(cnt)
                    exp = np.nonzero(flags)[0]
                    assert cnt == len(exp)
                    k = min(cap, cnt)
                    assert np.array_equal(idx[:k], exp[:k])
                    assert (idx[k:] == nf).all()
                    v = rng.integers(0, 1000, nf).astype(np.int32)
                    i2, c2, gv = _rank_select_gather(
                        jnp.asarray(flags), cap, jnp.asarray(v))
                    assert int(c2) == cnt
                    assert np.array_equal(np.asarray(i2), idx)
                    assert np.array_equal(np.asarray(gv)[:k], v[exp[:k]])
