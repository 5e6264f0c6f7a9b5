"""Distributed matching on the virtual 8-device CPU mesh.

The determinism contract: sharded results must equal single-device results
byte-for-byte, including matches spanning shard boundaries (the halo path)
— the TPU equivalent of the reference's multi-GPU verification loop
(reference: PFAC/test/omp_PFAC.cpp:396-439).
"""
import jax
import numpy as np
import pytest

from pfac_tpu import Automaton
from pfac_tpu.backends import golden
from pfac_tpu.dist.sharding import ShardedMatcher, make_data_mesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual CPU devices"
    return make_data_mesh(8)


class TestShardedMatcher:
    def test_readme_example(self, mesh8, example_pattern_path, example_input):
        a = Automaton.from_pattern_file(example_pattern_path)
        sm = ShardedMatcher(a, mesh=mesh8, tile=4)
        assert sm.match(example_input).tolist() == [1, 3, 4, 0, 4, 0, 2, 0, 0, 0]

    def test_boundary_spanning_matches(self, mesh8):
        # pattern crosses every shard boundary: halo exchange must resolve it
        a = Automaton.from_patterns([b"xyzw"])
        tile = 8
        n = 8 * tile  # one tile per device
        data = bytearray(b"a" * n)
        for b in range(tile - 2, n - 4, tile):  # straddle each boundary
            data[b : b + 4] = b"xyzw"
        data = bytes(data)
        sm = ShardedMatcher(a, mesh=mesh8, tile=tile)
        expected = golden.match_dense(a, data)
        assert sm.match(data).tolist() == expected.tolist()

    @pytest.mark.parametrize("perf_mode", ["dense", "hash"])
    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_vs_golden(self, mesh8, perf_mode, seed):
        rng = np.random.default_rng(seed)
        alpha = rng.integers(0, 256, size=4).astype(np.uint8)
        pats = [
            bytes(alpha[rng.integers(0, 4, size=int(rng.integers(1, 7)))])
            for _ in range(int(rng.integers(1, 8)))
        ]
        data = bytes(alpha[rng.integers(0, 4, size=333)])
        a = Automaton.from_patterns(pats, hashed=(perf_mode == "hash"))
        sm = ShardedMatcher(a, mesh=mesh8, perf_mode=perf_mode, tile=16)
        expected = golden.match_dense(a, data)
        got = sm.match(data)
        assert got.tolist() == expected.tolist()

    def test_match_count_psum(self, mesh8):
        a = Automaton.from_patterns([b"ab"])
        data = b"ab" * 64
        sm = ShardedMatcher(a, mesh=mesh8, tile=8)
        assert sm.match_count(data) == 64

    def test_match_reduce(self, mesh8):
        a = Automaton.from_patterns([b"AB", b"ABG", b"BEDE", b"ED"])
        sm = ShardedMatcher(a, mesh=mesh8, tile=4)
        ids, pos, n = sm.match_reduce(b"ABEDEDABG")
        assert (n, pos.tolist(), ids.tolist()) == (5, [0, 1, 2, 4, 6], [1, 3, 4, 4, 2])

    def test_input_smaller_than_mesh(self, mesh8):
        a = Automaton.from_patterns([b"ab"])
        sm = ShardedMatcher(a, mesh=mesh8, tile=4)
        assert sm.match(b"ab").tolist() == [1, 0]

    def test_subset_mesh(self):
        a = Automaton.from_patterns([b"ab"])
        mesh2 = make_data_mesh(2)
        sm = ShardedMatcher(a, mesh=mesh2, tile=8)
        data = b"xxabxx" * 10
        assert sm.match(data).tolist() == golden.match_dense(a, data).tolist()


class TestShardedSieve:
    """The Pallas sieve engine under shard_map (interpret mode on the CPU
    mesh; on TPU meshes engine="auto" selects it compiled)."""

    def test_boundary_matches_vs_golden(self, mesh8):
        rng = np.random.default_rng(3)
        pats = [b"q", b"qw", b"qwe", b"qwert", b"hello", b"lo wor"]
        a = Automaton.from_patterns(pats)
        sm = ShardedMatcher(a, mesh=mesh8, engine="sieve", interpret=True)
        n = 2 * 65536 * 8 + 12345
        data = bytearray(rng.integers(97, 123, size=n, dtype=np.uint8).tobytes())
        sl = sm._shard_len(n)
        for b in range(sl, n - 8, sl):          # straddle every shard boundary
            data[b - 3:b + 3] = b"qwerth"[:6]
        data[:5] = b"hello"
        data[-5:] = b"hello"
        data = bytes(data)
        expected = golden.match_dense(a, data)
        assert np.array_equal(sm.match(data), expected)
        assert sm.match_count(data) == int((expected > 0).sum())

    def test_moderate_survivor_density(self, mesh8):
        # survivors per shard beyond the light capacity: handled by the
        # in-program mid branch, no host retries
        a = Automaton.from_patterns([b"aaaaaaa", b"bq"])
        sm = ShardedMatcher(a, mesh=mesh8, engine="sieve", interpret=True)
        rng = np.random.default_rng(0)
        data = bytearray(rng.integers(98, 122, size=65536 * 8, dtype=np.uint8).tobytes())
        for off in range(0, len(data) - 8, 500):   # ~130 survivors per shard
            data[off:off + 7] = b"aaaaaaa"
        data = bytes(data)
        expected = golden.match_dense(a, data)
        assert np.array_equal(sm.match(data), expected)

    def test_csr_tier_sharded(self, mesh8, monkeypatch):
        # wide-ID/big rulesets take the CSR walker tail inside each shard;
        # sharded output must still equal golden, including boundary
        # matches resolved through the halo
        import pfac_tpu.backends.pallas_sieve as S
        monkeypatch.setattr(S, "build_walk_tables_gated", lambda *args: None)
        a = Automaton.from_patterns([b"abcdefgh", b"bcq", b"defghijk"])
        sm = ShardedMatcher(a, mesh=mesh8, engine="sieve", interpret=True)
        assert sm._csr_tables is not None
        rng = np.random.default_rng(7)
        data = bytearray(
            rng.integers(97, 123, size=4096 * 8, dtype=np.uint8).tobytes())
        shard = len(data) // 8
        for off in range(0, len(data) - 16, 333):
            data[off:off + 8] = b"abcdefgh"
        for b in range(1, 8):       # straddle every shard boundary
            data[b * shard - 3:b * shard + 5] = b"abcdefgh"
        data = bytes(data)
        expected = golden.match_dense(a, data)
        assert np.array_equal(sm.match(data), expected)

    def test_pathological_corpus_handled(self, mesh8):
        # every position alive: the per-shard in-program heavy rounds
        # (or, on stage overflow, the XLA fallback) must stay exact
        a = Automaton.from_patterns([b"aaaaaaa"])
        sm = ShardedMatcher(a, mesh=mesh8, engine="sieve", interpret=True)
        data = b"a" * (65536 * 8)
        expected = golden.match_dense(a, data)
        assert np.array_equal(sm.match(data), expected)


class TestMultihostGlue:
    """dist/multihost.py helpers on the virtual mesh (single process owning
    all 8 'hosts'' devices — the shard-slice math must still hold)."""

    def test_host_shard_slice_covers_everything(self, mesh8):
        from pfac_tpu.dist import multihost

        shard_len = 128
        n_total = 8 * shard_len
        start, stop = multihost.host_shard_slice(n_total, shard_len)
        assert (start, stop) == (0, n_total)  # this process owns all devices

    def test_put_host_shards_roundtrip(self, mesh8):
        import jax
        import numpy as np

        from pfac_tpu.dist import multihost

        a = Automaton.from_patterns([b"ab"])
        sm = ShardedMatcher(a, mesh=mesh8, tile=8)
        total = 8 * 16
        local = np.arange(total, dtype=np.uint8)
        arr = multihost.put_host_shards(sm, local, total)
        assert arr.shape == (total,)
        assert np.array_equal(np.asarray(arr), local)


class TestShardedDeviceReduce:
    def test_sieve_reduce_matches_golden(self, mesh8):
        # device-side per-shard compaction: ids/pos must equal the golden
        # reduce, including matches that straddle shard boundaries
        rng = np.random.default_rng(21)
        pats = [b"wxyz!", b"wx", b"q", b"wxyzab"]
        a = Automaton.from_patterns(pats)
        sm = ShardedMatcher(a, mesh=mesh8, engine="sieve", interpret=True)
        n = 5000
        data = bytearray(rng.integers(97, 123, size=n, dtype=np.uint8).tobytes())
        shard = sm._shard_len(n)
        for b in range(shard - 3, n - 8, shard):   # straddle boundaries
            data[b:b + 6] = b"wxyzab"
        data = bytes(data)
        ids, pos, count = sm.match_reduce(data)
        g_ids, g_pos, g_count = golden.reduce_result(golden.match_dense(a, data))
        assert count == g_count
        assert pos.tolist() == g_pos.tolist()
        assert ids.tolist() == g_ids.tolist()
        assert pos.dtype == np.int64

    def test_reduce_cap_overflow_falls_back(self, mesh8):
        a = Automaton.from_patterns([b"ab"])
        sm = ShardedMatcher(a, mesh=mesh8, engine="sieve", interpret=True,
                            reduce_cap=4)
        data = b"ab" * 400                      # >4 matches per shard
        ids, pos, count = sm.match_reduce(data)
        g_ids, g_pos, g_count = golden.reduce_result(golden.match_dense(a, data))
        assert (count, pos.tolist(), ids.tolist()) == (
            g_count, g_pos.tolist(), g_ids.tolist())


class TestShardedDenseEscape:
    """All-match corpora on the tail-split layout: every shard's blocks
    cross the dense-block escape threshold; the last real block's
    lookahead must come from the tail buffer (next shard's head)."""

    def test_all_match_across_shards(self, mesh8):
        import numpy as np
        from pfac_tpu import Automaton
        from pfac_tpu.backends import golden
        from pfac_tpu.dist.sharding import ShardedMatcher

        a = Automaton.from_patterns([b"aaaa", b"a" * 40, b"abab"])
        sm = ShardedMatcher(a, mesh=mesh8, engine="sieve", interpret=True)
        n = 8 * 8192 + 777
        d = np.full(n, ord("a"), np.uint8)
        d[3000:3010] = ord("b")
        exp = golden.match_dense_batch(a, bytes(d))
        assert np.array_equal(sm.match(bytes(d)), exp)
        assert sm.match_count(bytes(d)) == int((exp > 0).sum())


def test_xla_fallback_direct_reshard(mesh8):
    """The overflow fallback must consume the sieve-sharded device buffer
    directly (same shard length — no host round trip) and stay exact."""
    import numpy as np
    from pfac_tpu import Automaton
    from pfac_tpu.backends import golden
    from pfac_tpu.dist.sharding import ShardedMatcher

    rng = np.random.default_rng(4)
    pats = [b"abcd", b"abcdefgh", b"xy"]
    a = Automaton.from_patterns(pats)
    sm = ShardedMatcher(a, mesh=mesh8, engine="sieve", interpret=True)
    n = 8 * 8192 + 100
    d = rng.integers(0, 256, size=n, dtype=np.uint8)
    for i in range(0, n - 16, 97):
        d[i:i + 4] = np.frombuffer(b"abcd", np.uint8)
    shard_len = sm._shard_len(n)
    data_dev = sm._put(d, shard_len)
    run = sm._xla_fallback_fn(n)
    matches, count = run(data_dev)
    exp = golden.match_dense_batch(a, bytes(d))
    got = np.asarray(matches)[:n]
    assert np.array_equal(got, exp)
    assert int(count) == int((exp > 0).sum())
