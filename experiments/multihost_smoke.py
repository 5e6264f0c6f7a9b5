"""Two-process jax.distributed smoke test of the multi-host match path.

Each process contributes 4 virtual CPU devices to one 8-device global
mesh; the corpus is fed per-host via dist.multihost helpers and matched
with the sharded engine. Process 0 verifies against the golden model.

Run:  python experiments/multihost_smoke.py          (spawns both procs)
      python experiments/multihost_smoke.py --proc N (worker entry)
"""
import os
import subprocess
import sys
from pathlib import Path

ROOT = str(Path(__file__).resolve().parent.parent)
PORT = 12421
NPROC = 2
LOCAL_DEVS = 4


def worker(proc_id: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=proc_id,
        local_device_ids=list(range(LOCAL_DEVS)),
    )
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * LOCAL_DEVS

    import numpy as np

    sys.path.insert(0, ROOT)
    from pfac_tpu import Automaton
    from pfac_tpu.backends import golden
    from pfac_tpu.dist import multihost
    from pfac_tpu.dist.sharding import ShardedMatcher

    pats = [b"q", b"qw", b"qwe", b"qwert", b"hello"]
    a = Automaton.from_patterns(pats)
    mesh = multihost.global_mesh()

    # deterministic global corpus; every process derives the same bytes
    rng = np.random.default_rng(11)
    n = 8 * 512 + 77
    buf = bytearray(rng.integers(97, 123, size=n, dtype=np.uint8).tobytes())
    buf[:5] = b"hello"
    expected = golden.match_dense(a, bytes(buf))
    exp_count = int((expected > 0).sum())

    # both engines cross the process boundary: the XLA lockstep walker
    # and the sieve pipeline (interpret on CPU devices; the ppermute
    # halo + tail_split layout are identical to the compiled TPU path)
    for engine in ("xla", "sieve"):
        sm = ShardedMatcher(a, mesh=mesh, tile=256, engine=engine,
                            interpret=engine == "sieve")
        sl = sm._shard_len(n)
        data = bytearray(buf)
        for b in range(sl, n - 6, sl):
            data[b - 2:b + 3] = b"qwert"
        data = bytes(data)
        expected = golden.match_dense(a, data)
        exp_count = int((expected > 0).sum())

        # per-host feeding: this process loads only its own slice
        total = sl * sm.num_devices
        padded = np.zeros(total, dtype=np.uint8)
        padded[:n] = np.frombuffer(data, np.uint8)
        start, stop = multihost.host_shard_slice(total, sl)
        arr = multihost.put_host_shards(sm, padded[start:stop], total)

        matches, count = sm.match_device(arr, n)
        count = int(count)
        assert count == exp_count, (engine, count, exp_count)
        # each process checks its own addressable shards of the result
        for shard in matches.addressable_shards:
            lo = shard.index[0].start or 0
            local = np.asarray(shard.data)
            hi = min(lo + local.shape[0], n)
            if hi > lo:
                assert np.array_equal(local[: hi - lo], expected[lo:hi]), (
                    f"proc {proc_id} {engine} shard at {lo} mismatches"
                )
        print(f"[proc {proc_id}] {engine} OK: count={count}, "
              f"{len(jax.devices())} global devices, "
              f"{len(jax.local_devices())} local")


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--proc":
        worker(int(sys.argv[2]))
        return 0
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={LOCAL_DEVS}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--proc", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(NPROC)
    ]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=480)
        text = out.decode(errors="replace")
        tail = "\n".join(text.strip().splitlines()[-4:])
        print(f"--- proc {i} (rc={p.returncode}) ---\n{tail}")
        rc |= p.returncode
    print("MULTIHOST SMOKE:", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    sys.exit(main())
