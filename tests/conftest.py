"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU coverage happens in bench.py (driver-run); tests must be
deterministic and hardware-independent, per SURVEY.md §4.
"""
import os

# must happen before the first backend initialization anywhere in the session.
# NB: this image's sitecustomize imports jax at interpreter startup (axon TPU
# plugin), so env vars alone are captured too early — jax.config.update is the
# authoritative override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: pipeline programs (sieve kernel + walker +
# compaction branches) dominate suite wall time on first compile; repeat
# runs hit the cache and the suite drops to interpretation cost only
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pfac_tpu_test_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def fixtures_dir():
    return os.path.join(os.path.dirname(__file__))


@pytest.fixture(scope="session")
def example_pattern_path(fixtures_dir):
    return os.path.join(fixtures_dir, "pattern", "example_pattern")


@pytest.fixture(scope="session")
def example_input(fixtures_dir):
    with open(os.path.join(fixtures_dir, "data", "example_input"), "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def example_pattern2_path(fixtures_dir):
    return os.path.join(fixtures_dir, "pattern", "example_pattern2")


@pytest.fixture(scope="session")
def example_input2(fixtures_dir):
    with open(os.path.join(fixtures_dir, "data", "example_input2"), "rb") as f:
        return f.read()


def brute_force_match(patterns, data: bytes) -> np.ndarray:
    """Independent oracle: result[i] = ID of longest pattern starting at i.

    Ties (only possible for duplicate patterns) resolve to the later ID,
    matching the reference's dense-table overwrite order.
    """
    n = len(data)
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        best_id, best_len = 0, -1
        for pid, p in enumerate(patterns, start=1):
            lp = len(p)
            if lp >= best_len and data[i : i + lp] == p:
                best_id, best_len = pid, lp
        out[i] = best_id
    return out


@pytest.fixture(scope="session")
def oracle():
    return brute_force_match
