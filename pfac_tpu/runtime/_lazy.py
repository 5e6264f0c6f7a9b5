"""Lazy JAX helpers so importing pfac_tpu never forces device init."""
from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def cpu_device():
    import jax

    return jax.devices("cpu")[0]
