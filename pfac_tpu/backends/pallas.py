"""Pallas TPU kernel backend (placeholder wiring; kernels land separately).

`try_build` returns None when no Pallas kernel is applicable, letting the
runtime fall back to the XLA backend.
"""
from __future__ import annotations

from ..status import PfacError, PfacStatus


def try_build(automaton, mode, *, placement, tile, device, required: bool):
    if required:
        raise PfacError(
            PfacStatus.INVALID_PARAMETER,
            "pallas backend not yet available for this configuration",
        )
    return None
