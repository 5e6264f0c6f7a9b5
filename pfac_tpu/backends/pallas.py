"""Pallas backend selection.

`try_build` returns the Pallas sieve matcher when it supports the
configuration, else None (the runtime falls back to the XLA matcher —
which is also the correct engine for automatons whose tables exceed the
VMEM budget). On non-TPU default backends the kernel runs only in
interpret mode, which is for testing — `required=True`
(backend="pallas") forces it anyway.
"""
from __future__ import annotations

from ..status import PfacError, PfacStatus

# lane-replicated tables live in VMEM; leave room for the input/output tiles
_VMEM_TABLE_BUDGET = 8 << 20


def _default_platform() -> str:
    import jax

    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def try_build(automaton, mode, *, placement, tile, device, required: bool):
    del mode  # the sieve kernel subsumes dense/hash: same semantics
    # placement maps the reference's texture mode (PFAC_setTextureMode):
    # VMEM (TEXTURE_ON analog) forces the VMEM-table Pallas path, HBM
    # (TEXTURE_OFF) forces the HBM-gather XLA walker, AUTO picks.
    from ..runtime.handle import PlacementMode

    if placement == PlacementMode.HBM:
        return None
    required = required or placement == PlacementMode.VMEM
    on_tpu = _default_platform() == "tpu"
    if not on_tpu and not required:
        return None

    from .pallas_sieve import SieveMatcher, SieveTables

    try:
        tables = SieveTables.build(automaton)
        if tables.vmem_bytes > _VMEM_TABLE_BUDGET:
            raise PfacError(
                PfacStatus.INVALID_PARAMETER,
                f"sieve tables need {tables.vmem_bytes} bytes of VMEM",
            )
        kw = {}
        if tile:
            # geometry must be a multiple of the kernel's halo/unroll unit
            kw["tile_rows"] = max(64, (tile // 128) // 64 * 64)
        return SieveMatcher(automaton, interpret=not on_tpu, device=device, **kw)
    except PfacError:
        if required:
            raise
        return None
    except Exception:
        # e.g. a CHD displacement search that fails to converge on an
        # adversarial key set — the XLA walker is the correct fallback
        if required:
            raise
        return None
