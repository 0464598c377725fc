"""Pallas-kernel dispatch gate.

Each hot op has two implementations: a fused Pallas TPU kernel and the XLA
formulation (also the CPU/interpret reference). `use_pallas(name)` decides at
trace time; the env var ``PACE_TPU_DISABLE_PALLAS`` (comma-separated kernel
names, or ``all``) forces the XLA path per kernel — the debugging analog of
the reference's per-backend stencil selection, and the bisection tool for
separating kernel bugs from model numerics.

Known names: ``fvtp2d``, ``d2a2c``, ``remap``, ``sim1``, ``pgrad`` (the
halo-exchange kernel has its own switch, ``PACE_TPU_HALO_ASSEMBLY`` in
halo_slabs.py).
"""

from __future__ import annotations

import os

import jax

_DISABLED = frozenset(
    s.strip()
    for s in os.environ.get("PACE_TPU_DISABLE_PALLAS", "").split(",")
    if s.strip()
)


def use_pallas(name: str) -> bool:
    if "all" in _DISABLED or name in _DISABLED:
        return False
    return jax.default_backend() == "tpu"
