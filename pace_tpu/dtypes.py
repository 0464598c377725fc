"""Floating-point precision policy.

TPU-native analog of ``ndsl.dsl.typing`` (reference usage: driver/pace/driver/driver.py:26;
``PACE_FLOAT_PRECISION`` documented at docs/overview.rst:15).

On TPU the production path runs float32 (with bfloat16 used inside selected Pallas
kernels); validation runs float64 on CPU via ``jax.config.update("jax_enable_x64", True)``.
Select with ``PACE_TPU_PRECISION=32|64`` before importing.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def _precision_bits() -> int:
    raw = os.environ.get(
        "PACE_TPU_PRECISION", os.environ.get("PACE_FLOAT_PRECISION", "32")
    )
    bits = int(raw)
    if bits not in (32, 64):
        raise ValueError(f"PACE_TPU_PRECISION must be 32 or 64, got {bits}")
    return bits


PRECISION_BITS = _precision_bits()

#: dtype used for model fields on device
Float = jnp.float64 if PRECISION_BITS == 64 else jnp.float32
#: dtype used for host-side (numpy) grid generation — always f64 for accuracy
NpFloat = np.float64
#: integer dtype for index tables
Int = jnp.int32


def float_dtype():
    """The active floating point dtype for model state arrays."""
    return Float
