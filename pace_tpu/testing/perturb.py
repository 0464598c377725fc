"""Round-off perturbation of model states (reference ``ndsl.testing.perturb``,
used by threshold calibration at reference tests/savepoint/
test_checkpoints.py:175)."""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


def perturb(state, magnitude: float = 1.0e-13, seed: int = 0):
    """Multiply every floating-point leaf by (1 + eps) with |eps| <=
    ``magnitude`` — a round-off-scale perturbation for calibrating how fast
    trajectories diverge."""
    rng = np.random.RandomState(seed)

    def _one(leaf):
        if leaf is None:
            return None
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            return leaf
        eps = rng.uniform(-magnitude, magnitude, size=arr.shape)
        import jax.numpy as jnp

        return jnp.asarray(arr * (1.0 + eps), dtype=leaf.dtype)

    if dataclasses.is_dataclass(state):
        return jax.tree_util.tree_map(_one, state)
    return _one(state)
