"""Pallas remap kernel vs the XLA formulation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.ops.remap_pallas import remap_field_pallas
from pace_tpu.ops.remapping import remap_field


@pytest.mark.parametrize("monotone", [True, False])
def test_matches_xla_formulation(monotone, rng):
    S, K, Y, X = 2, 12, 16, 128
    ps = 1.0e5 + 1.0e3 * rng.randn(S, Y, X)
    bk = np.linspace(0.0, 1.0, K + 1) ** 1.5
    pe2 = 2.0 + bk[None, :, None, None] * (ps[:, None] - 2.0)
    pe1 = pe2.copy()
    dp_min = np.diff(pe2, axis=1).min()
    pe1[:, 1:-1] += 0.3 * dp_min * rng.randn(S, K - 1, Y, X)
    assert (np.diff(pe1, axis=1) > 0).all()
    q = 250.0 + 50.0 * rng.rand(S, K, Y, X)

    f32 = jnp.float32
    a = remap_field(
        jnp.asarray(q, f32), jnp.asarray(pe1, f32), jnp.asarray(pe2, f32),
        monotone,
    )
    b = remap_field_pallas(
        jnp.asarray(q, f32), jnp.asarray(pe1, f32), jnp.asarray(pe2, f32),
        monotone, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-3
    )
    # conservation: column mass integral preserved
    m1 = (q * np.diff(pe1, axis=1)).sum(axis=1)
    m2 = (np.asarray(b, np.float64) * np.diff(pe2, axis=1)).sum(axis=1)
    assert np.abs(m1 - m2).max() / np.abs(m1).max() < 1e-5


def test_leading_tracer_axis(rng):
    """The kernel grid-blocks over stacked leading axes (S, nq)."""
    S, nq, K, Y, X = 1, 3, 8, 8, 128
    bk = np.linspace(0.0, 1.0, K + 1)
    ps = 1.0e5 * np.ones((S, Y, X))
    pe = 2.0 + bk[None, :, None, None] * (ps[:, None] - 2.0)
    q = rng.rand(S, nq, K, Y, X)
    f32 = jnp.float32
    out = remap_field_pallas(
        jnp.asarray(q, f32),
        jnp.asarray(np.broadcast_to(pe[:, None], (S, nq, K + 1, Y, X)), f32),
        jnp.asarray(np.broadcast_to(pe[:, None], (S, nq, K + 1, Y, X)), f32),
        True,
        interpret=True,
    )
    # identical grids: remap is identity (away from reconstruction edges it
    # is exact; edges are piecewise constant so still exact)
    np.testing.assert_allclose(np.asarray(out), q, rtol=2e-6, atol=2e-6)
