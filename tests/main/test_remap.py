"""Vertical remap tests: identity, conservation, and monotone accuracy."""

import jax.numpy as jnp
import numpy as np

from pace_tpu.ops.remapping import remap_field


def _columns(K=12, Y=4, X=5, seed=0):
    rng = np.random.RandomState(seed)
    # random monotone source interfaces, shared top/bottom with target
    dp1 = rng.uniform(0.5, 2.0, (1, K, Y, X))
    pe1 = np.concatenate(
        [np.zeros((1, 1, Y, X)), np.cumsum(dp1, axis=1)], axis=1
    )
    dp2 = rng.uniform(0.5, 2.0, (1, K, Y, X))
    dp2 *= (pe1[:, -1:] - pe1[:, :1]) / dp2.sum(axis=1, keepdims=True)
    pe2 = np.concatenate(
        [np.zeros((1, 1, Y, X)), np.cumsum(dp2, axis=1)], axis=1
    )
    pe2[:, -1] = pe1[:, -1]
    return jnp.asarray(pe1), jnp.asarray(pe2)


def test_remap_identity():
    pe1, _ = _columns()
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.rand(1, 12, 4, 5))
    out = remap_field(q, pe1, pe1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-12)


def test_remap_conservation():
    pe1, pe2 = _columns()
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.rand(1, 12, 4, 5))
    dp1 = np.diff(np.asarray(pe1), axis=1)
    dp2 = np.diff(np.asarray(pe2), axis=1)
    out = np.asarray(remap_field(q, pe1, pe2))
    np.testing.assert_allclose(
        (out * dp2).sum(axis=1), (np.asarray(q) * dp1).sum(axis=1), rtol=1e-12
    )


def test_remap_linear_exact():
    """A linear-in-p profile is reproduced exactly away from column edges."""
    K, Y, X = 16, 2, 2
    dp1 = np.full((1, K, Y, X), 1.0)
    pe1 = np.concatenate(
        [np.zeros((1, 1, Y, X)), np.cumsum(dp1, axis=1)], axis=1
    )
    p_mid1 = 0.5 * (pe1[:, :-1] + pe1[:, 1:])
    q = jnp.asarray(2.0 * p_mid1 + 1.0)
    # shifted target interfaces (same ends)
    pe2 = pe1.copy()
    pe2[:, 1:-1] += 0.3 * np.sin(np.arange(1, K)[None, :, None, None])
    p_mid2 = 0.5 * (pe2[:, :-1] + pe2[:, 1:])
    out = np.asarray(remap_field(q, jnp.asarray(pe1), jnp.asarray(pe2)))
    expect = 2.0 * p_mid2 + 1.0
    np.testing.assert_allclose(out[:, 3:-3], expect[:, 3:-3], rtol=1e-12)


def test_remap_monotone_no_new_extrema():
    pe1, pe2 = _columns(seed=3)
    rng = np.random.RandomState(4)
    q = rng.rand(1, 12, 4, 5)
    q[:, 5:8] += 4.0
    out = np.asarray(remap_field(jnp.asarray(q), pe1, pe2, monotone=True))
    assert out.max() <= q.max() + 1e-12
    assert out.min() >= q.min() - 1e-12
