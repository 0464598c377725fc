"""Fused Pallas d2a2c kernel vs the XLA formulation (interpret mode).

Same-math check as test_fvtp2d_pallas: float64 inputs, near-round-off
agreement on the consumed interior (outer two halo rings are unspecified in
both paths — wrap-around rolls vs edge-mode pads).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.ops.d2a2c import d2a2c_vect
from pace_tpu.ops.d2a2c_pallas import d2a2c_vect_pallas


@pytest.fixture(scope="module")
def grid():
    spec = GridSpec(n_tile=12, npz=4, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    return GridData.from_metric_terms(mt, dtype=jnp.float64)


def _winds(rng, S=6, K=4, Y=18, X=18):
    u = jnp.asarray(10.0 * rng.standard_normal((S, K, Y + 1, X)))
    v = jnp.asarray(10.0 * rng.standard_normal((S, K, Y, X + 1)))
    return u, v


def test_matches_xla_interior(grid):
    rng = np.random.default_rng(3)
    u, v = _winds(rng)
    ref = d2a2c_vect(u, v, grid)
    got = d2a2c_vect_pallas(u, v, grid, interpret=True)
    names = ("ua", "va", "uc", "vc", "ut", "vt")
    b = 3
    for name, a, p in zip(names, ref, got):
        sl = np.s_[:, :, b:-b, b:-b]
        np.testing.assert_allclose(
            np.asarray(a)[sl],
            np.asarray(p)[sl],
            rtol=1e-12,
            atol=1e-12,
            err_msg=name,
        )


def test_k_blocking_invariance(grid):
    rng = np.random.default_rng(5)
    u, v = _winds(rng)
    outs = [
        d2a2c_vect_pallas(u, v, grid, block_k=bk, interpret=True)
        for bk in (1, 3)
    ]
    for a, b_ in zip(outs[0], outs[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-12, atol=1e-12
        )
