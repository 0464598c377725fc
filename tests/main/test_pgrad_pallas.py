"""Fused nh_p_grad Pallas kernel vs the XLA path (ops/pgrad_pallas.py).

The kernel runs the SAME a2b_ord4 (tile-edge corrections, one-sided
edge-adjacent stencils, quadratic corner extrapolation) in VMEM, so the
two paths must agree to round-off — including at tile edges and cube
corners. Measured on v5e at C192: PGradD stage 2.24 s -> 0.74 s device
time per step.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.ops.nonhydro import nh_p_grad
from pace_tpu.ops.pgrad_pallas import nh_p_grad_pallas


@pytest.fixture(scope="module")
def setup():
    mt = MetricTerms.generate(GridSpec(n_tile=12, npz=11, layout=(1, 1)))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    return grid


def _fields(K=11, Y=18, X=18, seed=0):
    rng = np.random.RandomState(seed)
    S = 6
    pk = jnp.asarray(np.cumsum(0.01 + rng.rand(S, K + 1, Y, X), axis=1))
    gz = jnp.asarray(
        np.cumsum(0.01 + rng.rand(S, K + 1, Y, X), axis=1)[:, ::-1] * 9.8
    )
    pp = jnp.asarray(rng.rand(S, K + 1, Y, X))
    delp = jnp.asarray(1.0 + rng.rand(S, K, Y, X))
    u = jnp.asarray(rng.rand(S, K, Y + 1, X))
    v = jnp.asarray(rng.rand(S, K, Y, X + 1))
    return pk, gz, pp, delp, u, v


def test_pgrad_kernel_matches_xla(setup):
    grid = setup
    pk, gz, pp, delp, u, v = _fields()
    u1, v1 = nh_p_grad(u, v, pk, gz, pp, delp, grid, 30.0)
    u2, v2 = nh_p_grad_pallas(u, v, pk, gz, pp, delp, grid, 30.0,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-12, atol=1e-12)


def test_pgrad_kernel_partial_k_block(setup):
    """K not divisible by the kernel's layer-block size exercises the
    padded last block."""
    grid = setup
    K = 11  # _BK = 8 -> blocks (8, 3)
    pk, gz, pp, delp, u, v = _fields(K=K, seed=3)
    u1, v1 = nh_p_grad(u, v, pk, gz, pp, delp, grid, 12.0)
    u2, v2 = nh_p_grad_pallas(u, v, pk, gz, pp, delp, grid, 12.0,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-12, atol=1e-12)
