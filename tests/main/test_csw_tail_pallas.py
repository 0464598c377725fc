"""Fused c_sw tail Pallas kernel vs the jnp twin (ops/c_sw_tail_pallas.py).

Same arithmetic (contravariant winds, upwind transport, corner KE /
vorticity momentum update, corner divergence with edge one-sided branch
and 3-quadrant cube-corner average) in VMEM — must agree to round-off,
including at tile edges and cube corners.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.ops.c_sw import c_sw_tail_jnp
from pace_tpu.ops.c_sw_tail_pallas import c_sw_tail_pallas


@pytest.fixture(scope="module")
def grid():
    mt = MetricTerms.generate(GridSpec(n_tile=12, npz=11, layout=(1, 1)))
    return GridData.from_metric_terms(mt, dtype=jnp.float64)


def test_csw_tail_kernel_matches_jnp(grid):
    K, Y, X = 11, 18, 18
    rng = np.random.RandomState(0)
    S = 6

    def r(*sh):
        return jnp.asarray(rng.randn(S, K, *sh))

    u, vt_like = r(Y + 1, X), r(Y + 1, X)
    v = r(Y, X + 1)
    delp = jnp.asarray(1.0 + rng.rand(S, K, Y, X))
    pt = jnp.asarray(250.0 + 10.0 * rng.rand(S, K, Y, X))
    uc, uc_x, uc_y = r(Y, X + 1), r(Y, X + 1), r(Y, X + 1)
    vc, vc_x, vc_y = r(Y + 1, X), r(Y + 1, X), r(Y + 1, X)
    ua, va = r(Y, X), r(Y, X)
    va_x, ua_y = r(Y, X), r(Y, X)

    a1 = c_sw_tail_jnp(u, v, delp, pt, uc, vc, uc_x, vc_x, uc_y, vc_y,
                       ua, va, va_x, ua_y, grid, 30.0)
    a2 = c_sw_tail_pallas(u, v, delp, pt, uc, vc, uc_x, vc_x, uc_y, vc_y,
                          ua, va, va_x, ua_y, grid, 30.0, interpret=True)
    names = ("delpc", "ptc", "uc_new", "vc_new", "ut", "vt", "xfx", "yfx",
             "divg_d")
    for x, y, name in zip(a1, a2, names):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-12, atol=1e-12,
            err_msg=name,
        )
