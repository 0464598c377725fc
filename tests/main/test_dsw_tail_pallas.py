"""Fused d_sw tail Pallas kernel vs the jnp twin (ops/d_sw_tail_pallas.py).

The kernel runs the SAME arithmetic (corner KE with the 3-quadrant cube
corner fix, Smagorinsky + del-2^(nord+1) divergence damping with the edge
band, momentum update, dissipation estimate) in VMEM, so the two paths
must agree to round-off — including at tile edges and cube corners.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.ops.d_sw import DSWConfig, d_sw_tail_jnp
from pace_tpu.ops.d_sw_tail_pallas import d_sw_tail_pallas


@pytest.fixture(scope="module")
def grid():
    mt = MetricTerms.generate(GridSpec(n_tile=12, npz=11, layout=(1, 1)))
    return GridData.from_metric_terms(mt, dtype=jnp.float64)


def _fields(K=11, Y=18, X=18, seed=0, with_vd=True):
    rng = np.random.RandomState(seed)
    S = 6
    u = jnp.asarray(rng.randn(S, K, Y + 1, X))
    v = jnp.asarray(rng.randn(S, K, Y, X + 1))
    ut = jnp.asarray(rng.randn(S, K, Y, X + 1))
    vt = jnp.asarray(rng.randn(S, K, Y + 1, X))
    divg = jnp.asarray(rng.randn(S, K, Y + 1, X + 1)) * 1e-5
    vort = jnp.asarray(rng.randn(S, K, Y, X)) * 1e-5
    vfx = jnp.asarray(rng.randn(S, K, Y, X + 1))
    vfy = jnp.asarray(rng.randn(S, K, Y + 1, X))
    dvfx = jnp.asarray(rng.randn(S, K, Y, X + 1)) if with_vd else None
    dvfy = jnp.asarray(rng.randn(S, K, Y + 1, X)) if with_vd else None
    return u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy


CFGS = [
    DSWConfig(nord=3, d4_bg=0.15, d2_bg=0.0, d2_bg_k1=0.2, d2_bg_k2=0.1,
              dddmp=0.5, do_vort_damp=True, vtdm4=0.06, d_con=1.0),
    DSWConfig(nord=1, d4_bg=0.16, dddmp=0.0, d_con=0.0, vtdm4=0.0,
              edge_damp_band=False),
]


@pytest.mark.parametrize("cfg_i", range(len(CFGS)))
def test_dsw_tail_kernel_matches_jnp(grid, cfg_i):
    cfg = CFGS[cfg_i]
    with_vd = cfg.do_vort_damp and cfg.vtdm4 > 0.0
    u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy = _fields(
        with_vd=with_vd, seed=cfg_i
    )
    if not with_vd:
        dvfx = dvfy = None
    r1 = d_sw_tail_jnp(u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy,
                       grid, 30.0, cfg)
    r2 = d_sw_tail_pallas(u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy,
                          grid, 30.0, cfg, interpret=True)
    for a, b, name in zip(r1, r2, ("u", "v", "heat")):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-12,
            err_msg=name,
        )


def test_dsw_tail_partial_k_block(grid):
    """K=11 with bk=8 exercises the padded last k-block."""
    cfg = CFGS[0]
    u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy = _fields(seed=7)
    r1 = d_sw_tail_jnp(u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy,
                       grid, 12.0, cfg)
    r2 = d_sw_tail_pallas(u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy,
                          grid, 12.0, cfg, interpret=True)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)
