"""Global consv_te energy fixer (VERDICT r2 #5): the increment is a GLOBAL
integral (reference consv_te in the Remapping stage requires a global
reduction, SURVEY.md §2.3) — layout-invariant to roundoff, and with dry air
(cvm == CV_AIR) it restores the global energy integral exactly.
"""

import jax.numpy as jnp
import numpy as np

from pace_tpu import constants
from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.ops.dycore_extras import (
    global_energy_fix_increment, total_energy_columns,
)
from pace_tpu.ops.moist_cv import moist_cv
from pace_tpu.parallel.gather import scatter_tiles
from pace_tpu.parallel.partitioner import CubedSpherePartitioner

N, K, H = 12, 4, 3


def _global_fields(rng):
    u6 = rng.standard_normal((6, K, N + 1, N)) * 10.0
    v6 = rng.standard_normal((6, K, N, N + 1)) * 10.0
    w6 = rng.standard_normal((6, K, N, N)) * 0.5
    delp6 = 200.0 + 20.0 * rng.random((6, K, N, N))
    pt6 = 280.0 + 30.0 * rng.random((6, K, N, N))
    pkz6 = 0.3 + 0.5 * rng.random((6, K, N, N))
    phis6 = 1000.0 * rng.random((6, N, N))
    return u6, v6, w6, delp6, pt6, pkz6, phis6


def _increment(layout, fields):
    u6, v6, w6, delp6, pt6, pkz6, phis6 = fields
    part = CubedSpherePartitioner.from_layout(layout)
    u = jnp.asarray(scatter_tiles(u6, part, H, stagger="y_interface"))
    v = jnp.asarray(scatter_tiles(v6, part, H, stagger="x_interface"))
    w = jnp.asarray(scatter_tiles(w6, part, H))
    delp = jnp.asarray(scatter_tiles(delp6, part, H))
    pt = jnp.asarray(scatter_tiles(pt6, part, H))
    pkz = jnp.asarray(scatter_tiles(pkz6, part, H))
    phis = jnp.asarray(scatter_tiles(phis6, part, H))
    mt = MetricTerms.generate(GridSpec(n_tile=N, npz=K, layout=layout))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)

    te1 = total_energy_columns(u, v, w, delp, pt, pkz, phis)
    # a remap-like perturbation: slightly cooled state
    pt2 = pt * 0.995
    te2 = total_energy_columns(u, v, w, delp, pt2, pkz, phis)
    q = jnp.zeros((delp.shape[0], 6) + delp.shape[1:], dtype=delp.dtype)
    cvm, _ = moist_cv(q, 6)
    dT = global_energy_fix_increment(
        te1, te2, cvm, delp, grid.area, H, consv=1.0
    )
    return dT, (u, v, w, delp, pt2, pkz, phis, te1, grid)


def test_layout_invariant_to_roundoff():
    rng = np.random.default_rng(11)
    fields = _global_fields(rng)
    dT_11, _ = _increment((1, 1), fields)
    dT_22, _ = _increment((2, 2), fields)
    assert np.ndim(dT_11) == 0  # one uniform global increment
    np.testing.assert_allclose(
        float(dT_11), float(dT_22), rtol=1e-12
    )


def test_restores_global_energy_integral():
    """Dry air: cvm == CV_AIR, so applying pt += dT/pkz puts the global
    area-weighted energy integral back to the pre-remap value exactly."""
    rng = np.random.default_rng(12)
    dT, (u, v, w, delp, pt2, pkz, phis, te1, grid) = _increment(
        (1, 1), _global_fields(rng)
    )
    pt3 = pt2 + dT / pkz
    te3 = total_energy_columns(u, v, w, delp, pt3, pkz, phis)
    sl = np.s_[..., H:-H, H:-H]
    before = float(jnp.sum(te1[sl] * grid.area[sl]))
    after = float(jnp.sum(te3[sl] * grid.area[sl]))
    np.testing.assert_allclose(after, before, rtol=1e-12)
    # sanity: the increment heats a cooled state
    assert float(dT) > 0.0


def test_dry_cvm_is_cv_air():
    q = jnp.zeros((2, 6, K, 4, 4))
    cvm, _ = moist_cv(q, 6)
    np.testing.assert_allclose(np.asarray(cvm), constants.CV_AIR)
