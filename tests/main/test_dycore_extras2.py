"""Saturation adjustment + consv_te energy fixer tests (reference
saturation_adjustment/SatAdjust3d and the Remapping-stage total-energy
conservation, SURVEY.md §2.3)."""

import pytest
import jax.numpy as jnp
import numpy as np

from pace_tpu import constants
from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState, TRACER_NAMES
from pace_tpu.ops.dycore_extras import sat_adjust


def test_sat_adjust_condenses_supersaturation():
    pkz = jnp.full((1, 1, 1, 1), 0.95)
    p = jnp.full((1, 1, 1, 1), 9.0e4)
    qv = jnp.full((1, 1, 1, 1), 0.03)  # strongly supersaturated at 285 K
    ql = jnp.zeros_like(qv)
    t_target = 285.0
    pt = t_target * (1.0 + constants.ZVIR * qv) / pkz
    pt2, qv2, ql2, *_ice, _qa = sat_adjust(
        pt, qv, ql, p_mid=p, pkz=pkz, dt=600.0
    )
    assert float(qv2[0, 0, 0, 0]) < 0.03  # vapor condensed
    assert float(ql2[0, 0, 0, 0]) > 0.0
    t2 = float((pt2 * pkz / (1.0 + constants.ZVIR * qv2))[0, 0, 0, 0])
    assert t2 > t_target  # latent heating
    # water conserved
    np.testing.assert_allclose(
        np.asarray(qv2 + ql2), np.asarray(qv + ql), rtol=1e-12
    )


def test_sat_adjust_evaporates_in_dry_air():
    pkz = jnp.full((1, 1, 1, 1), 0.95)
    p = jnp.full((1, 1, 1, 1), 9.0e4)
    qv = jnp.full((1, 1, 1, 1), 1.0e-4)  # very dry
    ql = jnp.full((1, 1, 1, 1), 1.0e-3)
    pt = 290.0 * (1.0 + constants.ZVIR * qv) / pkz
    pt2, qv2, ql2, *_ice, _qa = sat_adjust(
        pt, qv, ql, p_mid=p, pkz=pkz, dt=600.0
    )
    assert float(qv2[0, 0, 0, 0]) > 1.0e-4
    assert float(ql2[0, 0, 0, 0]) < 1.0e-3
    t2 = float((pt2 * pkz / (1.0 + constants.ZVIR * qv2))[0, 0, 0, 0])
    assert t2 < 290.0  # evaporative cooling


@pytest.mark.slow
def test_dycore_with_consv_te_and_sat_adj_runs():
    mt = MetricTerms.generate(GridSpec(n_tile=12, npz=8, layout=(1, 1)))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(
        npz=8, k_split=1, n_split=2, hydrostatic=False, nord=1, d4_bg=0.12,
        consv_te=1.0, do_sat_adj=True, fill=True,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=300.0)
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float64)
    # moisten the lower troposphere so sat_adj has work to do
    iv = TRACER_NAMES.index("qvapor")
    q = np.array(state.q)
    q[:, iv, -3:] = 0.015
    import dataclasses

    state = dataclasses.replace(state, q=jnp.asarray(q))
    out = core.step_dynamics(state)
    h = 3
    for name in ("u", "pt", "delp"):
        a = np.asarray(getattr(out, name))[..., h:-h, h:-h]
        assert np.isfinite(a).all(), name
    pt = np.asarray(out.pt)[..., h:-h, h:-h]
    assert 150.0 < pt.min() and pt.max() < 3000.0


def test_cloud_fraction_limits():
    """do_qa diagnostic (reference sat_adj qcld fill): clear when dry,
    cloudy when condensate-rich, partial from high RH."""
    import jax.numpy as jnp
    import numpy as np

    from pace_tpu.ops.dycore_extras import cloud_fraction

    t = jnp.full((4,), 280.0)
    p = jnp.full((4,), 8.0e4)
    qv = jnp.array([1e-4, 1e-4, 8e-3, 6.3e-3])   # dry, dry, ~sat, ~0.9 RH
    ql = jnp.array([0.0, 5e-4, 0.0, 0.0])        # -, thick cloud, -, -
    qa = np.asarray(cloud_fraction(qv, ql, t, p))
    assert qa[0] == 0.0            # dry, no condensate
    assert qa[1] == 1.0            # condensate-saturated
    assert qa[2] > 0.9             # near water saturation
    assert 0.0 < qa[3] < 1.0       # partial cover from RH
    assert ((qa >= 0) & (qa <= 1)).all()
