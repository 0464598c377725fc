"""Microphysics tests: water/enthalpy conservation, saturation behavior,
sedimentation, and the full physics+dycore coupled step (reference analog:
tests/main/physics/test_integration.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu import constants
from pace_tpu.models.shield.microphysics import (
    MicrophysicsConfig,
    microphysics_step,
    saturation_mixing_ratio,
)


def _column(K=20, Y=3, X=4, seed=0):
    rng = np.random.RandomState(seed)
    p = np.linspace(2e4, 1e5, K)[None, :, None, None] * np.ones((1, 1, Y, X))
    t = 220.0 + 70.0 * (p / 1e5) + rng.rand(1, K, Y, X)
    delp = np.full((1, K, Y, X), 1e5 / K)
    qv = 0.8 * saturation_mixing_ratio(jnp.asarray(t), jnp.asarray(p))
    return map(jnp.asarray, (np.asarray(qv), t, p, delp))


def test_water_and_enthalpy_conservation_no_sedimentation():
    qv, t, p, delp = _column()
    z = jnp.zeros_like(qv)
    ql = z + 2e-3
    cfg = MicrophysicsConfig(do_sedimentation=False)
    qv2, ql2, qi2, qr2, qs2, qg2, t2, precip = microphysics_step(
        qv, ql, z, z, z, z, t, p, delp, 300.0, cfg
    )
    wat0 = np.asarray((qv + ql) * delp).sum()
    wat1 = np.asarray((qv2 + ql2 + qi2 + qr2 + qs2 + qg2) * delp).sum()
    np.testing.assert_allclose(wat1, wat0, rtol=1e-12)
    # moist static enthalpy cp*T + Lv*qv - Lf*(ice phases) conserved
    cp, lv, lf = constants.CP_AIR, constants.HLV, constants.HLF
    h0 = np.asarray((cp * t + lv * qv - lf * 0.0) * delp).sum()
    h1 = np.asarray(
        (cp * t2 + lv * qv2 - lf * (qi2 + qs2 + qg2)) * delp
    ).sum()
    np.testing.assert_allclose(h1, h0, rtol=1e-9)
    assert float(precip.sum()) == 0.0


def test_supersaturation_condenses_and_warms():
    qv, t, p, delp = _column()
    qv = qv * 2.0  # supersaturated
    z = jnp.zeros_like(qv)
    cfg = MicrophysicsConfig(do_sedimentation=False, do_warm_rain=False, do_ice=False)
    qv2, ql2, *_rest, t2, precip = microphysics_step(
        qv, z, z, z, z, z, t, p, delp, 300.0, cfg
    )
    assert float(ql2.min()) >= 0.0
    assert float(ql2.max()) > 0.0
    assert np.all(np.asarray(t2) >= np.asarray(t) - 1e-9)  # condensation warms
    # no negative vapor
    assert float(qv2.min()) >= 0.0


def test_sedimentation_conserves_and_precipitates():
    qv, t, p, delp = _column()
    z = jnp.zeros_like(qv)
    qr = z + 1e-3
    cfg = MicrophysicsConfig(do_warm_rain=False, do_ice=False)
    qv2, ql2, qi2, qr2, qs2, qg2, t2, precip = microphysics_step(
        0 * qv, z, z, qr, z, z, t, p, delp, 600.0, cfg
    )
    col0 = np.asarray(qr * delp).sum(axis=1) / constants.GRAV
    col1 = np.asarray(qr2 * delp).sum(axis=1) / constants.GRAV
    np.testing.assert_allclose(col1 + np.asarray(precip), col0, rtol=1e-6)
    assert float(np.asarray(precip).min()) > 0.0


def test_coupled_physics_step_runs():
    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.state import DycoreState, TRACER_NAMES
    from pace_tpu.models.shield.physics import Physics

    spec = GridSpec(n_tile=12, npz=8, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float64)
    q = np.asarray(state.q).copy()
    q[:, TRACER_NAMES.index("qvapor")] = 5e-3
    state = dataclasses.replace(state, q=jnp.asarray(q))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    phys = Physics(grid, ("GFS_microphysics",), timestep=300.0)
    out = phys(state)
    assert not bool(jnp.isnan(out.pt).any())
    assert float(out.q.min()) > -1e-12
    # theta_v consistent with the temperature relation round trip
    assert np.abs(np.asarray(out.pt - state.pt)).max() < 50.0
