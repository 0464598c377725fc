"""Shallow-convection (SAS mass-flux) scheme tests.

Mirrors the reference test strategy (SURVEY.md §4): unit-level physical
invariants — exact conservation of column moist static energy / total water /
momentum, trigger behavior, shallow-only gating, CFL safety.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu import constants
from pace_tpu.models.shield.sas import ShallowConvectionConfig, sas_step


K, NY, NX = 24, 4, 5


def _column(unstable=True, qv_sfc=0.018):
    """Build a conditionally unstable (or stable dry) test sounding."""
    ak = np.linspace(2000.0, 0.0, K + 1)
    bk = np.linspace(0.0, 1.0, K + 1) ** 1.3
    ps = 1.0e5
    pe = (ak[:, None, None] + bk[:, None, None] * ps) * np.ones((K + 1, NY, NX))
    p_mid = 0.5 * (pe[1:] + pe[:-1])
    delp = pe[1:] - pe[:-1]
    # temperature: dry-neutral mixed layer (constant theta -> saturated
    # parcels are buoyant) capped by a stable free troposphere at 800 hPa
    # (keeps the cloud shallow); or uniformly stable for the no-trigger case
    t_sfc = 300.0 if unstable else 280.0
    kappa = 0.2857 if unstable else 0.12
    p_cap = 0.8 * ps
    t_ml = t_sfc * (p_mid / ps) ** kappa
    t_cap = t_sfc * (p_cap / ps) ** kappa
    t_ft = t_cap * (p_mid / p_cap) ** 0.12
    t = np.maximum(np.where(p_mid > p_cap, t_ml, t_ft), 200.0)
    qsat = 0.622 * 611.21 * np.exp(
        17.502 * (t - 273.16) / (t - 273.16 + 240.97)
    ) / np.maximum(p_mid - 611.21, 1.0)
    rh = (0.9 if unstable else 0.3) * (p_mid / ps) ** 0.5
    qv = np.minimum(rh * qsat, qv_sfc)
    if unstable:
        qv[-1] = qv_sfc  # moist surface layer feeds the plume
    ql = np.zeros_like(qv)
    rng = np.random.RandomState(7)
    ua = 3.0 + 0.5 * rng.randn(K, NY, NX)
    va = -2.0 + 0.5 * rng.randn(K, NY, NX)
    return (jnp.asarray(ua), jnp.asarray(va), jnp.asarray(t),
            jnp.asarray(qv), jnp.asarray(ql), jnp.asarray(pe),
            jnp.asarray(p_mid), jnp.asarray(delp))


CFG = ShallowConvectionConfig(sensible_heat_flux=0.08, latent_heat_flux=8e-5)
DT = 600.0


def test_triggers_and_transports():
    ua, va, t, qv, ql, pe, p_mid, delp = _column(unstable=True)
    u_dt, v_dt, t_new, qv_new, ql_new, _pr = sas_step(
        ua, va, t, qv, ql, pe, p_mid, delp, DT, CFG
    )
    assert float(jnp.max(jnp.abs(t_new - t))) > 1e-4  # scheme did something
    # shallow convection dries the subcloud source layer and moistens above
    dq = np.asarray(qv_new - qv)
    assert dq[-1].mean() < 0.0
    assert dq.max() > 0.0
    assert np.all(np.asarray(qv_new) >= 0.0)
    assert np.all(np.asarray(ql_new) >= 0.0)


def test_exact_column_conservation():
    ua, va, t, qv, ql, pe, p_mid, delp = _column(unstable=True)
    u_dt, v_dt, t_new, qv_new, ql_new, _pr = sas_step(
        ua, va, t, qv, ql, pe, p_mid, delp, DT, CFG
    )
    # total water: sum (qv+ql) dp  — exact (flux form, M=0 at both ends)
    qt0 = jnp.sum((qv + ql) * delp, axis=0)
    qt1 = jnp.sum((qv_new + ql_new) * delp, axis=0)
    np.testing.assert_allclose(np.asarray(qt1), np.asarray(qt0), rtol=1e-12)
    # moist enthalpy: sum (cp T + L qv) dp  (the g*z part is untouched)
    h0 = jnp.sum((constants.CP_AIR * t + constants.HLV * qv) * delp, axis=0)
    h1 = jnp.sum((constants.CP_AIR * t_new + constants.HLV * qv_new) * delp,
                 axis=0)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-12)
    # momentum
    for w, w_dt in ((ua, u_dt), (va, v_dt)):
        m0 = jnp.sum(w * delp, axis=0)
        m1 = jnp.sum((w + DT * w_dt) * delp, axis=0)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=1e-12, atol=1e-9)


def test_stable_column_is_noop():
    ua, va, t, qv, ql, pe, p_mid, delp = _column(unstable=False)
    cfg = ShallowConvectionConfig()  # zero surface fluxes -> w* = 0 -> Mb = 0
    u_dt, v_dt, t_new, qv_new, ql_new, _pr = sas_step(
        ua, va, t, qv, ql, pe, p_mid, delp, DT, cfg
    )
    assert float(jnp.max(jnp.abs(t_new - t))) == 0.0
    assert float(jnp.max(jnp.abs(qv_new - qv))) == 0.0
    assert float(jnp.max(jnp.abs(u_dt))) == 0.0


def test_deep_cloud_is_gated_out():
    ua, va, t, qv, ql, pe, p_mid, delp = _column(unstable=True)
    cfg = ShallowConvectionConfig(
        sensible_heat_flux=0.08, latent_heat_flux=8e-5, max_depth_pa=1.0
    )  # any real cloud is "too deep" under this cap
    u_dt, v_dt, t_new, qv_new, ql_new, _pr = sas_step(
        ua, va, t, qv, ql, pe, p_mid, delp, DT, cfg
    )
    assert float(jnp.max(jnp.abs(t_new - t))) == 0.0
    assert float(jnp.max(jnp.abs(qv_new - qv))) == 0.0


@pytest.mark.parametrize("dt", [60.0, 1800.0, 7200.0])
def test_cfl_bounded_at_any_dt(dt):
    ua, va, t, qv, ql, pe, p_mid, delp = _column(unstable=True)
    cfg = ShallowConvectionConfig(sensible_heat_flux=0.3, latent_heat_flux=3e-4)
    u_dt, v_dt, t_new, qv_new, ql_new, _pr = sas_step(
        ua, va, t, qv, ql, pe, p_mid, delp, dt, cfg
    )
    assert np.all(np.isfinite(np.asarray(t_new)))
    assert float(jnp.max(jnp.abs(t_new - t))) < 15.0
    assert np.all(np.asarray(qv_new) >= 0.0)
    assert float(jnp.max(qv_new)) < 0.05


def test_coupled_sas_in_physics_driver():
    """SAS runs inside the Physics driver on a real cubed-sphere state."""
    import dataclasses

    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.state import DycoreState, TRACER_NAMES
    from pace_tpu.models.shield.physics import Physics
    from pace_tpu.models.shield.sas import ShallowConvectionConfig

    spec = GridSpec(n_tile=12, npz=8, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float64)
    q = np.asarray(state.q).copy()
    q[:, TRACER_NAMES.index("qvapor")] = 8e-3
    state = dataclasses.replace(state, q=jnp.asarray(q))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    phys = Physics(
        grid, ("GFS_shallow_convection",), timestep=300.0,
        sas_config=ShallowConvectionConfig(
            sensible_heat_flux=0.05, latent_heat_flux=5e-5
        ),
    )
    out = phys(state)
    assert not bool(jnp.isnan(out.pt).any())
    assert not bool(jnp.isnan(out.u).any())
    assert float(out.q.min()) > -1e-12
    assert np.abs(np.asarray(out.pt - state.pt)).max() < 20.0


def _deep_column():
    """Conditionally unstable through a deep layer: near-moist-adiabatic
    lapse with high humidity up to ~400 hPa."""
    ak = np.linspace(2000.0, 0.0, K + 1)
    bk = np.linspace(0.0, 1.0, K + 1) ** 1.3
    ps = 1.0e5
    pe = (ak[:, None, None] + bk[:, None, None] * ps) * np.ones((K + 1, NY, NX))
    p_mid = 0.5 * (pe[1:] + pe[:-1])
    delp = pe[1:] - pe[:-1]
    # dry-neutral (constant theta) through 450 hPa -> deep buoyant ascent
    p_cap = 0.45 * ps
    t_ml = 302.0 * (p_mid / ps) ** 0.2857
    t_cap = 302.0 * (p_cap / ps) ** 0.2857
    t = np.maximum(np.where(p_mid > p_cap, t_ml,
                            t_cap * (p_mid / p_cap) ** 0.10), 195.0)
    qsat = 0.622 * 611.21 * np.exp(
        17.502 * (t - 273.16) / (t - 273.16 + 240.97)
    ) / np.maximum(p_mid - 611.21, 1.0)
    qv = np.minimum(0.9 * qsat, 0.02)
    ql = np.zeros_like(qv)
    ua = np.full((K, NY, NX), 5.0)
    va = np.full((K, NY, NX), -3.0)
    j = jnp.asarray
    return (j(ua), j(va), j(t), j(qv), j(ql), j(pe), j(p_mid), j(delp))


def test_deep_convection_precipitates_and_conserves_mse():
    from pace_tpu.models.shield.sas import DeepConvectionConfig

    ua, va, t, qv, ql, pe, p_mid, delp = _deep_column()
    cfg = DeepConvectionConfig(sensible_heat_flux=0.05, latent_heat_flux=5e-5)
    u_dt, v_dt, t_new, qv_new, ql_new, precip = sas_step(
        ua, va, t, qv, ql, pe, p_mid, delp, DT, cfg
    )
    g = constants.GRAV
    assert float(precip.min()) > 0.0  # it rains
    # column water decreases by EXACTLY the surface precipitation
    qt0 = jnp.sum((qv + ql) * delp, axis=0) / g
    qt1 = jnp.sum((qv_new + ql_new) * delp, axis=0) / g
    np.testing.assert_allclose(np.asarray(qt0 - qt1),
                               np.asarray(precip) * DT, rtol=1e-9)
    # moist static energy (cp T + L qv) is conserved: rain removes liquid,
    # which carries no MSE in this convention
    h0 = jnp.sum((constants.CP_AIR * t + constants.HLV * qv) * delp, axis=0)
    h1 = jnp.sum((constants.CP_AIR * t_new + constants.HLV * qv_new) * delp,
                 axis=0)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-12)
    # net column latent heating: precipitation implies cp*dT column > 0
    heat = jnp.sum(constants.CP_AIR * (t_new - t) * delp, axis=0) / g
    np.testing.assert_allclose(
        np.asarray(heat), constants.HLV * np.asarray(precip) * DT, rtol=1e-6
    )


def test_deep_gate_rejects_shallow_cloud():
    """The shallow sounding (capped at 800 hPa) must NOT trigger deep
    convection (depth < min_depth floor likely holds; if it does trigger the
    tendencies must stay bounded)."""
    from pace_tpu.models.shield.sas import DeepConvectionConfig

    ua, va, t, qv, ql, pe, p_mid, delp = _column(unstable=True)
    cfg = DeepConvectionConfig(
        sensible_heat_flux=0.08, latent_heat_flux=8e-5, min_depth_pa=4.0e4
    )
    u_dt, v_dt, t_new, qv_new, ql_new, precip = sas_step(
        ua, va, t, qv, ql, pe, p_mid, delp, DT, cfg
    )
    assert float(jnp.max(jnp.abs(t_new - t))) == 0.0
    assert float(precip.max()) == 0.0


def test_shallow_mode_never_precipitates():
    ua, va, t, qv, ql, pe, p_mid, delp = _column(unstable=True)
    u_dt, v_dt, t_new, qv_new, ql_new, precip = sas_step(
        ua, va, t, qv, ql, pe, p_mid, delp, DT, CFG
    )
    assert float(jnp.abs(precip).max()) == 0.0
