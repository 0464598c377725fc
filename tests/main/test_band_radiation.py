"""Multi-band (RRTMG-class) radiation: spectral physics the gray scheme
cannot represent — CO2 radiative forcing, water-vapor greenhouse, window-band
transparency — plus exact column energy closure and coupled integration.
(Reference parity: RRTMG is 'ported standalone but not integrated',
reference docs/physics/index.rst:5-8; here the correlated-k band scheme is
both standalone-tested and integrable as the 'band_radiation' package.)
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from pace_tpu import constants
from pace_tpu.models.shield.band_radiation import (
    BandRadiationConfig, N_LW, band_radiation_step_fluxes,
    lw_band_optical_depths, olr, planck_band_fractions, sw_fluxes,
)


def _midlat_column(K=30, Y=2, X=2, t_sfc=288.0, q0=0.01):
    """Moist hydrostatic column: T decreasing 6.5 K/km to 210 K tropopause,
    vapor decaying with pressure^3."""
    pe = jnp.asarray(
        np.linspace(20e2, 1000e2, K + 1)[None, :, None, None]
        * np.ones((1, 1, Y, X))
    )
    p_mid = 0.5 * (pe[:, 1:] + pe[:, :-1])
    t = jnp.maximum(210.0, t_sfc * (p_mid / 1000e2) ** 0.19)
    qv = q0 * (p_mid / 1000e2) ** 3
    pkz = (p_mid / constants.P_REF) ** constants.KAPPA
    pt = t / pkz
    ps = pe[:, -1]
    return pt, pkz, pe, ps, qv, t


def test_planck_fractions_partition_unity():
    t = jnp.asarray(np.linspace(160.0, 330.0, 30))
    f = planck_band_fractions(t)
    assert f.shape == (N_LW, 30)
    np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)), 1.0, rtol=1e-12)
    assert (np.asarray(f) >= 0).all()
    # warmer bodies emit a larger fraction at high wavenumbers (Wien)
    assert float(f[3, -1]) > float(f[3, 0])


def test_clear_sky_olr_realistic_and_window_dominated():
    cfg = BandRadiationConfig()
    pt, pkz, pe, ps, qv, t = _midlat_column()
    r = float(olr(pt, pkz, pe, ps, cfg, qv=qv)[0, 0, 0])
    assert 180.0 < r < 320.0, r
    # window band (b=2) must be far more transparent than the H2O rotation
    # band (b=0): compare column optical depths
    delp = pe[:, 1:] - pe[:, :-1]
    p_mid = 0.5 * (pe[:, 1:] + pe[:, :-1])
    tau = lw_band_optical_depths(qv, None, p_mid, delp, cfg)
    tau_col = np.asarray(jnp.sum(tau, axis=-3))[..., 0, 0]
    assert tau_col[0][0] > 5.0 * tau_col[2][0]


def test_co2_doubling_positive_forcing():
    cfg1 = BandRadiationConfig(co2_ppmv=400.0)
    cfg2 = BandRadiationConfig(co2_ppmv=800.0)
    pt, pkz, pe, ps, qv, t = _midlat_column()
    o1 = float(olr(pt, pkz, pe, ps, cfg1, qv=qv)[0, 0, 0])
    o2 = float(olr(pt, pkz, pe, ps, cfg2, qv=qv)[0, 0, 0])
    forcing = o1 - o2
    assert 0.3 < forcing < 15.0, forcing


def test_water_vapor_greenhouse():
    cfg = BandRadiationConfig()
    pt, pkz, pe, ps, qv, t = _midlat_column(q0=0.004)
    pt2, pkz2, pe2, ps2, qv2, _ = _midlat_column(q0=0.016)
    o_dry = float(olr(pt, pkz, pe, ps, cfg, qv=qv)[0, 0, 0])
    o_wet = float(olr(pt2, pkz2, pe2, ps2, cfg, qv=qv2)[0, 0, 0])
    assert o_wet < o_dry - 2.0


def test_clouds_reduce_olr_and_surface_sw():
    cfg = BandRadiationConfig()
    pt, pkz, pe, ps, qv, t = _midlat_column()
    qc = jnp.zeros_like(qv).at[:, 18:22].set(2e-4)  # mid-level cloud
    o_clear = float(olr(pt, pkz, pe, ps, cfg, qv=qv)[0, 0, 0])
    o_cloud = float(olr(pt, pkz, pe, ps, cfg, qv=qv, qc=qc)[0, 0, 0])
    assert o_cloud < o_clear - 5.0
    delp = pe[:, 1:] - pe[:, :-1]
    cosz = jnp.full(ps.shape, 0.5)
    sw_clear, _ = sw_fluxes(qv, None, delp, cosz, cfg)
    sw_cloud, _ = sw_fluxes(qv, qc, delp, cosz, cfg)
    assert float(sw_cloud[0, -1, 0, 0]) < float(sw_clear[0, -1, 0, 0]) - 20.0


def test_column_energy_closure():
    """cp/g * integral(dT) dp == (net TOA in) - (net through surface):
    the step's heating must be exactly the flux convergence."""
    cfg = BandRadiationConfig()
    pt, pkz, pe, ps, qv, t = _midlat_column()
    dt = 600.0
    pt2, lw_dn_sfc, sw_dn_sfc = band_radiation_step_fluxes(
        pt, pkz, pe, ps, dt, cfg, qv=qv
    )
    t2 = pt2 * pkz
    delp = pe[:, 1:] - pe[:, :-1]
    col_heat = float(jnp.sum(
        constants.CP_AIR / constants.GRAV * (t2 - t) * delp / dt,
        axis=-3,
    )[0, 0, 0])
    from pace_tpu.models.shield.band_radiation import lw_band_fluxes

    p_mid = 0.5 * (pe[:, 1:] + pe[:, :-1])
    dtau = lw_band_optical_depths(qv, None, p_mid, delp, cfg)
    up, down = lw_band_fluxes(pt * pkz, dtau, (pt * pkz)[..., -1, :, :])
    cosz = jnp.full(ps.shape, cfg.cos_zenith_mean)
    sw_dn, _ = sw_fluxes(qv, None, delp, cosz, cfg)
    net_in_toa = float((sw_dn[:, 0] - (up - down)[:, 0])[0, 0, 0])
    net_in_sfc = float((sw_dn[:, -1] - (up - down)[:, -1])[0, 0, 0])
    np.testing.assert_allclose(
        col_heat, net_in_toa - net_in_sfc, rtol=1e-6
    )


def test_integrated_in_physics():
    """'band_radiation' runs inside the coupled Physics loop."""
    import jax

    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.models.shield.physics import Physics

    mt = MetricTerms.generate(GridSpec(n_tile=12, npz=8, layout=(1, 1)))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(
        npz=8, k_split=1, n_split=2, hydrostatic=True, nord=1, d4_bg=0.12,
        tracer_dynamic_subcycle=False,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=600.0)
    phys = Physics(grid, ("band_radiation", "GFS_microphysics"), 600.0)
    state = DycoreState.from_baroclinic_init(
        mt, perturbation=True, moist=True, dtype=jnp.float64
    )
    pt0 = np.asarray(state.pt).copy()
    state = core.step_dynamics(state)
    state = phys(state)
    jax.block_until_ready(state.pt)
    assert np.isfinite(np.asarray(state.pt)).all()
    # radiation actually changed the temperature field
    assert not np.allclose(np.asarray(state.pt), pt0)
