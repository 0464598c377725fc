"""Gray radiation tests (Frierson et al. 2006 two-stream scheme,
models/shield/radiation.py — the standalone-radiation slot of the
reference's physics roadmap, docs/physics/index.rst:5-8)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu import constants
from pace_tpu.models.shield.radiation import (
    SIGMA_SB,
    GrayRadiationConfig,
    gray_radiation_step,
    lw_fluxes,
    optical_depth,
    sw_surface,
)

S, K, Y, X = 2, 16, 4, 4


@pytest.fixture()
def column():
    ps = np.full((S, Y, X), 1.0e5)
    pe = np.linspace(100.0, 1.0e5, K + 1)[None, :, None, None] * np.ones(
        (S, 1, Y, X)
    )
    t = np.full((S, K, Y, X), 280.0)
    sinlat2 = np.full((S, Y, X), 0.25)
    return jnp.asarray(t), jnp.asarray(pe), jnp.asarray(ps), jnp.asarray(sinlat2)


def test_optical_depth_monotone_and_bounded(column):
    _, pe, ps, sinlat2 = column
    cfg = GrayRadiationConfig()
    tau = np.asarray(optical_depth(pe, ps, sinlat2, cfg))
    assert (np.diff(tau, axis=-3) > 0).all()  # increases downward
    tau0 = cfg.tau0_eq + (cfg.tau0_pole - cfg.tau0_eq) * 0.25
    np.testing.assert_allclose(tau[:, -1], tau0, rtol=1e-6)


def test_lw_limits(column):
    """Optically thick isothermal: interior fluxes -> blackbody; surface
    flux boundary conditions exact."""
    t, pe, ps, sinlat2 = column
    cfg = GrayRadiationConfig(t_surf=280.0)
    tau = optical_depth(pe, ps, sinlat2, cfg) * 50.0  # very thick
    up, down = lw_fluxes(t, tau, cfg.t_surf)
    b = SIGMA_SB * 280.0**4
    np.testing.assert_allclose(np.asarray(up)[:, -1], b, rtol=1e-6)
    assert np.asarray(down)[:, 0].max() == 0.0  # no downwelling at TOA
    # deep interior saturates to blackbody
    np.testing.assert_allclose(np.asarray(down)[:, -2], b, rtol=1e-3)


def test_energy_closure(column):
    """Column-integrated heating == net flux convergence of the column."""
    t, pe, ps, sinlat2 = column
    cfg = GrayRadiationConfig()
    tau = optical_depth(pe, ps, sinlat2, cfg)
    up, down = lw_fluxes(t, tau, cfg.t_surf)
    net = np.asarray(up - down)
    dt = 600.0
    pkz = jnp.ones((S, K, Y, X))
    pt_new = gray_radiation_step(t, pkz, pe, ps, sinlat2, dt, cfg)
    dT = np.asarray(pt_new - t)
    dp = np.asarray(pe)[:, 1:] - np.asarray(pe)[:, :-1]
    col_heat = (constants.CP_AIR / constants.GRAV * dT * dp / dt).sum(axis=1)
    np.testing.assert_allclose(
        col_heat, net[:, -1] - net[:, 0], rtol=1e-5
    )


def test_isothermal_cools_to_space(column):
    t, pe, ps, sinlat2 = column
    cfg = GrayRadiationConfig(t_surf=280.0)  # surface = air temperature
    pkz = jnp.ones((S, K, Y, X))
    pt_new = np.asarray(
        gray_radiation_step(t, pkz, pe, ps, sinlat2, 600.0, cfg)
    )
    dT = pt_new - np.asarray(t)
    # whole column loses energy (emission to space, nothing comes in)
    assert dT.sum() < 0
    # magnitude sane: well under 10 K/day at dt=600s
    assert np.abs(dT).max() < 10.0 / 144.0


def test_hot_surface_warms_lowest_layer(column):
    t, pe, ps, sinlat2 = column
    cfg = GrayRadiationConfig(t_surf=330.0)
    pkz = jnp.ones((S, K, Y, X))
    pt_new = np.asarray(
        gray_radiation_step(t, pkz, pe, ps, sinlat2, 600.0, cfg)
    )
    assert (pt_new[:, -1] > np.asarray(t)[:, -1]).all()


def test_sw_surface_equator_exceeds_pole():
    cfg = GrayRadiationConfig()
    assert sw_surface(jnp.array(0.0), cfg) > sw_surface(jnp.array(1.0), cfg)


def test_physics_integration():
    """gray_radiation as a Physics scheme on a real dycore state."""
    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.models.shield.physics import Physics

    spec = GridSpec(n_tile=12, npz=8, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float32)
    phys = Physics(grid, ("gray_radiation",), 600.0)
    out = phys(state)
    pt = np.asarray(out.pt)[:, :, 3:-3, 3:-3]
    assert np.isfinite(pt).all()
    assert not np.array_equal(pt, np.asarray(state.pt)[:, :, 3:-3, 3:-3])


def test_interactive_vapor_optical_depth():
    """Byrne-O'Gorman interactive tau: moist columns are more LW-opaque, so
    more LW reaches the surface from a warm moist atmosphere; tau is monotone
    in k and increases with humidity."""
    import dataclasses as _dc

    from pace_tpu.models.shield.radiation import (
        GrayRadiationConfig, gray_radiation_step_fluxes,
        optical_depth_interactive,
    )

    K, Y, X = 20, 2, 3
    ps = 1.0e5
    pe = jnp.broadcast_to(
        jnp.linspace(2000.0, ps, K + 1)[:, None, None], (K + 1, Y, X)
    )
    p_mid = 0.5 * (pe[1:] + pe[:-1])
    delp = pe[1:] - pe[:-1]
    t = 300.0 * (p_mid / ps) ** 0.22
    pkz = (p_mid / 1.0e5) ** (2.0 / 7.0)
    pt = t / pkz
    qv_moist = 0.018 * (p_mid / ps) ** 3
    qv_dry = 0.1 * qv_moist
    cfg = GrayRadiationConfig(interactive_vapor=True)

    tau_m = optical_depth_interactive(qv_moist, delp, cfg)
    tau_d = optical_depth_interactive(qv_dry, delp, cfg)
    assert float(jnp.min(jnp.diff(tau_m, axis=0))) > 0.0  # monotone down
    assert float(tau_m[-1].min()) > float(tau_d[-1].max())  # moist opaque

    _, lw_moist = gray_radiation_step_fluxes(
        pt, pkz, pe, pe[-1], jnp.zeros((Y, X)), 600.0, cfg, qv=qv_moist
    )
    _, lw_dry = gray_radiation_step_fluxes(
        pt, pkz, pe, pe[-1], jnp.zeros((Y, X)), 600.0, cfg, qv=qv_dry
    )
    assert float(lw_moist.min()) > float(lw_dry.max())
    # without qv the scheme must fall back to the prescribed profile
    pt2, lw2 = gray_radiation_step_fluxes(
        pt, pkz, pe, pe[-1], jnp.zeros((Y, X)), 600.0, cfg
    )
    assert bool(jnp.isfinite(pt2).all())


def test_diurnal_cycle_insolation():
    """Diurnal SW: zero at local night, S0*cos(zenith) at local noon; the
    default (annual-mean) path is unchanged when diurnal is off."""
    from pace_tpu.models.shield.radiation import (
        GrayRadiationConfig, sw_down_surface,
    )

    cfg = GrayRadiationConfig(diurnal=True)
    lat = jnp.zeros((2, 3))       # equator
    lon = jnp.zeros((2, 3))       # lon 0
    # solar noon at lon=0: time = day/2
    noon = sw_down_surface(jnp.zeros((2, 3)), cfg, lat=lat, lon=lon,
                           time_seconds=jnp.asarray(43200.0))
    midnight = sw_down_surface(jnp.zeros((2, 3)), cfg, lat=lat, lon=lon,
                               time_seconds=jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(noon), cfg.solar_constant,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(midnight), 0.0, atol=1e-9)
    # opposite longitude is in daylight at our midnight
    far = sw_down_surface(jnp.zeros((2, 3)), cfg, lat=lat,
                          lon=jnp.full((2, 3), np.pi),
                          time_seconds=jnp.asarray(0.0))
    assert float(far.min()) > 0.9 * cfg.solar_constant
    # diurnal off -> Frierson profile regardless of time args
    off = GrayRadiationConfig(diurnal=False)
    base = sw_down_surface(jnp.zeros((2, 3)), off)
    with_t = sw_down_surface(jnp.zeros((2, 3)), off, lat=lat, lon=lon,
                             time_seconds=jnp.asarray(1234.0))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_t))


def test_seasonal_declination():
    """Seasonal mode: polar day/night flip between solstices."""
    from pace_tpu.models.shield.radiation import (
        GrayRadiationConfig, sw_down_surface,
    )

    cfg = GrayRadiationConfig(diurnal=True, seasonal=True)
    lat_n = jnp.full((1, 1), np.radians(80.0))   # high Arctic
    lon = jnp.zeros((1, 1))
    half_year = cfg.year_length / 2.0
    # integrate over one solar day at each season: mean insolation
    def daily_mean(t0):
        ts = [t0 + f * cfg.day_length for f in np.linspace(0, 1, 25)[:-1]]
        return float(sum(
            sw_down_surface(jnp.zeros((1, 1)), cfg, lat=lat_n, lon=lon,
                            time_seconds=jnp.asarray(t)).mean()
            for t in ts
        ) / len(ts))

    winter = daily_mean(0.0)          # early January: polar night
    summer = daily_mean(half_year)    # early July: midnight sun
    assert winter < 1.0
    assert summer > 100.0
