"""Semtner 0-layer sea-ice tests: energy-balance closure, winter growth,
summer melt, melting-point cap, snow handling, open-water freeze-up."""

import jax.numpy as jnp
import numpy as np

from pace_tpu import constants
from pace_tpu.models.shield.seaice import (
    SeaIceConfig, SeaIceState, T_FREEZE_OCEAN, T_MELT, seaice_step
)


Y, X = 3, 4
CFG = SeaIceConfig()
DT = 3600.0


def _forcing(t1=260.0, qv1=0.001, sw=0.0, lw=180.0, precip=0.0):
    shp = (Y, X)
    return dict(
        t1=jnp.full(shp, t1),
        qv1=jnp.full(shp, qv1),
        wind1=jnp.full(shp, 5.0),
        z1=jnp.full(shp, 30.0),
        p_sfc=jnp.full(shp, 1.01e5),
        sw_dn=jnp.full(shp, sw),
        lw_dn=jnp.full(shp, lw),
        precip=jnp.full(shp, precip),
    )


def test_winter_polar_night_grows_ice():
    state = SeaIceState.init((Y, X), h0=0.5, t0=255.0, dtype=jnp.float64)
    fx, new = seaice_step(**_forcing(t1=250.0, lw=150.0), state=state,
                          dt=DT, cfg=CFG)
    # strongly radiating surface: Ts well below freezing, conduction upward
    assert float(new.tsfc.max()) < T_FREEZE_OCEAN
    assert float(fx["conductive"].min()) > 0.0
    assert float((new.h_ice - state.h_ice).min()) > 0.0  # bottom growth
    # energy balance closes at the solved Ts
    resid = np.asarray(fx["net_radiation"] - fx["shf"] - fx["lhf"]
                       + fx["conductive"])
    assert np.abs(resid).max() < 0.5


def test_summer_melt_caps_surface_at_melting_point():
    state = SeaIceState.init((Y, X), h0=1.5, t0=271.0, dtype=jnp.float64)
    warm = _forcing(t1=278.0, qv1=0.004, sw=500.0, lw=320.0)
    fx, new = seaice_step(**warm, state=state, dt=DT, cfg=CFG)
    assert float(new.tsfc.max()) <= T_MELT + 1e-9
    assert float((state.h_ice - new.h_ice).min()) > 0.0  # ice melts


def test_snow_insulates_and_melts_first():
    bare = SeaIceState.init((Y, X), h0=1.0, t0=260.0, dtype=jnp.float64)
    snowy = SeaIceState(h_ice=bare.h_ice,
                        h_snow=jnp.full((Y, X), 0.2, dtype=jnp.float64),
                        tsfc=bare.tsfc, sst=bare.sst)
    cold = _forcing(t1=250.0, lw=150.0)
    fx_b, _ = seaice_step(**cold, state=bare, dt=DT, cfg=CFG)
    fx_s, _ = seaice_step(**cold, state=snowy, dt=DT, cfg=CFG)
    # snow insulation cuts the conductive flux -> slower winter growth
    assert float(fx_s["conductive"].max()) < float(fx_b["conductive"].min())
    # warm melt event: snow goes before ice does
    warm = _forcing(t1=278.0, qv1=0.004, sw=600.0, lw=330.0)
    fx2, melted = seaice_step(**warm, state=snowy, dt=DT, cfg=CFG)
    snow_loss = float((snowy.h_snow - melted.h_snow).min())
    assert snow_loss > 1e-3
    # ice only thins by (small) bottom melt — surface melt goes to snow first
    ice_loss = float((snowy.h_ice - melted.h_ice).max())
    assert ice_loss < 1e-3


def test_open_water_freezes_up_when_cold():
    state = SeaIceState.init((Y, X), h0=0.0, t0=274.0, dtype=jnp.float64)
    fx, new = seaice_step(**_forcing(t1=245.0, lw=120.0), state=state,
                          dt=86400.0, cfg=CFG)
    assert float(new.h_ice.min()) > 0.0
    # warm open water stays ice-free
    fx2, still_open = seaice_step(**_forcing(t1=280.0, qv1=0.005, sw=300.0,
                                             lw=330.0),
                                  state=state, dt=86400.0, cfg=CFG)
    assert float(still_open.h_ice.max()) == 0.0
    assert float(still_open.tsfc.max()) == CFG.sst


def test_snowfall_accumulates_on_ice_only():
    ice = SeaIceState.init((Y, X), h0=1.0, t0=260.0, dtype=jnp.float64)
    open_w = SeaIceState.init((Y, X), h0=0.0, t0=274.0, dtype=jnp.float64)
    snowstorm = _forcing(t1=262.0, precip=1e-3)
    _, on_ice = seaice_step(**snowstorm, state=ice, dt=DT, cfg=CFG)
    _, on_sea = seaice_step(**snowstorm, state=open_w, dt=DT, cfg=CFG)
    assert float(on_ice.h_snow.min()) > 0.0
    assert float(on_sea.h_snow.max()) == 0.0


def test_kinematic_flux_consistency():
    state = SeaIceState.init((Y, X), h0=1.0, t0=265.0, dtype=jnp.float64)
    f = _forcing(t1=263.0)
    fx, _ = seaice_step(**f, state=state, dt=DT, cfg=CFG)
    rho = np.asarray(f["p_sfc"] / (constants.RDGAS * f["t1"]
                                   * (1.0 + constants.ZVIR * f["qv1"])))
    np.testing.assert_allclose(
        np.asarray(fx["sensible_heat_flux"]) * rho * constants.CP_AIR,
        np.asarray(fx["shf"]), rtol=1e-12,
    )


def test_slab_ocean_warms_cools_and_freezes():
    """Prognostic mixed-layer SST: warms under sun, cools in polar night, and
    the below-freezing energy deficit freezes ice with exact bookkeeping."""
    from pace_tpu.models.shield.seaice import RHO_ICE

    cfg = SeaIceConfig(slab_ocean=True, mixed_layer_depth=10.0,
                       ocean_heat_flux=0.0)
    open_w = SeaIceState.init((Y, X), h0=0.0, t0=276.0, dtype=jnp.float64)
    sunny = _forcing(t1=278.0, qv1=0.006, sw=600.0, lw=340.0)
    _, warmed = seaice_step(**sunny, state=open_w, dt=3600.0, cfg=cfg)
    assert float((warmed.sst - open_w.sst).min()) > 0.0
    assert float(warmed.h_ice.max()) == 0.0

    night = _forcing(t1=250.0, qv1=0.001, sw=0.0, lw=140.0)
    _, cooled = seaice_step(**night, state=open_w, dt=3600.0, cfg=cfg)
    assert float((open_w.sst - cooled.sst).min()) > 0.0

    # near-freezing slab in polar night: cooling past T_freeze -> new ice,
    # energy deficit converted exactly (slab heat + latent heat balance)
    cold_sea = SeaIceState.init((Y, X), h0=0.0, t0=271.4, dtype=jnp.float64)
    _, frozen = seaice_step(**night, state=cold_sea, dt=6 * 3600.0, cfg=cfg)
    assert float(frozen.h_ice.min()) > 0.0
    assert float(frozen.sst.min()) >= T_FREEZE_OCEAN - 1e-9
    # skin of the new-ice point reported at the slab/freezing temperature
    assert float(frozen.tsfc.max()) <= 276.0


def test_slab_ocean_pinned_under_ice():
    cfg = SeaIceConfig(slab_ocean=True)
    ice = SeaIceState.init((Y, X), h0=1.0, t0=260.0, sst0=273.0,
                           dtype=jnp.float64)
    _, new = seaice_step(**_forcing(t1=255.0), state=ice, dt=3600.0, cfg=cfg)
    np.testing.assert_allclose(np.asarray(new.sst), T_FREEZE_OCEAN)
