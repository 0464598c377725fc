"""NOAH-style land-surface-model tests: surface energy balance closure, soil
heat conservation, moisture stress and budget, snow accumulation/melt."""

import jax.numpy as jnp
import numpy as np

from pace_tpu import constants
from pace_tpu.models.shield.lsm import (
    LSMConfig, LSMState, SOIL_DZ, lsm_step
)
from pace_tpu.models.shield.radiation import SIGMA_SB


Y, X = 3, 4
CFG = LSMConfig()
DT = 600.0


def _forcing(t1=295.0, qv1=0.008, sw=600.0, precip=0.0):
    shp = (Y, X)
    return dict(
        t1=jnp.full(shp, t1),
        qv1=jnp.full(shp, qv1),
        wind1=jnp.full(shp, 4.0),
        z1=jnp.full(shp, 50.0),
        p_sfc=jnp.full(shp, 1.0e5),
        sw_dn=jnp.full(shp, sw),
        lw_dn=jnp.full(shp, 350.0),
        precip=jnp.full(shp, precip),
    )


def test_energy_balance_closes():
    state = LSMState.init((Y, X), t0=290.0, smc0=0.25, dtype=jnp.float64)
    f = _forcing()
    fx, new = lsm_step(**f, state=state, dt=DT, cfg=CFG)
    # Newton residual: Rnet - H - LE - G ~ 0 at the solved skin temperature
    resid = np.asarray(fx["net_radiation"] - fx["shf"] - fx["lhf"]
                       - fx["ground"])
    assert np.abs(resid).max() < 0.5  # W/m^2
    assert float(new.tskin.min()) > 280.0 and float(new.tskin.max()) < 340.0
    # sunny + warm + wet: strong evaporation, net upward turbulent flux
    assert float(fx["lhf"].min()) > 50.0
    assert float((fx["shf"] + fx["lhf"]).min()) > 0.0


def test_soil_heat_column_conservation():
    state = LSMState.init((Y, X), t0=290.0, dtype=jnp.float64)
    # perturb the soil profile so diffusion actually does something
    stc = np.asarray(state.stc).copy()
    stc[0] = 296.0
    stc[2] = 284.0
    state = LSMState(tskin=state.tskin, stc=jnp.asarray(stc),
                     smc=state.smc, sneqv=state.sneqv)
    fx, new = lsm_step(**_forcing(), state=state, dt=DT, cfg=CFG)
    dzs = np.asarray(SOIL_DZ)
    de = CFG.soil_heat_capacity * np.einsum(
        "kyx,k->yx", np.asarray(new.stc - state.stc), dzs
    )
    np.testing.assert_allclose(de, DT * np.asarray(fx["ground"]), rtol=1e-10)


def test_dry_soil_suppresses_evaporation():
    wet = LSMState.init((Y, X), t0=290.0, smc0=0.35, dtype=jnp.float64)
    dry = LSMState.init((Y, X), t0=290.0, smc0=CFG.smcwlt, dtype=jnp.float64)
    f = _forcing()
    fx_wet, _ = lsm_step(**f, state=wet, dt=DT, cfg=CFG)
    fx_dry, _ = lsm_step(**f, state=dry, dt=DT, cfg=CFG)
    assert float(fx_dry["lhf"].max()) == 0.0
    assert float(fx_wet["lhf"].min()) > 10.0
    # the energy denied to evaporation shows up as extra sensible heating
    assert float(fx_dry["shf"].mean()) > float(fx_wet["shf"].mean())


def test_rain_wets_soil_and_saturation_runs_off():
    state = LSMState.init((Y, X), t0=285.0, smc0=0.2, dtype=jnp.float64)
    f = _forcing(t1=285.0, sw=100.0, precip=5e-3)  # heavy rain, 18 mm/h
    fx, new = lsm_step(**f, state=state, dt=DT, cfg=CFG)
    assert float((new.smc[0] - state.smc[0]).min()) > 0.0
    # saturated soil cannot exceed porosity
    sat = LSMState.init((Y, X), t0=285.0, smc0=CFG.smcmax, dtype=jnp.float64)
    fx2, new2 = lsm_step(**f, state=sat, dt=DT, cfg=CFG)
    assert float(new2.smc.max()) <= CFG.smcmax + 1e-12
    assert float(new.sneqv.max()) == 0.0  # warm rain, no snow


def test_snow_accumulates_caps_tskin_and_melts():
    state = LSMState.init((Y, X), t0=268.0, smc0=0.25, dtype=jnp.float64)
    cold = _forcing(t1=265.0, qv1=0.002, sw=50.0, precip=2e-3)
    fx, snowy = lsm_step(**cold, state=state, dt=DT, cfg=CFG)
    assert float(snowy.sneqv.min()) > 0.0
    # now strong sun over snow: skin capped at freezing, snow melts
    sunny = _forcing(t1=280.0, qv1=0.005, sw=900.0, precip=0.0)
    fx2, melted = lsm_step(**sunny, state=snowy, dt=DT, cfg=CFG)
    assert float(melted.tskin.max()) <= constants.TICE + 1e-9
    assert float((snowy.sneqv - melted.sneqv).min()) > 0.0
    assert float(fx2["snowmelt"].min()) > 0.0


def test_kinematic_fluxes_consistent():
    state = LSMState.init((Y, X), t0=292.0, smc0=0.3, dtype=jnp.float64)
    f = _forcing()
    fx, _ = lsm_step(**f, state=state, dt=DT, cfg=CFG)
    rho = np.asarray(f["p_sfc"] / (constants.RDGAS * f["t1"]
                                   * (1.0 + constants.ZVIR * f["qv1"])))
    np.testing.assert_allclose(
        np.asarray(fx["sensible_heat_flux"]) * rho * constants.CP_AIR,
        np.asarray(fx["shf"]), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(fx["latent_heat_flux"]) * rho * constants.HLV,
        np.asarray(fx["lhf"]), rtol=1e-12,
    )


def test_snowy_surface_reflects_more():
    base = LSMState.init((Y, X), t0=270.0, smc0=0.25, dtype=jnp.float64)
    snowy = LSMState(tskin=base.tskin, stc=base.stc, smc=base.smc,
                     sneqv=jnp.full((Y, X), 0.05))
    f = _forcing(t1=270.0, qv1=0.002, sw=700.0)
    fx_bare, _ = lsm_step(**f, state=base, dt=DT, cfg=CFG)
    fx_snow, _ = lsm_step(**f, state=snowy, dt=DT, cfg=CFG)
    assert float(fx_snow["net_radiation"].max()) \
        < float(fx_bare["net_radiation"].min())


def test_snow_sublimates_not_soil():
    """Snow-covered land: the latent flux is sublimation — it depletes the
    snowpack (not layer-0 soil moisture) and uses lv + lf."""
    snowy = LSMState(
        tskin=jnp.full((Y, X), 265.0),
        stc=jnp.full((4, Y, X), 265.0),
        smc=jnp.full((4, Y, X), 0.25),
        sneqv=jnp.full((Y, X), 0.05),
    )
    f = _forcing(t1=264.0, qv1=0.0005, sw=200.0)  # dry air over snow
    fx, new = lsm_step(**f, state=snowy, dt=DT, cfg=CFG)
    assert float(fx["evap"].min()) > 0.0
    # vapor came out of the snowpack...
    assert float(new.sneqv.max()) < 0.05
    # ...not the soil
    np.testing.assert_array_equal(np.asarray(new.smc[0]),
                                  np.asarray(snowy.smc[0]))
    # sublimation enthalpy: lhf = (lv + lf) * evap
    np.testing.assert_allclose(
        np.asarray(fx["lhf"]),
        (constants.HLV + constants.HLF) * np.asarray(fx["evap"]), rtol=1e-12,
    )
