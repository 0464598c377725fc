"""Thermodynamic sea ice (0-layer Semtner slab).

TPU-native analog of the reference's sea-ice slot: pySHiELD ports a sea-ice
scheme standalone but does not integrate it (reference
docs/physics/index.rst:5-8 "NOAH LSM, sea ice, SAS shallow convection, EDMF
PBL, RRTMG ported standalone but not integrated"). This module supplies that
capability TPU-first: a pure function over dense (.., Y, X) surface planes,
branchless via `jnp.where` (SPMD: ice-covered and ice-free points run the
same program).

Semtner (1976) 0-layer model:

- the ice+snow slab is in quasi-steady conduction: the conductive flux is
  F_c = (T_freeze_ocean - T_s) / (h_i/k_i + h_s/k_s), the same through the
  whole slab;
- the surface temperature solves the energy balance
  (1-a)*SW + e*LW_dn - e*sigma*Ts^4 - H - LE + F_c = 0 by Newton iteration,
  capped at the melting point; the capped-out surplus melts snow first, then
  ice;
- the ice bottom grows when the conductive flux exceeds the ocean mixed-layer
  heat flux (rho_i * L_f * dh/dt = F_c - F_ocean) and melts otherwise;
- frozen precipitation accumulates as snow on the ice.

Ice-free points behave as fixed-temperature open ocean (skin at the
prescribed mixed-layer temperature, bulk fluxes, beta = 1) until the column
freezes new ice (mixed-layer flux deficit at T_freeze).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants
from .microphysics import (
    d_saturation_mixing_ratio_dt, saturation_mixing_ratio,
)
from .radiation import SIGMA_SB

RHO_ICE = 917.0      #: [kg/m^3]
RHO_SNOW = 330.0
RHO_WATER = 1000.0
K_ICE = 2.03         #: conductivity [W/m/K]
K_SNOW = 0.31
T_FREEZE_OCEAN = 271.35  #: seawater freezing point [K]
T_MELT = constants.TICE  #: fresh-ice surface melting point


@dataclasses.dataclass(frozen=True)
class SeaIceConfig:
    """Tuning knobs (Semtner-like defaults)."""

    albedo_ice: float = 0.6
    albedo_snow: float = 0.75
    albedo_ocean: float = 0.06
    emissivity: float = 0.97
    z0: float = 5.0e-4           #: roughness over ice [m]
    karman: float = 0.4
    ocean_heat_flux: float = 2.0  #: mixed-layer flux to the ice bottom [W/m^2]
    sst: float = 274.0           #: open-ocean mixed-layer temperature [K]
    h_min: float = 0.01          #: below this the point is ice-free [m]
    newton_iters: int = 3
    #: --- slab ocean: prognostic mixed-layer SST for open water (the
    #: aquaplanet/Frierson-hierarchy lower boundary); without it open water
    #: sits at the fixed cfg.sst
    slab_ocean: bool = False
    mixed_layer_depth: float = 30.0  #: slab depth [m]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SeaIceState:
    """Prognostic ice state (per surface point)."""

    h_ice: jnp.ndarray   #: ice thickness [m]        (.., Y, X)
    h_snow: jnp.ndarray  #: snow depth on ice [m]    (.., Y, X)
    tsfc: jnp.ndarray    #: surface temperature [K]  (.., Y, X)
    sst: jnp.ndarray     #: mixed-layer ocean temperature [K] (.., Y, X)

    @classmethod
    def init(cls, shape, h0=1.0, t0=265.0, sst0=None, dtype=jnp.float32):
        if sst0 is None:
            sst0 = max(t0, T_FREEZE_OCEAN)
        return cls(
            h_ice=jnp.full(shape, h0, dtype=dtype),
            h_snow=jnp.zeros(shape, dtype=dtype),
            tsfc=jnp.full(shape, t0, dtype=dtype),
            sst=jnp.full(shape, sst0, dtype=dtype),
        )


def seaice_step(t1, qv1, wind1, z1, p_sfc, sw_dn, lw_dn, precip,
                state: SeaIceState, dt: float, cfg: SeaIceConfig):
    """One sea-ice step. Forcing args as in lsm.lsm_step; returns
    ``(fluxes, new_state)`` with the same flux dict convention (W/m^2 +
    kinematic forms for pbl.py / sas.py)."""
    cp, lv = constants.CP_AIR, constants.HLV
    ls = lv + constants.HLF  # sublimation
    wind = jnp.maximum(wind1, 0.1)
    rho = p_sfc / (constants.RDGAS * t1 * (1.0 + constants.ZVIR * qv1))
    ch = (cfg.karman / jnp.log(jnp.maximum(z1 / cfg.z0, 1.1))) ** 2 * wind

    icy = state.h_ice >= cfg.h_min
    snowy = state.h_snow > 1.0e-4
    albedo = jnp.where(
        icy, jnp.where(snowy, cfg.albedo_snow, cfg.albedo_ice),
        cfg.albedo_ocean,
    )
    sw_abs = (1.0 - albedo) * sw_dn
    emis = cfg.emissivity
    lheat = jnp.where(icy, ls, lv)

    # slab conductance (guard h for the ice-free branch; masked out below)
    resist = (jnp.maximum(state.h_ice, cfg.h_min) / K_ICE
              + state.h_snow / K_SNOW)
    cond = 1.0 / resist

    def balance(ts):
        qs = saturation_mixing_ratio(ts, p_sfc)
        h = rho * cp * ch * (ts - t1)
        le = rho * lheat * ch * jnp.maximum(qs - qv1, 0.0)
        rad = sw_abs + emis * lw_dn - emis * SIGMA_SB * ts**4
        fc = cond * (T_FREEZE_OCEAN - ts)
        return rad - h - le + fc

    sst_open = state.sst if cfg.slab_ocean else jnp.broadcast_to(
        jnp.asarray(cfg.sst, state.tsfc.dtype), state.tsfc.shape
    )
    ts = jnp.where(icy, state.tsfc, sst_open)
    for _ in range(cfg.newton_iters):
        qs = saturation_mixing_ratio(ts, p_sfc)
        dqsdt = d_saturation_mixing_ratio_dt(ts, p_sfc, qs)
        evaporating = (qs - qv1) > 0.0
        dfdt = (
            -4.0 * emis * SIGMA_SB * ts**3
            - rho * cp * ch
            - jnp.where(evaporating, rho * lheat * ch * dqsdt, 0.0)
            - cond
        )
        ts = ts - balance(ts) / dfdt
    # melting cap: surplus energy melts snow first, then ice
    ts_capped = jnp.minimum(ts, T_MELT)
    melt_flux = jnp.where(
        icy & (ts > T_MELT), jnp.maximum(balance(ts_capped), 0.0), 0.0
    )
    ts = jnp.where(icy, ts_capped, sst_open)

    melt_m = melt_flux * dt / (constants.HLF * RHO_SNOW)  # as snow depth
    snow_melt = jnp.minimum(melt_m, state.h_snow)
    leftover_flux = melt_flux * (1.0 - snow_melt / jnp.maximum(melt_m, 1e-30))
    ice_surf_melt = jnp.minimum(
        leftover_flux * dt / (constants.HLF * RHO_ICE), state.h_ice
    )

    # bottom growth/melt: rho_i * Lf * dh/dt = F_c - F_ocean
    fc = jnp.where(icy, cond * (T_FREEZE_OCEAN - ts), 0.0)
    dh_bottom = jnp.where(
        icy, dt * (fc - cfg.ocean_heat_flux) / (constants.HLF * RHO_ICE), 0.0
    )
    # ice-free ocean freeze-up. Slab mode: prognose the mixed-layer SST from
    # the surface energy balance; the part of the cooling that would take the
    # slab below freezing freezes new ice instead (exact energy bookkeeping).
    # Fixed-SST mode: freeze at the rate of the balance deficit at T_freeze.
    cw_slab = RHO_WATER * 4218.0 * cfg.mixed_layer_depth  # [J/m^2/K]
    if cfg.slab_ocean:
        # open-water balance at the slab temperature (cond term excluded)
        qs_o = saturation_mixing_ratio(sst_open, p_sfc)
        net_open = (
            (1.0 - cfg.albedo_ocean) * sw_dn
            + emis * lw_dn - emis * SIGMA_SB * sst_open**4
            - rho * cp * ch * (sst_open - t1)
            - rho * lv * ch * jnp.maximum(qs_o - qv1, 0.0)
            + cfg.ocean_heat_flux
        )
        sst_raw = sst_open + dt * net_open / cw_slab
        freeze_def = jnp.maximum(T_FREEZE_OCEAN - sst_raw, 0.0) * cw_slab
        new_ice = jnp.where(
            ~icy, freeze_def / (constants.HLF * RHO_ICE), 0.0
        )
        sst_new = jnp.where(
            icy, T_FREEZE_OCEAN, jnp.maximum(sst_raw, T_FREEZE_OCEAN)
        )
    else:
        deficit = -(balance(jnp.full_like(ts, T_FREEZE_OCEAN))
                    + cfg.ocean_heat_flux)
        new_ice = jnp.where(
            ~icy & (deficit > 0.0),
            dt * deficit / (constants.HLF * RHO_ICE), 0.0,
        )
        sst_new = state.sst

    is_frozen = t1 < constants.TICE
    snowfall = jnp.where(icy & is_frozen, precip, 0.0)  # [kg/m^2/s]

    h_ice_new = jnp.maximum(
        jnp.where(icy, state.h_ice + dh_bottom - ice_surf_melt, new_ice), 0.0
    )
    h_snow_new = jnp.maximum(
        jnp.where(icy, state.h_snow + dt * snowfall / RHO_SNOW - snow_melt,
                  0.0), 0.0,
    )
    # snow on vanished ice is gone (dumped to the ocean)
    h_snow_new = jnp.where(h_ice_new >= cfg.h_min, h_snow_new, 0.0)

    qs = saturation_mixing_ratio(ts, p_sfc)
    shf = rho * cp * ch * (ts - t1)
    evap = rho * ch * jnp.maximum(qs - qv1, 0.0)
    lhf = lheat * evap
    rnet = sw_abs + emis * lw_dn - emis * SIGMA_SB * ts**4

    new_state = SeaIceState(h_ice=h_ice_new, h_snow=h_snow_new, tsfc=ts,
                            sst=sst_new)
    fluxes = {
        "shf": shf,
        "lhf": lhf,
        "conductive": fc,
        "net_radiation": rnet,
        "evap": evap,
        "bottom_growth": jnp.where(icy, dh_bottom, new_ice) / dt,
        "sensible_heat_flux": shf / (rho * cp),
        "latent_heat_flux": evap / rho,
    }
    return fluxes, new_state
