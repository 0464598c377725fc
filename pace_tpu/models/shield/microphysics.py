"""GFDL-style single-moment 6-category cloud microphysics (column-local).

TPU-native analog of ``pySHiELD/stencils/microphysics.py`` (reference role per
SURVEY.md §2.4: 6-category vapor/liquid/ice/rain/snow/graupel single-moment
scheme — sedimentation, accretion, autoconversion, melting/freezing,
evaporation; scheme reference at reference docs/physics/microphysics.rst, the
CCPP GFDL cloud MP).

Implemented processes (v0 subset, marked vs the full scheme):
  [x] saturation adjustment (condensation/evaporation qv<->ql, latent heating)
  [x] homogeneous/instant freezing ql->qi below T_FREEZE_HOM; melting qi->ql
  [x] autoconversion ql->qr (threshold), qi->qs (threshold)
  [x] accretion of ql by rain
  [x] rain evaporation in subsaturated air
  [x] sedimentation of qr/qs/qg with implicit upwind fall (mass conserving)
  [ ] graupel sources (riming), Bergeron, subgrid cloud fraction, full
      GFDL fall-speed laws and time sub-cycling — future rounds.

Everything is elementwise or a k-scan: embarrassingly parallel over columns,
which XLA fuses across the whole (S, Y, X) plane (the reference's per-column
Fortran loops, vectorized).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants

T_FREEZE = 273.16
T_FREEZE_HOM = 233.16  # homogeneous freezing
QL_AUTO = 1.0e-3  # liquid autoconversion threshold [kg/kg]
QI_AUTO = 1.2e-4  # ice -> snow threshold
TAU_AUTO = 1800.0  # autoconversion timescale [s]
TAU_MELT = 900.0
TAU_EVAP = 600.0
ACCRETION_RATE = 2.2  # [m^3/kg/s]-ish bulk accretion factor
VFALL_RAIN = 6.0  # bulk terminal velocities [m/s]
VFALL_SNOW = 1.0
VFALL_GRAUPEL = 5.0


@dataclasses.dataclass(frozen=True)
class MicrophysicsConfig:
    do_sedimentation: bool = True
    do_warm_rain: bool = True
    do_ice: bool = True
    dt_split: int = 1  # physics sub-steps


def saturation_vapor_pressure(t):
    """Flatau-style liquid saturation vapor pressure [Pa] (clipped)."""
    tc = jnp.clip(t - T_FREEZE, -80.0, 50.0)
    return 611.21 * jnp.exp(17.502 * tc / (tc + 240.97))


def saturation_mixing_ratio(t, p):
    es = saturation_vapor_pressure(t)
    eps = constants.RDGAS / constants.RVGAS
    return eps * es / jnp.maximum(p - es, 1.0)


def d_saturation_mixing_ratio_dt(t, p, qsat=None):
    """Clausius-Clapeyron derivative d(qsat)/dT of the Flatau fit above —
    the one linearization every Newton solve in the physics layer uses
    (microphysics, LSM, sea ice, SAS plume)."""
    if qsat is None:
        qsat = saturation_mixing_ratio(t, p)
    tc = jnp.clip(t - T_FREEZE, -80.0, 50.0)
    return qsat * 17.502 * 240.97 / (tc + 240.97) ** 2


def microphysics_step(qv, ql, qi, qr, qs, qg, t, p, delp, dt, config=None):
    """One microphysics step on layer arrays (.., K, Y, X).

    ``t`` is temperature [K], ``p`` layer pressure [Pa]. Returns updated
    (qv, ql, qi, qr, qs, qg, t) with water and moist enthalpy conserved up to
    sedimentation flux through the surface (precipitation, returned last).
    """
    if config is None:
        config = MicrophysicsConfig()
    lv = constants.HLV
    lf = constants.HLF
    cp = constants.CP_AIR

    # --- saturation adjustment: relax qv toward qs with latent heating,
    # linearized in temperature (one Newton iteration)
    qsat = saturation_mixing_ratio(t, p)
    dqsdt = d_saturation_mixing_ratio_dt(t, p, qsat)
    excess = (qv - qsat) / (1.0 + (lv / cp) * dqsdt)
    cond = jnp.maximum(excess, -ql)  # cannot evaporate more than ql
    qv = qv - cond
    ql = ql + cond
    t = t + (lv / cp) * cond

    if config.do_ice:
        # instant freezing below homogeneous threshold; melting above 0C
        freeze = jnp.where(t < T_FREEZE_HOM, ql, 0.0)
        ql = ql - freeze
        qi = qi + freeze
        t = t + (lf / cp) * freeze
        melt = jnp.where(t > T_FREEZE, qi * jnp.minimum(dt / TAU_MELT, 1.0), 0.0)
        # limit melting so it cannot cool below freezing
        melt = jnp.minimum(melt, jnp.maximum(t - T_FREEZE, 0.0) * cp / lf)
        qi = qi - melt
        ql = ql + melt
        t = t - (lf / cp) * melt
        # snow melt likewise (to rain)
        smelt = jnp.where(t > T_FREEZE, qs * jnp.minimum(dt / TAU_MELT, 1.0), 0.0)
        smelt = jnp.minimum(smelt, jnp.maximum(t - T_FREEZE, 0.0) * cp / lf)
        qs = qs - smelt
        qr = qr + smelt
        t = t - (lf / cp) * smelt
        # ice -> snow autoconversion
        auto_i = jnp.maximum(qi - QI_AUTO, 0.0) * jnp.minimum(dt / TAU_AUTO, 1.0)
        qi = qi - auto_i
        qs = qs + auto_i

    if config.do_warm_rain:
        # liquid -> rain autoconversion + accretion
        auto = jnp.maximum(ql - QL_AUTO, 0.0) * jnp.minimum(dt / TAU_AUTO, 1.0)
        rho = p / (constants.RDGAS * jnp.maximum(t, 100.0))
        accr = ACCRETION_RATE * rho * qr * ql * dt
        to_rain = jnp.minimum(auto + accr, ql)
        ql = ql - to_rain
        qr = qr + to_rain
        # rain evaporation toward saturation in subsaturated air
        qsat2 = saturation_mixing_ratio(t, p)
        subsat = jnp.maximum(qsat2 - qv, 0.0)
        evap = jnp.minimum(
            qr * jnp.minimum(dt / TAU_EVAP, 1.0), subsat / (1.0 + (lv / cp) * dqsdt)
        )
        qr = qr - evap
        qv = qv + evap
        t = t - (lv / cp) * evap

    precip = jnp.zeros_like(t[..., 0, :, :])
    if config.do_sedimentation:
        qr, pr = _sediment(qr, delp, VFALL_RAIN, t, p, dt)
        qs, ps_ = _sediment(qs, delp, VFALL_SNOW, t, p, dt)
        qg, pg = _sediment(qg, delp, VFALL_GRAUPEL, t, p, dt)
        precip = pr + ps_ + pg

    return qv, ql, qi, qr, qs, qg, t, precip


def _sediment(q, delp, vfall, t, p, dt):
    """Implicit upwind sedimentation down the column (k-scan, conservative).

    Flux out of layer k feeds layer k+1; implicit weighting keeps it stable
    for any courant number. Returns (q_new, surface_precip [kg/m^2]).
    """
    rho = p / (constants.RDGAS * jnp.maximum(t, 100.0))
    dz = delp / (rho * constants.GRAV)  # layer geometric thickness [m]
    cr = vfall * dt / jnp.maximum(dz, 1.0)  # courant number

    def body(flux_in, args):
        qk, crk, dpk = args
        # implicit: q_new = (q + flux_in/dp) / (1 + cr)
        qn = (qk + flux_in / dpk) / (1.0 + crk)
        flux_out = qn * crk * dpk
        return flux_out, qn

    q_seq = jnp.moveaxis(q, -3, 0)
    cr_seq = jnp.moveaxis(cr, -3, 0)
    dp_seq = jnp.moveaxis(delp, -3, 0)
    flux0 = jnp.zeros_like(q_seq[0])
    flux_sfc, q_new = jax.lax.scan(body, flux0, (q_seq, cr_seq, dp_seq))
    return jnp.moveaxis(q_new, 0, -3), flux_sfc / constants.GRAV
