"""NOAH-style land surface model.

TPU-native analog of the reference's land-surface slot: pySHiELD ports the
NOAH LSM standalone but does not integrate it (reference
docs/physics/index.rst:5-8 "NOAH LSM, sea ice, SAS shallow convection, EDMF
PBL, RRTMG ported standalone but not integrated"). This module supplies the
same capability in a TPU-first form: a pure function of (forcing, LSMState)
-> (fluxes, LSMState) over dense (.., Y, X) surface planes — no per-point
control flow, everything branchless via `jnp.where`, the 4-layer soil solves
as tiny fixed-size tridiagonals.

NOAH ingredients retained (simplified where the full scheme is empirical
table lookup):

- 4 soil layers at the NOAH standard thicknesses (0.1/0.3/0.6/1.0 m) for both
  temperature (implicit heat diffusion, zero-flux bottom) and volumetric
  moisture (gravity-free inter-layer diffusion + infiltration + runoff);
- surface energy balance solved for the skin temperature by Newton iteration:
  (1-a)*SW + e*LW_dn - e*sigma*Ts^4 = H + LE + G, with bulk-aerodynamic H and
  beta-limited LE (soil-moisture stress between wilting point and field
  capacity) and ground heat flux G into soil layer 1;
- snowpack (water equivalent): frozen precipitation accumulates, the skin
  temperature is capped at freezing while snow is present and the residual
  energy-balance surplus melts it; snow raises the albedo.

Outputs include the kinematic surface fluxes (w'T' [K m/s], w'q' [kg/kg m/s])
in exactly the form the PBL (pbl.py) and shallow-convection (sas.py) schemes
take, so an LSM-coupled run threads them through without unit juggling.

Index convention: soil layer 0 is the TOP layer.
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

#: NOAH standard soil-layer thicknesses [m], top first
SOIL_DZ = (0.1, 0.3, 0.6, 1.0)


@dataclasses.dataclass(frozen=True)
class LSMConfig:
    """Tuning knobs (NOAH-like defaults for a loam-ish soil)."""

    albedo: float = 0.2          #: snow-free surface albedo
    albedo_snow: float = 0.7     #: deep-snow albedo
    snow_albedo_swe: float = 0.01  #: SWE [m] at which snow albedo saturates
    emissivity: float = 0.95
    z0: float = 0.1              #: roughness length [m] (vegetated land)
    karman: float = 0.4
    soil_conductivity: float = 1.1   #: [W/m/K]
    soil_heat_capacity: float = 2.2e6  #: volumetric [J/m^3/K]
    smcmax: float = 0.45         #: porosity [m^3/m^3]
    smcref: float = 0.30         #: field capacity (beta=1 above this)
    smcwlt: float = 0.10         #: wilting point (beta=0 below this)
    smcdry: float = 0.05         #: air-dry floor for direct evaporation
    soil_diffusivity: float = 2.0e-7  #: moisture diffusivity [m^2/s]
    newton_iters: int = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LSMState:
    """Prognostic land state (per surface point)."""

    tskin: jnp.ndarray    #: skin temperature [K]           (.., Y, X)
    stc: jnp.ndarray      #: soil temperature [K]        (.., 4, Y, X)
    smc: jnp.ndarray      #: volumetric soil moisture    (.., 4, Y, X)
    sneqv: jnp.ndarray    #: snow water equivalent [m]      (.., Y, X)

    @classmethod
    def init(cls, shape, t0=288.0, smc0=0.25, dtype=jnp.float32):
        """Uniform initial land state over horizontal ``shape`` (.., Y, X)."""
        t = jnp.full(shape, t0, dtype=dtype)
        soil_shape = shape[:-2] + (len(SOIL_DZ),) + shape[-2:]
        return cls(
            tskin=t,
            stc=jnp.full(soil_shape, t0, dtype=dtype),
            smc=jnp.full(soil_shape, smc0, dtype=dtype),
            sneqv=jnp.zeros(shape, dtype=dtype),
        )


def _solve4_tridiag(lower, diag, upper, rhs):
    """Direct solve of a 4-layer tridiagonal system along axis -3 (unrolled
    Thomas — fixed tiny k extent, no scan needed)."""
    n = rhs.shape[-3]
    cp, dp = [], []
    for k in range(n):
        lo = lower[..., k, :, :] if k > 0 else 0.0
        cpk_prev = cp[k - 1] if k > 0 else 0.0
        dpk_prev = dp[k - 1] if k > 0 else 0.0
        denom = diag[..., k, :, :] - lo * cpk_prev
        cp.append(jnp.where(k < n - 1, upper[..., k, :, :], 0.0) / denom)
        dp.append((rhs[..., k, :, :] - lo * dpk_prev) / denom)
    xs = [None] * n
    xs[n - 1] = dp[n - 1]
    for k in range(n - 2, -1, -1):
        xs[k] = dp[k] - cp[k] * xs[k + 1]
    return jnp.stack(xs, axis=-3)


def lsm_step(t1, qv1, wind1, z1, p_sfc, sw_dn, lw_dn, precip,
             state: LSMState, dt: float, cfg: LSMConfig):
    """One land-surface step.

    Args: lowest-model-level temperature ``t1`` [K], vapor ``qv1``, wind speed
    ``wind1`` [m/s], height ``z1`` [m]; surface pressure [Pa]; downward SW/LW
    radiation [W/m^2]; ``precip`` rate [kg/m^2/s]; all (.., Y, X).

    Returns ``(fluxes, new_state)`` where ``fluxes`` is a dict with W/m^2
    entries (shf, lhf, ground, net_radiation) and the kinematic
    ``sensible_heat_flux`` [K m/s] / ``latent_heat_flux`` [kg/kg m/s] the PBL
    and shallow-convection schemes consume.
    """
    cp, lv, g = constants.CP_AIR, constants.HLV, constants.GRAV
    dz1 = SOIL_DZ[0]
    wind = jnp.maximum(wind1, 0.1)
    rho = p_sfc / (constants.RDGAS * t1 * (1.0 + constants.ZVIR * qv1))

    # bulk exchange coefficient (neutral log law — NOAH's sfcdif analog
    # without the stability-function tables)
    ch = (cfg.karman / jnp.log(jnp.maximum(z1 / cfg.z0, 1.1))) ** 2 * wind

    # snow modifies albedo; deep snow asymptote
    has_snow = state.sneqv > 0.0
    snow_frac = jnp.clip(state.sneqv / cfg.snow_albedo_swe, 0.0, 1.0)
    albedo = cfg.albedo + snow_frac * (cfg.albedo_snow - cfg.albedo)
    sw_abs = (1.0 - albedo) * sw_dn

    # snow cover: the latent flux is SUBLIMATION (lv + lf) from the snowpack,
    # not limited by soil moisture but by the snow AVAILABLE this step (a
    # trace of snow cannot sustain potential-rate sublimation for a whole
    # dt); bare soil evaporates (lv) with the NOAH beta moisture stress
    lheat = jnp.where(has_snow, lv + constants.HLF, lv)
    qs0 = saturation_mixing_ratio(state.tskin, p_sfc)
    evap_pot = rho * ch * jnp.maximum(qs0 - qv1, 0.0)  # [kg/m^2/s]
    beta_snow = jnp.clip(
        state.sneqv * 1000.0 / (dt * jnp.maximum(evap_pot, 1e-12)), 0.0, 1.0
    )
    beta = jnp.where(
        has_snow,
        beta_snow,
        jnp.clip(
            (state.smc[..., 0, :, :] - cfg.smcwlt)
            / (cfg.smcref - cfg.smcwlt),
            0.0, 1.0,
        ),
    )

    # --- surface energy balance: Newton solve for tskin
    emis = cfg.emissivity
    cond = 2.0 * cfg.soil_conductivity / dz1
    stc1 = state.stc[..., 0, :, :]

    def balance(ts):
        qs = saturation_mixing_ratio(ts, p_sfc)
        h = rho * cp * ch * (ts - t1)
        le = rho * lheat * ch * beta * jnp.maximum(qs - qv1, 0.0)
        gflux = cond * (ts - stc1)
        rad = sw_abs + emis * lw_dn - emis * SIGMA_SB * ts**4
        return rad - h - le - gflux

    ts = state.tskin
    for _ in range(cfg.newton_iters):
        qs = saturation_mixing_ratio(ts, p_sfc)
        dqsdt = d_saturation_mixing_ratio_dt(ts, p_sfc, qs)
        evaporating = (qs - qv1) > 0.0
        dfdt = (
            -4.0 * emis * SIGMA_SB * ts**3
            - rho * cp * ch
            - jnp.where(evaporating, rho * lheat * ch * beta * dqsdt, 0.0)
            - cond
        )
        ts = ts - balance(ts) / dfdt
    # snow cap: with snow on the ground the skin cannot exceed freezing;
    # the surplus energy melts snow instead
    ts_capped = jnp.where(has_snow, jnp.minimum(ts, constants.TICE), ts)
    melt_energy = jnp.where(
        has_snow & (ts > constants.TICE),
        jnp.maximum(balance(ts_capped), 0.0), 0.0,
    )
    ts = ts_capped
    melt = jnp.minimum(
        melt_energy / (constants.HLF * 1000.0) * dt, state.sneqv
    )  # [m] of water equivalent (rho_w = 1000)

    # final fluxes at the solved skin temperature
    qs = saturation_mixing_ratio(ts, p_sfc)
    shf = rho * cp * ch * (ts - t1)
    evap = rho * ch * beta * jnp.maximum(qs - qv1, 0.0)  # [kg/m^2/s]
    lhf = lheat * evap
    gflux = cond * (ts - stc1)
    rnet = sw_abs + emis * lw_dn - emis * SIGMA_SB * ts**4

    # --- soil temperature: implicit diffusion with top flux G, zero-flux
    # bottom (NOAH uses a fixed deep temperature; zero-flux is the common
    # idealized variant and keeps the column energy budget closed)
    dzs = jnp.asarray(SOIL_DZ, dtype=t1.dtype)
    kappa = cfg.soil_conductivity / cfg.soil_heat_capacity
    n = len(SOIL_DZ)
    # interface conductances between layers k,k+1: kappa / dz_between
    dz_between = 0.5 * (dzs[:-1] + dzs[1:])
    cond_if = kappa / dz_between  # (3,)
    shp = state.stc.shape
    a = jnp.zeros(shp, t1.dtype)  # sub-diagonal factors
    b = jnp.zeros(shp, t1.dtype)  # super-diagonal factors
    for k in range(n - 1):
        b = b.at[..., k, :, :].set(dt * cond_if[k] / dzs[k])
        a = a.at[..., k + 1, :, :].set(dt * cond_if[k] / dzs[k + 1])
    diag = 1.0 + a + b
    rhs = state.stc
    # ground heat flux enters layer 0 (treat explicitly — it was solved
    # consistently with the energy balance above)
    rhs = rhs.at[..., 0, :, :].add(
        dt * gflux / (cfg.soil_heat_capacity * dzs[0])
    )
    stc_new = _solve4_tridiag(-a, diag, -b, rhs)

    # --- soil moisture: infiltration of rain + snowmelt, beta evaporation
    # from layer 0, inter-layer diffusion, saturation-excess runoff
    is_frozen = t1 < constants.TICE
    rain = jnp.where(is_frozen, 0.0, precip)  # [kg/m^2/s]
    snowfall = jnp.where(is_frozen, precip, 0.0)
    infil = (rain / 1000.0 + melt / dt)  # [m/s] of liquid water
    smc = state.smc
    d_if = cfg.soil_diffusivity / dz_between
    flux_if = [
        d_if[k] * (smc[..., k, :, :] - smc[..., k + 1, :, :])
        for k in range(n - 1)
    ]  # positive downward-gradient exchange [m/s per unit dz] * dz = [m/s]
    dsmc = []
    for k in range(n):
        net = jnp.zeros_like(t1)
        if k > 0:
            net = net + flux_if[k - 1]
        if k < n - 1:
            net = net - flux_if[k]
        if k == 0:
            net = net + infil - jnp.where(has_snow, 0.0, evap) / 1000.0
        dsmc.append(net * dt / dzs[k])
    smc_new = smc + jnp.stack(dsmc, axis=-3)
    # runoff: clamp to [smcdry, smcmax] (excess leaves the column)
    smc_new = jnp.clip(smc_new, cfg.smcdry, cfg.smcmax)

    sublim = jnp.where(has_snow, evap, 0.0) * dt / 1000.0  # [m] w.e.
    sneqv_new = jnp.maximum(
        state.sneqv + dt * snowfall / 1000.0 - melt - sublim, 0.0
    )

    new_state = LSMState(tskin=ts, stc=stc_new, smc=smc_new, sneqv=sneqv_new)
    fluxes = {
        "shf": shf,
        "lhf": lhf,
        "ground": gflux,
        "net_radiation": rnet,
        "evap": evap,
        "snowmelt": melt / dt,
        # kinematic forms for pbl.py / sas.py
        "sensible_heat_flux": shf / (rho * cp),
        "latent_heat_flux": evap / rho,
    }
    return fluxes, new_state
