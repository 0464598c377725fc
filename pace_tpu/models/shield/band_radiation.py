"""Multi-band (RRTMG-class) correlated-k radiation.

The reference ports RRTMG standalone (reference docs/physics/index.rst:5-8:
"RRTMG ported standalone but not integrated"; SURVEY.md §2.4). A line-by-line
RRTMG needs its external spectral tables (unavailable here), so this module
implements the same *class* of scheme TPU-natively: a correlated-k multi-band
model with per-band gas optics (H2O rotation / CO2 15 um / window+continuum /
H2O 6.3 um vibration-rotation / far tail), temperature-dependent Planck band
fractions (polynomial fits of the exact band-integrated Planck function,
precomputed at import), gray cloud longwave optics from the prognostic
condensate, and a 3-band shortwave (visible+Rayleigh, two NIR H2O k-bands)
with cloud reflection. Unlike the gray scheme this resolves the spectral
structure that carries the CO2 and water-vapor greenhouse effects — doubling
CO2 produces a positive radiative forcing (asserted by tests).

Numerics: the same exact exponential layer propagators as radiation.py (one
lax.scan down + one up per band — k-sequential, (i,j)-vectorized), with the
1.66 diffusivity factor for the angular integral. Column-local, so sharding
is untouched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ... import constants
from .radiation import SIGMA_SB

# ---------------------------------------------------------------------------
# LW band structure [cm^-1] and Planck band fractions
# ---------------------------------------------------------------------------
#: band edges in wavenumber: H2O rotation | CO2 15um | window | H2O 6.3um | tail
LW_EDGES = (0.0, 560.0, 800.0, 1200.0, 2200.0, 1.0e4)
N_LW = len(LW_EDGES) - 1

_H = 6.62607015e-34
_C = 2.99792458e8
_KB = 1.380649e-23


def _planck_band_fraction_exact(nu1, nu2, T):
    """Fraction of sigma T^4 emitted in [nu1, nu2] cm^-1 (numpy, numeric)."""
    nu = np.linspace(max(nu1, 1.0), nu2, 400) * 100.0  # -> m^-1
    x = _H * _C * nu / (_KB * T)
    # Planck in wavenumber: B ~ nu^3 / (exp(x)-1); normalize by pi^4/15
    integrand = x**3 / np.expm1(x)
    integral = np.trapezoid(integrand, x)
    return integral / (np.pi**4 / 15.0)


def _fit_band_fractions():
    """Cubic fits f_b(T) over 150-340 K (max abs error < 0.004)."""
    ts = np.linspace(150.0, 340.0, 40)
    coefs = []
    for b in range(N_LW):
        fr = np.array([
            _planck_band_fraction_exact(LW_EDGES[b], LW_EDGES[b + 1], t)
            for t in ts
        ])
        coefs.append(np.polyfit((ts - 250.0) / 100.0, fr, 3))
    return np.stack(coefs)  # (N_LW, 4)


_BAND_COEF = _fit_band_fractions()


def planck_band_fractions(t):
    """f_b(T) for every LW band; shape (N_LW,) + t.shape. Sums to ~1."""
    s = (t - 250.0) / 100.0
    c = jnp.asarray(_BAND_COEF, dtype=t.dtype)
    f = (
        ((c[:, 0, None] * s.reshape(-1) + c[:, 1, None]) * s.reshape(-1)
         + c[:, 2, None]) * s.reshape(-1) + c[:, 3, None]
    )
    f = jnp.clip(f, 0.0, 1.0)
    f = f / jnp.sum(f, axis=0)  # exact closure
    return f.reshape((N_LW,) + t.shape)


@dataclasses.dataclass(frozen=True)
class BandRadiationConfig:
    """Gas/cloud optical parameters. Absorption coefficients are effective
    band-mean (correlated-k single-g) values [m^2/kg of absorber], tuned so
    a moist midlatitude column gives clear-sky OLR ~ 260 W/m^2 and 2xCO2 a
    forcing of a few W/m^2 (pinned by tests/main/test_band_radiation.py)."""

    co2_ppmv: float = 400.0
    #: H2O band absorption [m^2/kg vapor]: rotation, 15um wing, window
    #: (continuum, scaled by vapor loading), 6.3um, tail. Tuned so the test
    #: midlat column gives clear-sky OLR ~235 W/m^2 and 2xCO2 ~7 W/m^2.
    k_h2o: tuple = (4.0, 1.0, 0.01, 1.5, 0.2)
    #: CO2 band absorption [m^2/kg CO2]: only the 15um band is strong
    k_co2: tuple = (0.0, 0.5, 0.01, 0.0, 0.02)
    #: pressure-broadening exponent: k ~ (p/p0)^alpha
    alpha_p: float = 0.8
    #: gray cloud LW absorption [m^2/kg condensate]
    k_cloud_lw: float = 100.0
    diffusivity: float = 1.66
    # --- shortwave
    solar_constant: float = 1360.0
    #: SW band split: visible+UV, near-IR weak, near-IR strong
    sw_frac: tuple = (0.52, 0.30, 0.18)
    k_sw_h2o: tuple = (0.0, 0.012, 0.35)  #: [m^2/kg vapor] per SW band
    rayleigh_albedo: float = 0.06  #: visible-band molecular reflection
    # NOTE: there is deliberately no surface_albedo here — the returned
    # sw_down_sfc is the downward flux BEFORE surface reflection, and the
    # interactive surface schemes own albedo (lsm.py snow-dependent,
    # seaice.py ice/snow/ocean), applying (1 - albedo) themselves.
    #: cloud SW optics: layer reflectance R = tau_c/(tau_c + g0)
    k_cloud_sw: float = 150.0  #: [m^2/kg condensate]
    cloud_g0: float = 7.0
    #: annual/diurnal-mean zenith factor when no sun geometry is supplied
    cos_zenith_mean: float = 0.25


def lw_band_fluxes(t_lay, dtau_b, t_surf):
    """Band-summed (up, down) interface fluxes [W/m^2].

    dtau_b: (N_LW, ..., K, Y, X) per-band layer optical depths (diffusivity
    included). Emission per band uses the local Planck fraction, so exchange
    between warm/cold layers is spectrally resolved."""
    f_lay = planck_band_fractions(t_lay)  # (N_LW, ..., K, Y, X)
    b_tot = SIGMA_SB * t_lay**4
    t_s = jnp.broadcast_to(t_surf, t_lay.shape[:-3] + t_lay.shape[-2:])
    f_sfc = planck_band_fractions(t_s)
    b_sfc = SIGMA_SB * t_s**4

    trans = jnp.exp(-dtau_b)
    emit = f_lay * b_tot * (1.0 - trans)

    def down_body(d, xs):
        tr, em = xs
        d = d * tr + em
        return d, d

    # scan over k with the band axis leading (vectorized across bands)
    tr_f = jnp.moveaxis(trans, -3, 0)  # (K, N_LW, ..., Y, X)
    em_f = jnp.moveaxis(emit, -3, 0)
    d_top = jnp.zeros_like(tr_f[0])
    _, d_rest = jax.lax.scan(down_body, d_top, (tr_f, em_f))
    down_b = jnp.concatenate([d_top[None], d_rest], axis=0)

    u_sfc = f_sfc * b_sfc
    _, u_rest = jax.lax.scan(down_body, u_sfc, (tr_f[::-1], em_f[::-1]))
    up_b = jnp.concatenate([u_sfc[None], u_rest], axis=0)[::-1]

    # sum bands, K back to axis -3
    up = jnp.moveaxis(jnp.sum(up_b, axis=1), 0, -3)
    down = jnp.moveaxis(jnp.sum(down_b, axis=1), 0, -3)
    return up, down


def lw_band_optical_depths(qv, qc, p_mid, delp, cfg: BandRadiationConfig):
    """(N_LW, ..., K, Y, X) per-band layer optical depths."""
    dm = delp / constants.GRAV  # air path [kg/m^2]
    u_v = qv * dm               # vapor path
    u_c2 = cfg.co2_ppmv * 1e-6 * (44.01 / 28.964) * dm
    scale = (p_mid / constants.P_REF) ** cfg.alpha_p
    parts = []
    for b in range(N_LW):
        tau = cfg.k_h2o[b] * u_v * scale + cfg.k_co2[b] * u_c2 * scale
        if b == 2:
            # window continuum: self-broadened, ~ vapor path * vapor loading
            tau = tau * (1.0 + 30.0 * qv)
        parts.append(tau)
    tau_b = jnp.stack(parts, axis=0)
    if qc is not None:
        tau_b = tau_b + cfg.k_cloud_lw * (qc * dm)[None]
    return cfg.diffusivity * tau_b


def sw_fluxes(qv, qc, delp, cosz, cfg: BandRadiationConfig):
    """Downward SW at interfaces, band-summed [W/m^2], plus the TOA input.

    Direct-beam Beer-Lambert per NIR band along the slant path; visible band
    attenuated only by Rayleigh + cloud reflection (applied at the top —
    random-overlap column reflectance from the total cloud path). Returns
    (sw_down_if, toa_in)."""
    dm = delp / constants.GRAV
    s0 = cfg.solar_constant * cosz
    # column cloud reflectance
    tau_c = cfg.k_cloud_sw * jnp.sum(qc * dm, axis=-3) if qc is not None \
        else jnp.zeros_like(jnp.sum(dm, axis=-3))
    r_cloud = tau_c / (tau_c + cfg.cloud_g0)
    slant = 1.0 / jnp.maximum(cosz, 0.05)

    downs = []
    for b in range(3):
        top = s0 * cfg.sw_frac[b]
        if b == 0:
            top = top * (1.0 - cfg.rayleigh_albedo)
        top = top * (1.0 - r_cloud)
        dtau = cfg.k_sw_h2o[b] * qv * dm * slant[..., None, :, :]
        # cumulative transmission to every interface
        ctau = jnp.cumsum(dtau, axis=-3)
        zeros = jnp.zeros_like(ctau[..., :1, :, :])
        ctau_if = jnp.concatenate([zeros, ctau], axis=-3)
        downs.append(top[..., None, :, :] * jnp.exp(-ctau_if))
    sw_dn = sum(downs)
    return sw_dn, s0


def band_radiation_step_fluxes(
    pt, pkz, pe, ps, dt: float, cfg: BandRadiationConfig,
    qv=None, qc=None, t_surf=None, cosz=None,
):
    """One multi-band radiation step on dycore fields.

    Returns (pt_new, lw_down_sfc, sw_down_sfc) — the same coupling surface
    as gray_radiation_step_fluxes + the atmospherically-attenuated SW.
    ``qc``: total condensate (liquid+ice) mixing ratio for cloud optics."""
    t_lay = pt * pkz
    delp = pe[..., 1:, :, :] - pe[..., :-1, :, :]
    p_mid = 0.5 * (pe[..., 1:, :, :] + pe[..., :-1, :, :])
    if qv is None:
        qv = jnp.zeros_like(t_lay)
    if t_surf is None:
        t_surf = t_lay[..., -1, :, :]
    if cosz is None:
        cosz = jnp.full(ps.shape, cfg.cos_zenith_mean, dtype=ps.dtype)

    dtau_b = lw_band_optical_depths(qv, qc, p_mid, delp, cfg)
    up, down = lw_band_fluxes(t_lay, dtau_b, t_surf)
    sw_dn, _ = sw_fluxes(qv, qc, delp, cosz, cfg)

    # heating from LW net-up divergence MINUS SW absorption divergence:
    # dT/dt = g/cp * d(up - down - sw_dn_netdown)/dp; sw term: absorbed =
    # -d(sw_dn)/dp (downward decreasing)
    dnet_lw = (up - down)[..., 1:, :, :] - (up - down)[..., :-1, :, :]
    dsw = sw_dn[..., :-1, :, :] - sw_dn[..., 1:, :, :]  # absorbed per layer
    heating = constants.GRAV / constants.CP_AIR * (dnet_lw + dsw) / delp
    t_new = t_lay + dt * heating
    return (
        pt * (t_new / t_lay),
        down[..., -1, :, :],
        sw_dn[..., -1, :, :],
    )


def olr(pt, pkz, pe, ps, cfg: BandRadiationConfig, qv=None, qc=None,
        t_surf=None):
    """Outgoing longwave at TOA [W/m^2] (diagnostic; used by tests)."""
    t_lay = pt * pkz
    delp = pe[..., 1:, :, :] - pe[..., :-1, :, :]
    p_mid = 0.5 * (pe[..., 1:, :, :] + pe[..., :-1, :, :])
    if qv is None:
        qv = jnp.zeros_like(t_lay)
    if t_surf is None:
        t_surf = t_lay[..., -1, :, :]
    dtau_b = lw_band_optical_depths(qv, qc, p_mid, delp, cfg)
    up, _ = lw_band_fluxes(t_lay, dtau_b, t_surf)
    return up[..., 0, :, :]
