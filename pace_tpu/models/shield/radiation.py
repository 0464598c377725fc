"""Gray-atmosphere radiation (Frierson et al. 2006): the standalone
radiation scheme.

The reference lists RRTMG as ported-standalone-but-not-integrated
(reference docs/physics/index.rst:5-8); line-by-line RRTMG needs external
spectral tables unavailable here, so the standalone scheme is the
community-standard gray two-stream model: one broadband longwave optical
depth, analytic two-stream integration down/up the column, plus
latitudinally-distributed shortwave absorbed at the surface feeding a
prescribed-temperature lower boundary. This is the radiation used by the
canonical "gray Held-Suarez-moist" hierarchy (Frierson, Held &
Zurita-Gotor 2006, J. Atmos. Sci.) and exercises the same column pattern
(k-sequential scan, (i,j)-parallel) a full RRTMG port would.

All fluxes are exact exponential-propagator integrals per layer (not Euler
steps), so the scheme is unconditionally stable in optical depth.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants

SIGMA_SB = 5.670374419e-8  #: Stefan-Boltzmann [W m^-2 K^-4]


@dataclasses.dataclass(frozen=True)
class GrayRadiationConfig:
    """Frierson et al. (2006) table 1 values."""

    tau0_eq: float = 6.0     #: surface LW optical depth, equator
    tau0_pole: float = 1.5   #: surface LW optical depth, pole
    f_l: float = 0.1         #: linear (well-mixed) fraction of tau(p)
    solar_constant: float = 1360.0
    albedo: float = 0.31
    del_sol: float = 1.4     #: P2(lat) shortwave contrast parameter
    t_surf: float = 288.0    #: prescribed surface temperature [K] (no slab)
    #: --- diurnal cycle (off = Frierson annual/diurnal-mean P2 forcing):
    diurnal: bool = False
    day_length: float = 86400.0     #: solar day [s]
    declination_deg: float = 0.0    #: solar declination (0 = equinox)
    #: seasonal cycle: declination follows the day of year (t=0 is Jan 1,
    #: northern winter); overrides declination_deg
    seasonal: bool = False
    year_length: float = 365.25 * 86400.0
    obliquity_deg: float = 23.44
    #: --- interactive water vapor (Byrne & O'Gorman 2013 extension of the
    #: gray scheme): tau built from the simulated humidity instead of the
    #: prescribed latitude profile — the water-vapor LW feedback
    interactive_vapor: bool = False
    kappa_v: float = 0.17    #: vapor LW absorption [m^2/kg]
    kappa_d: float = 1.5e-4  #: dry-air LW absorption [m^2/kg] (tau_dry ~1.5)


def optical_depth(p_if, ps, sinlat2, cfg: GrayRadiationConfig):
    """tau at layer interfaces: tau0(lat) * (f_l*s + (1-f_l)*s^4), s=p/ps."""
    tau0 = cfg.tau0_eq + (cfg.tau0_pole - cfg.tau0_eq) * sinlat2
    s = p_if / ps[..., None, :, :]
    return tau0[..., None, :, :] * (cfg.f_l * s + (1.0 - cfg.f_l) * s**4)


def optical_depth_interactive(qv, delp, cfg: GrayRadiationConfig):
    """tau at interfaces from the simulated humidity: d tau = (kappa_v*qv +
    kappa_d) dp/g (Byrne & O'Gorman 2013) — LW opacity responds to the model's
    own moisture field."""
    dtau = (cfg.kappa_v * qv + cfg.kappa_d) * delp / constants.GRAV
    zero = jnp.zeros_like(dtau[..., :1, :, :])
    return jnp.concatenate(
        [zero, jnp.cumsum(dtau, axis=-3)], axis=-3
    )


def lw_fluxes(t_lay, tau_if, t_surf):
    """Two-stream gray LW: exact per-layer exponential propagation.

    Down:  D_{k+1} = D_k e^{-dtau} + B_k (1 - e^{-dtau})
    Up:    U_k     = U_{k+1} e^{-dtau} + B_k (1 - e^{-dtau})
    with B = sigma T^4 per layer, D_top = 0, U_surf = sigma T_s^4.
    Returns (up, down) at interfaces, shape of ``tau_if``.
    """
    b_lay = SIGMA_SB * t_lay**4
    dtau = tau_if[..., 1:, :, :] - tau_if[..., :-1, :, :]
    trans = jnp.exp(-dtau)
    emit = b_lay * (1.0 - trans)

    # scan over k: axes (..., K, Y, X) -> move K to the front
    def down_body(d, xs):
        tr, em = xs
        d = d * tr + em
        return d, d

    tr_f = jnp.moveaxis(trans, -3, 0)
    em_f = jnp.moveaxis(emit, -3, 0)
    d_top = jnp.zeros_like(tr_f[0])
    _, d_rest = jax.lax.scan(down_body, d_top, (tr_f, em_f))
    down = jnp.concatenate(
        [d_top[None], d_rest], axis=0
    )  # (K+1, ..., Y, X)

    def up_body(u, xs):
        tr, em = xs
        u = u * tr + em
        return u, u

    u_surf = SIGMA_SB * jnp.broadcast_to(t_surf, tr_f.shape[1:]) ** 4
    _, u_rest = jax.lax.scan(
        up_body, u_surf, (tr_f[::-1], em_f[::-1])
    )
    up = jnp.concatenate([u_surf[None], u_rest], axis=0)[::-1]
    return jnp.moveaxis(up, 0, -3), jnp.moveaxis(down, 0, -3)


def sw_surface(sinlat2, cfg: GrayRadiationConfig):
    """Shortwave absorbed at the surface: S0/4 (1 + del_sol P2) (1-albedo)
    with P2 = (1 - 3 sin^2)/4 (annual-mean Frierson forcing); the gray
    atmosphere is SW-transparent so it only warms the (prescribed) surface —
    returned for diagnostics/energy closure."""
    p2 = (1.0 - 3.0 * sinlat2) / 4.0
    return (
        cfg.solar_constant / 4.0 * (1.0 + cfg.del_sol * p2)
        * (1.0 - cfg.albedo)
    )


def sw_down_surface(sinlat2, cfg: GrayRadiationConfig,
                    lat=None, lon=None, time_seconds=None):
    """Downward SW at the surface BEFORE surface albedo — what an interactive
    surface scheme (lsm.py / seaice.py) takes as forcing, applying its own
    albedo. The gray atmosphere is SW-transparent.

    Default: the Frierson annual/diurnal-mean P2 profile. With
    ``cfg.diurnal`` and (lat, lon [rad], time_seconds) supplied: instantaneous
    insolation S0 * max(cos(zenith), 0) from the solar hour angle — the
    diurnal cycle."""
    if cfg.diurnal and lat is not None and lon is not None \
            and time_seconds is not None:
        import numpy as np

        if cfg.seasonal:
            # declination ~ -obliquity * cos(2*pi*(doy+10)/365) (Jan-1 epoch,
            # solstice lag ~10 days)
            phase = 2.0 * jnp.pi * (
                time_seconds / cfg.year_length + 10.0 / 365.25
            )
            decl = -float(np.radians(cfg.obliquity_deg)) * jnp.cos(phase)
            sin_d, cos_d = jnp.sin(decl), jnp.cos(decl)
        else:
            decl = float(np.radians(cfg.declination_deg))
            sin_d, cos_d = float(np.sin(decl)), float(np.cos(decl))
        # hour angle: solar noon at lon=0 when time mod day = day/2
        hour = 2.0 * jnp.pi * (time_seconds / cfg.day_length) + lon - jnp.pi
        cosz = jnp.sin(lat) * sin_d + jnp.cos(lat) * cos_d * jnp.cos(hour)
        return cfg.solar_constant * jnp.maximum(cosz, 0.0)
    p2 = (1.0 - 3.0 * sinlat2) / 4.0
    return cfg.solar_constant / 4.0 * (1.0 + cfg.del_sol * p2)


def gray_radiation_step_fluxes(pt, pkz, pe, ps, sinlat2, dt: float,
                               cfg: GrayRadiationConfig, t_surf=None,
                               qv=None):
    """One radiation step on dycore fields: returns (updated pt, LW down at
    the surface [W/m^2]).

    Heating: dT/dt = g/cp * d(net_up)/dp with net_up = U - D, computed from
    exact layer propagators; applied explicitly (radiative time scales are
    days, vs dt of minutes). ``t_surf`` (scalar or (.., Y, X) array) overrides
    the prescribed surface temperature — the interactive-surface coupling.
    With ``interactive_vapor`` and a ``qv`` field, the optical depth comes
    from the simulated humidity instead of the prescribed latitude profile.
    """
    t_lay = pt * pkz  # dry: T = pt * pkz
    if cfg.interactive_vapor and qv is not None:
        delp = pe[..., 1:, :, :] - pe[..., :-1, :, :]
        tau = optical_depth_interactive(qv, delp, cfg)
    else:
        tau = optical_depth(pe, ps, sinlat2, cfg)
    if t_surf is None:
        t_surf = cfg.t_surf
    up, down = lw_fluxes(t_lay, tau, t_surf)
    net = up - down  # positive upward
    dnet = net[..., 1:, :, :] - net[..., :-1, :, :]
    dp = pe[..., 1:, :, :] - pe[..., :-1, :, :]
    heating = constants.GRAV / constants.CP_AIR * dnet / dp  # [K/s]
    t_new = t_lay + dt * heating
    return pt * (t_new / t_lay), down[..., -1, :, :]


def gray_radiation_step(pt, pkz, pe, ps, sinlat2, dt: float,
                        cfg: GrayRadiationConfig):
    """One radiation step on dycore fields: returns updated pt."""
    pt_new, _ = gray_radiation_step_fluxes(pt, pkz, pe, ps, sinlat2, dt, cfg)
    return pt_new
