"""Reed & Jablonowski (2012) "simple physics" suite for idealized
tropical-cyclone runs.

The canonical physics companion of the analytic TC initial condition
(reference analytic_init case "tropicalcyclone",
reference driver/examples/configs/tropicalcyclone_c128.yaml) — the pairing
used for the published intensification curves this framework's TC anchor
validates against (docs/testing.md). Three column components, applied in
the RJ2012 order:

1. **Large-scale condensation**: supersaturated levels condense to
   saturation (Clausius-Clapeyron), latent heat warms the level, condensate
   rains out immediately (no re-evaporation, no cloud stage).
2. **Bulk aerodynamic surface fluxes** (the WISHE engine of TC
   intensification): wind-dependent exchange over a fixed-SST ocean,
   Cd = 7e-4 + 6.5e-5 |v| (capped 2e-3 above 20 m/s), C_H = C_E = 1.1e-3,
   applied implicitly to the lowest level.
3. **PBL diffusion**: implicit vertical diffusion of momentum, potential
   temperature and moisture with K = C |v1| z_a below 850 hPa, Gaussian
   decay above (pblconst 100 hPa).

All three are embarrassingly parallel over columns — pure vectorized jnp
over (S, K, Y, X) with a k-scan for the implicit diffusion solve; TPU-
native, no per-column loops.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants


@dataclasses.dataclass(frozen=True)
class SimplePhysicsConfig:
    sst: float = 302.15          #: fixed sea-surface temperature [K]
    cd0: float = 7.0e-4          #: neutral drag coefficient intercept
    cd1: float = 6.5e-5          #: drag coefficient wind slope [s/m]
    cd_cap: float = 2.0e-3       #: drag above 20 m/s (RJ2012 eq. 12)
    c_hq: float = 1.1e-3         #: heat/moisture exchange coefficient
    pbl_top: float = 850.0e2     #: full-strength diffusion below [Pa]
    pbl_const: float = 100.0e2   #: Gaussian decay scale above [Pa]
    #: saturation vapor pressure constants (RJ2012 eq. 5)
    e0: float = 610.78
    t0c: float = 273.16


def _qsat(t, p, cfg: SimplePhysicsConfig):
    """Saturation mixing ratio, RJ2012's Clausius-Clapeyron form."""
    es = cfg.e0 * jnp.exp(
        (constants.HLV / constants.RVGAS) * (1.0 / cfg.t0c - 1.0 / t)
    )
    return (constants.RDGAS / constants.RVGAS) * es / jnp.maximum(p, es)


def _condense(t, qv, p_mid, delp, dt, cfg):
    """Component 1: large-scale condensation + immediate rain-out."""
    qs = _qsat(t, p_mid, cfg)
    gamma = 1.0 + (
        constants.HLV**2 * qs
        / (constants.CP_AIR * constants.RVGAS * t**2)
    )
    dq = jnp.maximum(qv - qs, 0.0) / gamma
    t = t + (constants.HLV / constants.CP_AIR) * dq
    qv = qv - dq
    precip = jnp.sum(dq * delp, axis=-3) / constants.GRAV  # [kg/m^2]
    return t, qv, precip


def _tridiag_implicit(x, ka, dp_mid, dp_int, dt):
    """Solve (I - dt * D) x_new = x for implicit vertical diffusion in
    pressure coordinates, D the flux-form diffusion operator with
    interface diffusivities ``ka`` (already in Pa^2/s: K * (rho g)^2).

    Layout: k axis -3, K levels; ka at interior interfaces (K-1 values).
    Thomas algorithm as a lax.scan over k — (Y, X) planes stay vectorized
    (SURVEY.md §7 hard-part 3 pattern)."""
    K = x.shape[-3]
    # sub/super-diagonal coefficients: c[k] couples level k and k+1
    c = dt * ka / (dp_int * dp_mid[..., :-1, :, :])   # upper coupling
    a = dt * ka / (dp_int * dp_mid[..., 1:, :, :])    # lower coupling
    zero = jnp.zeros_like(x[..., :1, :, :])
    lower = jnp.concatenate([zero, -a], axis=-3)          # a_k x_{k-1}
    upper = jnp.concatenate([-c, zero], axis=-3)          # c_k x_{k+1}
    diag = 1.0 - lower - upper

    # Thomas forward sweep (scan over k)
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a_k, b_k, c_k, d_k = inp
        denom = b_k - a_k * cp_prev
        cp = c_k / denom
        dpp = (d_k - a_k * dp_prev) / denom
        return (cp, dpp), (cp, dpp)

    ax = jnp.moveaxis(lower, -3, 0)
    bx = jnp.moveaxis(diag, -3, 0)
    cx = jnp.moveaxis(upper, -3, 0)
    dx = jnp.moveaxis(x, -3, 0)
    init = (jnp.zeros_like(dx[0]), jnp.zeros_like(dx[0]))
    _, (cps, dps) = jax.lax.scan(fwd, init, (ax, bx, cx, dx))

    def back(x_next, inp):
        cp_k, dp_k = inp
        x_k = dp_k - cp_k * x_next
        return x_k, x_k

    _, xs = jax.lax.scan(
        back, jnp.zeros_like(dx[0]), (cps, dps), reverse=True
    )
    return jnp.moveaxis(xs, 0, -3)


def simple_physics_step(ua, va, t, qv, pe, p_mid, delp, phis, dt,
                        cfg: SimplePhysicsConfig):
    """One RJ2012 simple-physics step on A-grid columns.

    ua/va/t/qv: (S, K, Y, X) lowest level at k=K-1; pe: (S, K+1, Y, X).
    Returns (u_dt, v_dt, t_new, qv_new, precip_rate[kg/m^2/s]) with the
    wind changes as A-grid tendencies (the caller projects them to the
    D-grid via apply_wind_tendencies, like every other scheme)."""
    ua0, va0 = ua, va
    # --- 1. large-scale condensation
    t, qv, precip = _condense(t, qv, p_mid, delp, dt, cfg)

    # --- 2. bulk surface fluxes, implicit on the lowest level
    u1 = ua[..., -1:, :, :]
    v1 = va[..., -1:, :, :]
    t1 = t[..., -1:, :, :]
    q1 = qv[..., -1:, :, :]
    wind = jnp.sqrt(u1 * u1 + v1 * v1)
    cd = jnp.where(
        wind < 20.0, cfg.cd0 + cfg.cd1 * wind, cfg.cd_cap
    )
    # lowest-level height above the surface [m]
    ps = pe[..., -1:, :, :]
    ta_v = t1 * (1.0 + constants.ZVIR * q1)
    za = (
        constants.RDGAS * ta_v / constants.GRAV
        * jnp.log(ps / p_mid[..., -1:, :, :])
    )
    fm = 1.0 / (1.0 + cd * wind * dt / za)
    u1n = u1 * fm
    v1n = v1 * fm
    ch = cfg.c_hq
    fh = ch * wind * dt / za
    qsat_s = _qsat(jnp.full_like(t1, cfg.sst), ps, cfg)
    t1n = (t1 + fh * cfg.sst) / (1.0 + fh)
    q1n = (q1 + fh * qsat_s) / (1.0 + fh)
    ua = jnp.concatenate([ua[..., :-1, :, :], u1n], axis=-3)
    va = jnp.concatenate([va[..., :-1, :, :], v1n], axis=-3)
    t = jnp.concatenate([t[..., :-1, :, :], t1n], axis=-3)
    qv = jnp.concatenate([qv[..., :-1, :, :], q1n], axis=-3)

    # --- 3. PBL diffusion (implicit, pressure-coordinate flux form)
    p_int = pe[..., 1:-1, :, :]  # interior interfaces (K-1)
    shape_decay = jnp.where(
        p_int > cfg.pbl_top,
        1.0,
        jnp.exp(-(((cfg.pbl_top - p_int) / cfg.pbl_const) ** 2)),
    )
    km_s = cd * wind * za       # momentum diffusivity at the surface [m^2/s]
    ke_s = ch * wind * za
    # interface air density^2 g^2 factor converts K [m^2/s] to Pa^2/s
    t_int = 0.5 * (t[..., 1:, :, :] + t[..., :-1, :, :])
    qv_int = 0.5 * (qv[..., 1:, :, :] + qv[..., :-1, :, :])
    rho = p_int / (
        constants.RDGAS * t_int * (1.0 + constants.ZVIR * qv_int)
    )
    fac = (rho * constants.GRAV) ** 2
    dp_int = p_mid[..., 1:, :, :] - p_mid[..., :-1, :, :]
    dp_mid = delp
    km = km_s * shape_decay * fac
    ke = ke_s * shape_decay * fac

    ua_n = _tridiag_implicit(ua, km, dp_mid, dp_int, dt)
    va_n = _tridiag_implicit(va, km, dp_mid, dp_int, dt)
    # diffuse potential temperature (RJ2012) on the model levels
    exner = (p_mid / 1.0e5) ** (constants.RDGAS / constants.CP_AIR)
    theta = t / exner
    theta_n = _tridiag_implicit(theta, ke, dp_mid, dp_int, dt)
    t_n = theta_n * exner
    qv_n = _tridiag_implicit(qv, ke, dp_mid, dp_int, dt)

    u_dt = (ua_n - ua0) / dt
    v_dt = (va_n - va0) / dt
    return u_dt, v_dt, t_n, qv_n, precip / dt


__all__ = ["SimplePhysicsConfig", "simple_physics_step"]
