"""GFS-style planetary-boundary-layer scheme (K-profile + implicit diffusion).

TPU-native analog of the reference's PBL slot: pySHiELD ports the GFS EDMF
PBL standalone but does not integrate it (reference docs/physics/index.rst:5-8
"NOAH LSM, sea ice, SAS shallow convection, EDMF PBL, RRTMG ported standalone
but not integrated"); the driver-provided baseline's milestone list names a
"c192 + GFS microphysics/PBL driver loop". This module supplies that scheme
in a TPU-first form:

- **column-parallel**: every (S, Y, X) column is independent; the only
  sequential axis is k, handled by one `lax.scan` Thomas solve that keeps the
  whole horizontal plane vectorized on lanes/sublanes (the layout rule of
  docs/performance.md).
- **K-profile (Troen-Mahrt / Han-Pan form)** inside the diagnosed boundary
  layer: K_m(z) = karman * ustar * z * (1 - z/h)^2, with the PBL top h from
  the bulk-Richardson criterion (first level where Ri_b > ricr), computed by
  dense comparison counting — no gather/searchsorted (TPU pitfall, see
  docs/performance.md).
- **local Louis-type mixing** above the PBL: K = l^2 * |dU/dz| * f(Ri) with
  Blackadar length l = karman*z / (1 + karman*z/l0).
- **backward-Euler implicit vertical diffusion** of momentum (A-grid winds),
  dry static energy s = cp*T + g*z, and water vapor; implicit surface drag
  from a neutral log-law bulk coefficient. Unconditionally stable at any dt.

Index convention: k increases DOWNWARD (k=0 model top), like the dycore.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants


@dataclasses.dataclass(frozen=True)
class PBLConfig:
    """Tuning knobs (GFS-like defaults)."""

    karman: float = 0.4
    ricr: float = 0.25        #: bulk-Ri PBL-top criterion
    z0: float = 0.01          #: surface roughness length [m] (ocean-ish)
    l0: float = 150.0         #: asymptotic mixing length [m]
    k_max: float = 300.0      #: ceiling on eddy diffusivity [m^2/s]
    k_background: float = 0.01  #: floor (free troposphere) [m^2/s]
    prandtl: float = 1.0      #: K_m / K_h
    #: prescribed kinematic surface fluxes (idealized runs have no LSM):
    sensible_heat_flux: float = 0.0  #: w'T' [K m/s]
    latent_heat_flux: float = 0.0    #: w'q' [kg/kg m/s]


def _tridiag_solve(lower, diag, upper, rhs):
    """Thomas algorithm along axis -3 (the k axis), vectorized over columns.

    lower[k] couples to k-1, upper[k] to k+1; lower[0] and upper[-1] ignored.
    One `lax.scan` forward sweep + one backward — the k axis is the only
    sequential dimension, (S, Y, X) stays dense (same pattern as the sim1
    column solver, reference riem_solver sim1_solver analog).
    """
    kax = -3
    lower = jnp.moveaxis(lower, kax, 0)
    diag = jnp.moveaxis(diag, kax, 0)
    upper = jnp.moveaxis(upper, kax, 0)
    rhs = jnp.moveaxis(rhs, kax, 0)

    def fwd(carry, x):
        cp_prev, dp_prev = carry
        lo, di, up, rh = x
        denom = di - lo * cp_prev
        cp = up / denom
        dp = (rh - lo * dp_prev) / denom
        return (cp, dp), (cp, dp)

    z = jnp.zeros_like(diag[0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (z, z), (lower, diag, upper, rhs))

    def bwd(x_next, x):
        cp, dp = x
        xk = dp - cp * x_next
        return xk, xk

    _, xs = jax.lax.scan(bwd, z, (cps, dps), reverse=True)
    return jnp.moveaxis(xs, 0, kax)


def _diffusivities(ua, va, thv, z_mid, z_if, cfg: PBLConfig):
    """Eddy diffusivity K_m at interior interfaces (K-1 of them) + ustar, h."""
    # surface layer = lowest model level (index -1 in k)
    u1 = ua[..., -1, :, :]
    v1 = va[..., -1, :, :]
    spd1 = jnp.sqrt(u1 * u1 + v1 * v1) + 1e-6
    z1 = z_mid[..., -1, :, :]
    cd = (cfg.karman / jnp.log(jnp.maximum(z1 / cfg.z0, 1.1))) ** 2
    ustar = jnp.sqrt(cd) * spd1

    # --- bulk Richardson number of each level w.r.t. the surface level
    thv1 = thv[..., -1, :, :]
    du = ua - u1[..., None, :, :]
    dv = va - v1[..., None, :, :]
    spd2 = du * du + dv * dv + 1e-4
    rib = (
        constants.GRAV
        * (z_mid - z1[..., None, :, :])
        * (thv - thv1[..., None, :, :])
        / (thv1[..., None, :, :] * spd2)
    )
    # PBL height: lowest z (scanning upward from the surface) whose Ri_b
    # exceeds ricr. "Within PBL" = every level between it and the surface is
    # subcritical — a cumprod from the bottom (dense, no gather).
    sub = (rib <= cfg.ricr).astype(z_mid.dtype)
    within = jnp.flip(jnp.cumprod(jnp.flip(sub, axis=-3), axis=-3), axis=-3)
    h = jnp.max(z_mid * within, axis=-3) + 1e-3  # (S, Y, X)

    # --- K-profile inside the PBL, at interior interfaces k=1..K-1
    z_int = z_if[..., 1:-1, :, :]  # interior interface heights
    hb = h[..., None, :, :]
    zfrac = jnp.clip(z_int / hb, 0.0, 1.0)
    k_pbl = (
        cfg.karman
        * ustar[..., None, :, :]
        * z_int
        * (1.0 - zfrac) ** 2
        * (z_int < hb)
    )

    # --- local Louis scheme above the PBL
    dz = z_mid[..., :-1, :, :] - z_mid[..., 1:, :, :]  # >0 (k increases down)
    dz = jnp.maximum(dz, 1.0)
    shear = (
        jnp.sqrt(
            (ua[..., :-1, :, :] - ua[..., 1:, :, :]) ** 2
            + (va[..., :-1, :, :] - va[..., 1:, :, :]) ** 2
        )
        / dz
    )
    dthv = (thv[..., :-1, :, :] - thv[..., 1:, :, :]) / dz
    thv_if = 0.5 * (thv[..., :-1, :, :] + thv[..., 1:, :, :])
    ri = constants.GRAV * dthv / (thv_if * jnp.maximum(shear, 1e-6) ** 2)
    l_mix = cfg.karman * z_int / (1.0 + cfg.karman * z_int / cfg.l0)
    f_stable = jnp.maximum(1.0 - ri / cfg.ricr, 0.0) ** 2
    f_unstable = jnp.sqrt(jnp.maximum(1.0 - 18.0 * ri, 1.0))
    k_free = l_mix**2 * shear * jnp.where(ri >= 0.0, f_stable, f_unstable)

    k_m = jnp.clip(jnp.maximum(k_pbl, k_free), cfg.k_background, cfg.k_max)
    return k_m, ustar, cd, spd1, h


def pbl_step(ua, va, t, qv, pe, p_mid, delp, z_sfc, dt: float, cfg: PBLConfig):
    """One PBL step. All fields (S, K, Y, X) on the A grid; pe (S, K+1, Y, X).

    Returns (u_dt, v_dt, t_new, qv_new, pbl_height): *tendencies* for the
    winds (applied by the caller through the A->D projection) and updated
    thermodynamic fields.
    """
    # virtual temperature / heights (hydrostatic integration of peln)
    tv = t * (1.0 + constants.ZVIR * qv)
    peln = jnp.log(pe)
    dz = constants.RDGAS * tv / constants.GRAV * (
        peln[..., 1:, :, :] - peln[..., :-1, :, :]
    )  # (S, K, Y, X) layer thickness, >0
    # interface heights above the surface, top (k=0) .. bottom (k=K)
    z_if_rel = jnp.flip(
        jnp.cumsum(jnp.flip(dz, axis=-3), axis=-3), axis=-3
    )  # height of each layer's TOP interface
    z_if = jnp.concatenate(
        [z_if_rel, jnp.zeros_like(z_if_rel[..., :1, :, :])], axis=-3
    )
    z_mid = 0.5 * (z_if[..., :-1, :, :] + z_if[..., 1:, :, :])

    thv = tv * (constants.P_REF / p_mid) ** constants.KAPPA
    k_m, ustar, cd, spd1, h = _diffusivities(ua, va, thv, z_mid, z_if, cfg)
    k_h = k_m / cfg.prandtl

    # implicit diffusion in pressure coordinates:
    #   dX_k/dt = g/δp_k * [ (rho^2 g K / δp̂)_{k+1/2} (X_{k+1}-X_k) - ... ]
    rho_if = p_mid / (constants.RDGAS * tv)  # layer rho; average to ifaces
    rho2 = (0.5 * (rho_if[..., :-1, :, :] + rho_if[..., 1:, :, :])) ** 2
    dp_if = p_mid[..., 1:, :, :] - p_mid[..., :-1, :, :]  # >0
    g2 = constants.GRAV**2

    def build(k_edge, sfc_drag):
        a = dt * g2 * rho2 * k_edge / dp_if  # (S, K-1, Y, X), edge factor
        a_dn = a / delp[..., :-1, :, :]  # coupling of layer k to k+1
        a_up = a / delp[..., 1:, :, :]  # coupling of layer k+1 to k
        zero = jnp.zeros_like(delp[..., :1, :, :])
        lower = jnp.concatenate([zero, -a_up], axis=-3)
        upper = jnp.concatenate([-a_dn, zero], axis=-3)
        diag = 1.0 - lower - upper
        if sfc_drag is not None:
            diag = diag.at[..., -1, :, :].add(sfc_drag)
        return lower, diag, upper

    # momentum: implicit surface drag dt*g*rho1*Cd*|U1|/δp_K
    rho1 = rho_if[..., -1, :, :]
    sfc_m = dt * constants.GRAV * rho1 * cd * spd1 / delp[..., -1, :, :]
    lo, di, up = build(k_m, sfc_m)
    ua_new = _tridiag_solve(lo, di, up, ua)
    va_new = _tridiag_solve(lo, di, up, va)

    # dry static energy and moisture (zero-flux surface unless prescribed)
    s = constants.CP_AIR * t + constants.GRAV * z_mid
    lo, di, up = build(k_h, None)
    rhs_s = s.at[..., -1, :, :].add(
        dt * constants.GRAV * rho1 * constants.CP_AIR * cfg.sensible_heat_flux
        / delp[..., -1, :, :]
    )
    rhs_q = qv.at[..., -1, :, :].add(
        dt * constants.GRAV * rho1 * cfg.latent_heat_flux / delp[..., -1, :, :]
    )
    s_new = _tridiag_solve(lo, di, up, rhs_s)
    qv_new = jnp.maximum(_tridiag_solve(lo, di, up, rhs_q), 0.0)
    t_new = (s_new - constants.GRAV * z_mid) / constants.CP_AIR

    u_dt = (ua_new - ua) / dt
    v_dt = (va_new - va) / dt
    return u_dt, v_dt, t_new, qv_new, h
