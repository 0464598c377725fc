"""EDMF planetary-boundary-layer scheme (eddy-diffusivity mass-flux).

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
- **mass-flux component (the MF in EDMF)**: under convective conditions a
  single entraining updraft (Siebesma et al. 2007) transports s and qv
  non-locally through the conservative flux form shared with the shallow-
  convection scheme (mf_common.py) — this is the counter-gradient transport
  a pure K-profile misses. `lax.scan` bottom-up plume, per-interface CFL
  clip, exact column conservation.

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
    #: --- EDMF mass-flux component (Siebesma et al. 2007 single updraft;
    #: active only under convective conditions, i.e. positive surface
    #: buoyancy flux):
    mass_flux: bool = True
    mf_area: float = 0.1      #: updraft area fraction a_u
    mf_entrain_c: float = 0.4  #: eps = c * (1/z + 1/(h-z))
    mf_excess: float = 0.3    #: surface excess = b * w'x'_s / w*
    mf_w_a: float = 1.0       #: buoyancy production coeff in the w_u eq
    mf_w_b: float = 1.5       #: entrainment drag coeff in the w_u eq


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


def _mass_flux_tendencies(s, qv, thv, tv, z_mid, dz, p_mid, delp, h, wstar,
                          wthv_sfc, shf, lhf, dt: float, cfg: PBLConfig):
    """EDMF updraft transport of dry static energy and vapor.

    Single entraining updraft (Siebesma et al. 2007): surface excess scaled
    by w*, entrainment eps = c*(1/z + 1/(h-z)), vertical-velocity equation
    0.5 d(w^2)/dz = a*B - b*eps*w^2, mass flux M = a_u * rho * w_u applied
    through the conservative flux form (mf_common.flux_form_divergence) —
    exact column conservation of s and qv. Returns (ds_dt, dqv_dt).
    """
    from .mf_common import flux_form_divergence

    kax = -3
    K = s.shape[kax]
    g = constants.GRAV
    convective = wthv_sfc > 1e-8
    wscale = jnp.maximum(wstar, 1e-3)
    # surface excess in the lowest layer
    s1 = s[..., -1, :, :] + cfg.mf_excess * constants.CP_AIR * shf / wscale
    q1 = qv[..., -1, :, :] + cfg.mf_excess * lhf / wscale
    hb = jnp.maximum(h, 10.0)

    def to_k_leading(x):
        return jnp.moveaxis(x, kax, 0)

    # lowest-layer mask, same shape as s (scan runs bottom-up)
    is_bottom = (
        jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim + kax) == K - 1
    )

    def plume(carry, xs):
        s_u, q_u, w2, active = carry
        (s_k, q_k, thv_k, tv_k, z_k, dz_k, p_k, bottom_k) = xs
        eps = cfg.mf_entrain_c * (
            1.0 / jnp.maximum(z_k, 10.0)
            + 1.0 / jnp.maximum(hb - z_k, 10.0)
        )
        edz = eps * dz_k
        f = 1.0 / (1.0 + edz)
        s_new = jnp.where(bottom_k, s1, (s_u + edz * s_k) * f)
        q_new = jnp.where(bottom_k, q1, (q_u + edz * q_k) * f)
        t_u = (s_new - g * z_k) / constants.CP_AIR
        thv_u = t_u * (constants.P_REF / p_k) ** constants.KAPPA \
            * (1.0 + constants.ZVIR * q_new)
        buoy = g * (thv_u - thv_k) / thv_k
        w2_new = jnp.where(
            bottom_k,
            (cfg.mf_excess * wscale) ** 2,
            w2 * (1.0 - cfg.mf_w_b * edz) + 2.0 * cfg.mf_w_a * buoy * dz_k,
        )
        active = (bottom_k | active) & (w2_new > 0.0) & (z_k < hb)
        w2_new = jnp.maximum(w2_new, 0.0)
        rho_k = p_k / (constants.RDGAS * tv_k)
        m_k = jnp.where(active & convective,
                        cfg.mf_area * rho_k * jnp.sqrt(w2_new), 0.0)
        return (s_new, q_new, w2_new, active), (s_new, q_new, m_k)

    zc = jnp.zeros_like(s[..., 0, :, :])
    fc = jnp.zeros_like(zc, dtype=bool)
    xs = tuple(
        jnp.flip(to_k_leading(a), axis=0)
        for a in (s, qv, thv, tv, z_mid, dz, p_mid, is_bottom)
    )
    _, (s_u, q_u, m_lay) = jax.lax.scan(plume, (zc, zc, zc, fc), xs)
    s_u, q_u, m_lay = (
        jnp.moveaxis(jnp.flip(a, axis=0), 0, kax) for a in (s_u, q_u, m_lay)
    )

    # interface mass flux: interface i <- layer i below it; zero at the
    # ground (i=K) and the model top (i=0) -> exact conservation; per-
    # interface CFL clip keeps the explicit update stable at any dt.
    zero = jnp.zeros_like(m_lay[..., :1, :, :])
    m_if = jnp.concatenate([zero, m_lay[..., 1:, :, :], zero], axis=kax)
    dp_min = jnp.minimum(
        jnp.concatenate([delp[..., :1, :, :], delp], axis=kax),
        jnp.concatenate([delp, delp[..., -1:, :, :]], axis=kax),
    )
    m_if = jnp.minimum(m_if, 0.5 * dp_min / (g * dt))
    ds = flux_form_divergence(m_if, s_u, s, delp)
    dq = flux_form_divergence(m_if, q_u, qv, delp)
    return ds, dq


def pbl_step(ua, va, t, qv, pe, p_mid, delp, z_sfc, dt: float, cfg: PBLConfig,
             sensible_heat_flux=None, latent_heat_flux=None):
    """One PBL step. All fields (S, K, Y, X) on the A grid; pe (S, K+1, Y, X).

    Returns (u_dt, v_dt, t_new, qv_new, pbl_height): *tendencies* for the
    winds (applied by the caller through the A->D projection) and updated
    thermodynamic fields. ``sensible_heat_flux``/``latent_heat_flux`` arrays
    (kinematic, (.., Y, X)) override the cfg constants — the interactive-
    surface coupling (surface.py).
    """
    shf = cfg.sensible_heat_flux if sensible_heat_flux is None \
        else sensible_heat_flux
    lhf = cfg.latent_heat_flux if latent_heat_flux is None \
        else latent_heat_flux
    # virtual temperature / heights (hydrostatic integration of peln)
    from .mf_common import hydrostatic_heights

    tv = t * (1.0 + constants.ZVIR * qv)
    z_mid, z_if, dz = hydrostatic_heights(tv, pe)

    thv = tv * (constants.P_REF / p_mid) ** constants.KAPPA
    k_m, ustar, cd, spd1, h = _diffusivities(ua, va, thv, z_mid, z_if, cfg)
    k_h = k_m / cfg.prandtl

    # --- EDMF mass-flux transport of s and qv (convective conditions only)
    s = constants.CP_AIR * t + constants.GRAV * z_mid
    if cfg.mass_flux:
        thv1 = thv[..., -1, :, :]
        wthv_sfc = shf * (1.0 + constants.ZVIR * qv[..., -1, :, :]) \
            + constants.ZVIR * t[..., -1, :, :] * lhf
        wstar = jnp.cbrt(jnp.maximum(
            constants.GRAV / thv1 * wthv_sfc * jnp.maximum(h, 1.0), 0.0
        ))
        ds_mf, dq_mf = _mass_flux_tendencies(
            s, qv, thv, tv, z_mid, dz, p_mid, delp, h, wstar, wthv_sfc,
            shf, lhf, dt, cfg,
        )
        s = s + dt * ds_mf
        qv = qv + dt * dq_mf

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

    # dry static energy and moisture (zero-flux surface unless prescribed;
    # s/qv already include the EDMF mass-flux increment when enabled)
    lo, di, up = build(k_h, None)
    rhs_s = s.at[..., -1, :, :].add(
        dt * constants.GRAV * rho1 * constants.CP_AIR * shf
        / delp[..., -1, :, :]
    )
    rhs_q = qv.at[..., -1, :, :].add(
        dt * constants.GRAV * rho1 * lhf / delp[..., -1, :, :]
    )
    s_new = _tridiag_solve(lo, di, up, rhs_s)
    qv_new = jnp.maximum(_tridiag_solve(lo, di, up, rhs_q), 0.0)
    t_new = (s_new - constants.GRAV * z_mid) / constants.CP_AIR

    u_dt = (ua_new - ua) / dt
    v_dt = (va_new - va) / dt
    return u_dt, v_dt, t_new, qv_new, h
