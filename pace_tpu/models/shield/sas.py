"""SAS-style mass-flux shallow convection.

TPU-native analog of the reference's shallow-convection slot: pySHiELD ports
the GFS SAS (simplified Arakawa-Schubert, Han & Pan 2011 shalcnv form)
standalone but does not integrate it (reference docs/physics/index.rst:5-8
"NOAH LSM, sea ice, SAS shallow convection, EDMF PBL, RRTMG ported standalone
but not integrated"). This module supplies that scheme in a TPU-first form:

- **column-parallel**: each (S, Y, X) column is independent; the only
  sequential dependence is the upward plume march, one `lax.scan` over k
  that keeps the whole horizontal plane on lanes/sublanes.
- **branchless trigger**: there is no per-column early exit (SPMD runs one
  program); columns that do not trigger get a zero cloud-base mass flux and
  the tendencies vanish identically.
- **exactly conservative by construction**: the scheme transports the
  plume-conserved variables — moist static energy h = cp*T + g*z + L*qv and
  total water qt = qv + ql (+ optionally momentum) — in flux form
  ``dX/dt = g * d/dp [ M * (X_u - X_env) ]`` with a mass-flux profile that
  vanishes at the surface and above cloud top, so the column integrals of h
  and qt are conserved to roundoff (no precipitation in the shallow regime).
  Temperature/vapor/condensate are then recovered from (dh, dqt): detrained
  water in saturated plume layers becomes cloud liquid (with the implied
  latent heating folded into T through h-conservation), the rest arrives as
  vapor.

Scheme outline (Han & Pan 2011 ingredients, simplified):

1. parcel source = level of maximum moist static energy in the lowest
   ``src_depth_frac`` of the column by pressure;
2. entraining updraft (fractional entrainment ``entrain`` [1/m]) marched
   upward; plume T/qv/ql diagnosed by a 2-iteration Newton saturation solve;
3. cloud base = first saturated plume level; negative-buoyancy work up to
   ``max_cin`` is tolerated while the cloud establishes (CIN); once a buoyant
   saturated level exists, the first non-buoyant level is the cloud top (kept
   as the overshoot layer); the plume dies if it stays unsaturated more than
   ``max_subcloud_m`` above its source;
4. shallow-only gate: cloud depth must not exceed ``max_depth_pa``;
5. cloud-base mass flux from the Grant (2001) closure Mb = c_m * rho * w*
   (convective velocity scale from the prescribed kinematic surface buoyancy
   flux and the diagnosed plume-base height), CFL-limited so that
   g*M*dt/dp <= cfl_limit in every plume layer;
6. parabolic normalized mass-flux profile over the plume layers (zero at the
   surface and at the interface above cloud top).

Index convention: k increases DOWNWARD (k=0 model top), like the dycore.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants
from .mf_common import flux_form_divergence, hydrostatic_heights
from .microphysics import (
    d_saturation_mixing_ratio_dt, saturation_mixing_ratio,
)


@dataclasses.dataclass(frozen=True)
class ShallowConvectionConfig:
    """Tuning knobs (GFS shalcnv-like defaults). ``mode`` selects the SAS
    variant: "shallow" (non-precipitating, Grant closure, depth-capped) or
    "deep" (precipitating, CAPE-relaxation closure, depth floor)."""

    mode: str = "shallow"        #: "shallow" | "deep"
    entrain: float = 2.0e-3      #: fractional entrainment rate [1/m]
    c_m: float = 0.03            #: Grant closure Mb = c_m * rho * w*
    parcel_excess: float = 0.3   #: source-parcel temperature excess [K]
    src_depth_frac: float = 0.7  #: search source below p > frac * ps
    max_depth_pa: float = 3.5e4  #: shallow-only cap on cloud depth [Pa]
    max_subcloud_m: float = 2500.0  #: plume must saturate within this height
    max_cin: float = 25.0        #: negative-buoyancy work the plume survives [J/kg]
    cfl_limit: float = 0.5       #: cap on g*M*dt/dp per layer
    detrain_liquid: bool = True  #: detrained water in cloudy layers -> ql
    mix_momentum: bool = True    #: transport A-grid winds with the plume
    #: convective-momentum-transport reduction: in-plume pressure-gradient
    #: forces keep updraft momentum closer to the environment than a
    #: conserved-tracer plume would (GFS pgcon; Han & Pan 2011 use 0.55).
    #: The plume wind is relaxed toward the environment by this fraction.
    pgcon: float = 0.55
    #: prescribed kinematic surface fluxes for the closure (idealized runs
    #: have no LSM; an LSM/sea-ice surface can pass arrays to sas_step):
    sensible_heat_flux: float = 0.0  #: w'T' [K m/s]
    latent_heat_flux: float = 0.0    #: w'q' [kg/kg m/s]
    #: --- deep mode only:
    min_depth_pa: float = 1.5e4  #: deep gate: cloud at least this thick [Pa]
    rain_conversion: float = 2.0e-3  #: plume ql -> rain per meter of ascent
    c_deep: float = 0.02         #: Mb = c_deep * rho_b * sqrt(2*CAPE)


@dataclasses.dataclass(frozen=True)
class DeepConvectionConfig(ShallowConvectionConfig):
    """SAS deep convection defaults (GFS deepcnv analog, beyond the
    reference's ported set): precipitating entraining plume, CAPE closure,
    weaker entrainment, no shallow depth cap."""

    mode: str = "deep"
    entrain: float = 7.0e-4      #: deep plumes entrain less per meter
    max_depth_pa: float = 1.0e9  #: no cap (gate is the min-depth floor)


def _newton_plume_tq(h_u, qt_u, z, p, t_guess):
    """Plume (T, qv, ql) from conserved (h, qt) at height z, pressure p.

    Two Newton iterations on cp*T + g*z + L*min(qt, qsat(T)) = h; enough for
    the ~0.1 K accuracy the buoyancy test needs.
    """
    cp, lv, g = constants.CP_AIR, constants.HLV, constants.GRAV
    t = t_guess
    for _ in range(2):
        qs = saturation_mixing_ratio(t, p)
        qv = jnp.minimum(qt_u, qs)
        sat = qt_u >= qs
        dqsdt = d_saturation_mixing_ratio_dt(t, p, qs)
        resid = h_u - (cp * t + g * z + lv * qv)
        denom = cp + jnp.where(sat, lv * dqsdt, 0.0)
        t = t + resid / denom
    qs = saturation_mixing_ratio(t, p)
    qv = jnp.minimum(qt_u, qs)
    ql = jnp.maximum(qt_u - qv, 0.0)
    return t, qv, ql, qt_u >= qs


def sas_step(ua, va, t, qv, ql, pe, p_mid, delp, dt: float,
             cfg: ShallowConvectionConfig,
             sensible_heat_flux=None, latent_heat_flux=None):
    """One shallow-convection step. Layer fields (.., K, Y, X); pe (.., K+1, Y, X).

    Returns (u_dt, v_dt, t_new, qv_new, ql_new): wind *tendencies* (for the
    caller's A->D projection) and updated thermodynamic fields.
    """
    cp, lv, g = constants.CP_AIR, constants.HLV, constants.GRAV
    kax = -3
    K = t.shape[kax]
    shf = cfg.sensible_heat_flux if sensible_heat_flux is None else sensible_heat_flux
    lhf = cfg.latent_heat_flux if latent_heat_flux is None else latent_heat_flux

    # -- heights (hydrostatic; condensate loading included in tv)
    tv = t * (1.0 + constants.ZVIR * qv - ql)
    z_mid, z_if, dz = hydrostatic_heights(tv, pe)

    qt = qv + ql
    h = cp * t + g * z_mid + lv * qv
    ps = pe[..., -1, :, :]

    # -- source level: max moist static energy in the lower column
    src_ok = p_mid > cfg.src_depth_frac * ps[..., None, :, :]
    h_masked = jnp.where(src_ok, h, -jnp.inf)
    k_src = jnp.argmax(h_masked, axis=kax)  # (.., Y, X)
    is_src = (
        jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim + kax)
        == k_src[..., None, :, :]
    )

    # -- upward plume march (k = K-1 .. 0) over conserved (h_u, qt_u, u, v)
    def to_k_leading(x):
        return jnp.moveaxis(x, kax, 0)

    eps_dz = cfg.entrain * dz  # per-layer entrained fraction

    def plume(carry, xs):
        h_u, qt_u, u_u, v_u, z_src, work, started, active, est = carry
        (h_k, qt_k, u_k, v_k, t_k, tv_k, z_k, p_k, dz_k, edz_k, issrc_k) = xs
        # entrain environment air over this layer's depth
        f = 1.0 / (1.0 + edz_k)
        h_new = (h_u + edz_k * h_k) * f
        qt_new = (qt_u + edz_k * qt_k) * f
        u_new = (u_u + edz_k * u_k) * f
        v_new = (v_u + edz_k * v_k) * f
        # (re)initialize at the source level
        h_new = jnp.where(issrc_k, h_k + constants.CP_AIR * cfg.parcel_excess, h_new)
        qt_new = jnp.where(issrc_k, qt_k, qt_new)
        u_new = jnp.where(issrc_k, u_k, u_new)
        v_new = jnp.where(issrc_k, v_k, v_new)
        z_src = jnp.where(issrc_k, z_k, z_src)
        work = jnp.where(issrc_k, 0.0, work)
        est = est & ~issrc_k
        started = started | issrc_k
        active = (active | issrc_k) & started
        # diagnose plume state and buoyancy at this level
        t_u, qv_u, ql_u, sat = _newton_plume_tq(h_new, qt_new, z_k, p_k, t_k)
        tv_u = t_u * (1.0 + constants.ZVIR * qv_u - ql_u)
        buoyant = tv_u > tv_k
        # accumulate negative-buoyancy work; the plume survives CIN up to
        # cfg.max_cin (reference SAS tolerates inhibition below cloud base)
        work = work + jnp.maximum(tv_k - tv_u, 0.0) / tv_k \
            * constants.GRAV * dz_k
        too_dry = (~sat) & (z_k - z_src > cfg.max_subcloud_m)
        # CIN tolerance applies only while the cloud is getting established;
        # once a buoyant saturated level exists, the first non-buoyant level
        # IS the cloud top (it stays in the plume as the overshoot layer,
        # nothing continues above it)
        top_hit = est & sat & ~buoyant & active
        active = active & (work <= cfg.max_cin) & ~too_dry & (qt_new > 0.0) \
            & ~top_hit
        in_plume = (active | issrc_k | top_hit) & started
        est = est | (in_plume & sat & buoyant)
        # deep mode: convert plume condensate to rain along the ascent
        # (removed from qt_u; h_u excludes liquid so it is untouched — the
        # condensation heat stays in the plume temperature)
        if cfg.mode == "deep" and cfg.rain_conversion > 0.0:
            rain_k = jnp.where(
                in_plume & sat,
                ql_u * jnp.clip(cfg.rain_conversion * dz_k, 0.0, 1.0), 0.0,
            )
            qt_new = qt_new - rain_k
            ql_u = ql_u - rain_k
        else:
            rain_k = jnp.zeros_like(qt_new)
        carry = (h_new, qt_new, u_new, v_new, z_src, work, started, active,
                 est)
        ys = (h_new, qt_new, u_new, v_new, t_u, qv_u, ql_u,
              in_plume & sat, in_plume, in_plume & sat & buoyant, rain_k)
        return carry, ys

    zc = jnp.zeros_like(t[..., 0, :, :])
    fc = jnp.zeros_like(zc, dtype=bool)
    xs = tuple(
        jnp.flip(to_k_leading(a), axis=0)
        for a in (h, qt, ua, va, t, tv, z_mid, p_mid, dz, eps_dz, is_src)
    )
    _, ys = jax.lax.scan(plume, (zc, zc, zc, zc, zc, zc, fc, fc, fc), xs)
    (h_u, qt_u, u_u, v_u, t_u, qv_u, ql_u, cloudy, in_plume, cld_buoy,
     rain_u) = tuple(
        jnp.moveaxis(jnp.flip(a, axis=0), 0, kax) for a in ys
    )

    # -- depth gate + require a *buoyant* cloud (>= 1 saturated level
    # positively buoyant — a plume that only fought CIN does not convect).
    # Shallow mode caps the depth; deep mode sets a floor instead.
    cloudy_f = cloudy.astype(t.dtype)
    p_base = jnp.max(jnp.where(cloudy, p_mid, -jnp.inf), axis=kax)
    p_top = jnp.min(jnp.where(cloudy, p_mid, jnp.inf), axis=kax)
    has_cloud = jnp.any(cld_buoy, axis=kax)
    depth = jnp.where(has_cloud, p_base - p_top, 0.0)
    if cfg.mode == "deep":
        gate = has_cloud & (depth >= cfg.min_depth_pa)
    else:
        gate = has_cloud & (depth <= cfg.max_depth_pa)

    # -- Grant closure: w* from surface buoyancy flux and plume-base height
    thv1 = tv[..., -1, :, :] * (
        constants.P_REF / p_mid[..., -1, :, :]
    ) ** constants.KAPPA
    wthv = shf * (1.0 + constants.ZVIR * qv[..., -1, :, :]) \
        + constants.ZVIR * t[..., -1, :, :] * lhf
    # convective-scale height for the Grant closure = plume-BASE height (the
    # subcloud mixed-layer depth), i.e. the LOWEST cloudy level
    z_base = jnp.min(jnp.where(cloudy, z_mid, jnp.inf), axis=kax)
    z_base = jnp.where(has_cloud, z_base, 0.0)
    wstar = jnp.cbrt(jnp.maximum(g / thv1 * wthv * jnp.maximum(z_base, 1.0), 0.0))
    rho_b = p_base / (constants.RDGAS * jnp.maximum(
        jnp.sum(tv * cloudy_f, axis=kax)
        / jnp.maximum(jnp.sum(cloudy_f, axis=kax), 1.0), 100.0))
    if cfg.mode == "deep":
        # CAPE closure: Mb = c_deep * rho_b * sqrt(2*CAPE), CAPE integrated
        # over the buoyant plume layers (the A-S quasi-equilibrium scale)
        tv_plume = jnp.where(
            in_plume, t_u * (1.0 + constants.ZVIR * qv_u - ql_u), tv
        )
        buoy_acc = jnp.maximum(tv_plume - tv, 0.0) / tv
        cape = jnp.sum(g * buoy_acc * dz * in_plume.astype(t.dtype), axis=kax)
        mb = jnp.where(gate, cfg.c_deep * rho_b * jnp.sqrt(2.0 * cape), 0.0)
    else:
        mb = jnp.where(gate, cfg.c_m * rho_b * wstar, 0.0)

    # CFL cap: g * M * dt / dp <= cfl_limit over every plume layer
    plume_f = in_plume.astype(t.dtype)
    dp_min = jnp.min(jnp.where(in_plume, delp, jnp.inf), axis=kax)
    mb = jnp.minimum(mb, cfg.cfl_limit * dp_min / (g * dt))

    # -- parabolic normalized mass-flux profile on interfaces (K+1 of them):
    # below_i = plume layers at or below interface i, above_i = plume layers
    # above; zero at both plume ends -> exact column conservation.
    csum = jnp.cumsum(plume_f, axis=kax)  # plume layers with index <= k
    total = csum[..., -1:, :, :]
    zero = jnp.zeros_like(total)
    above_if = jnp.concatenate([zero, csum], axis=kax)  # (.., K+1, Y, X)
    below_if = total - above_if
    shape_if = 4.0 * above_if * below_if / jnp.maximum(total, 1.0) ** 2
    m_if = mb[..., None, :, :] * shape_if  # [kg/m^2/s], upward

    def flux_div(x_u, x_env):
        return flux_form_divergence(m_if, x_u, x_env, delp)

    # mask plume values to the environment outside the plume so that stale
    # scan values cannot leak through (M is zero there anyway)
    def sel(p_val, env):
        return jnp.where(in_plume, p_val, env)

    dh = dt * flux_div(sel(h_u, h), h)
    dqt = dt * flux_div(sel(qt_u, qt), qt)

    # -- deep mode: the rain generated in the plume leaves the column. The
    # sink at each layer is (mass flux through the layer) * (rain per unit
    # plume mass); h excludes liquid so only qt is touched.
    m_top = m_if[..., :-1, :, :]  # flux through each layer's top interface
    rain_sink = m_top * jnp.where(in_plume, rain_u, 0.0)  # [kg/m^2/s]
    precip = jnp.sum(rain_sink, axis=kax)  # surface rain rate [kg/m^2/s]
    dqt = dqt - dt * g * rain_sink / delp

    # -- recover (T, qv, ql): detrained water in cloudy layers becomes cloud
    # liquid; elsewhere (and for drying) the change is vapor. h-conservation
    # then fixes the temperature: cp*dT = dh - L*dqv.
    if cfg.detrain_liquid:
        dql = jnp.where(cloudy, jnp.maximum(dqt, 0.0)
                        * (sel(ql_u, 0.0) / jnp.maximum(sel(qt_u, 1.0), 1e-12)),
                        0.0)
    else:
        dql = jnp.zeros_like(dqt)
    dqv = dqt - dql
    # never drive qv/ql negative: shift any overdraft between the two phases
    dqv_def = jnp.maximum(-(qv + dqv), 0.0)
    dqv, dql = dqv + dqv_def, dql - dqv_def
    dql_def = jnp.maximum(-(ql + dql), 0.0)
    dql, dqv = dql + dql_def, dqv - dql_def
    t_new = t + (dh - lv * dqv) / cp
    qv_new = qv + dqv
    ql_new = ql + dql

    if cfg.mix_momentum:
        # pgcon: plume momentum partially equilibrated with the environment
        # by in-cloud pressure-gradient forces (Han & Pan 2011) — this both
        # matches GFS physics and damps the explicit CMT update
        u_mix = sel(u_u, ua) * (1.0 - cfg.pgcon) + ua * cfg.pgcon
        v_mix = sel(v_u, va) * (1.0 - cfg.pgcon) + va * cfg.pgcon
        u_dt = flux_div(u_mix, ua)
        v_dt = flux_div(v_mix, va)
    else:
        u_dt = jnp.zeros_like(ua)
        v_dt = jnp.zeros_like(va)
    return u_dt, v_dt, t_new, qv_new, ql_new, precip
