"""Dycore auxiliary operators: sponge-layer diffusion, fast Rayleigh damping,
negative-tracer adjustment.

TPU-native analogs of ``pyFV3.stencils.{del2cubed, ray_fast, neg_adj3,
fillz}`` (reference roles per SURVEY.md §2.3: upper-atmosphere sponge-layer
Laplacian damping (n_sponge, d_ext); Rayleigh damping of u,v,w above
rf_cutoff; fill negative tracers).
"""

from __future__ import annotations

import jax.numpy as jnp

from .delnflux import _grad_fluxes
from .stencil_utils import bcast_k, x_iface_diff, y_iface_diff


def del2cubed(q, grid, nmax: int, cd: float):
    """Horizontal Laplacian diffusion applied ``nmax`` times with coefficient
    ``cd`` [m^2/s-like, premultiplied by dt] (reference HyperdiffusionDamping
    del2cubed). Operates on the full field; callers typically slice the top
    ``n_sponge`` layers."""
    for _ in range(nmax):
        fx, fy = _grad_fluxes(q, grid)
        q = q + cd * (x_iface_diff(fx) + y_iface_diff(fy)) * bcast_k(
            grid.rarea, q
        )
    return q


def apply_sponge(pt, u_or_none, grid, n_sponge: int, d_ext: float, dt: float):
    """Sponge diffusion of the top ``n_sponge`` layers of a cell field.

    ``d_ext`` acts as a nondimensional per-step diffusion number (reference
    default 0.02); it is clipped to the explicit-Laplacian stability bound.
    """
    if n_sponge <= 0 or d_ext <= 0.0:
        return pt
    cd = min(d_ext, 0.2) * grid.da_min
    top = del2cubed(pt[..., :n_sponge, :, :], grid, 2, cd)
    return jnp.concatenate([top, pt[..., n_sponge:, :, :]], axis=-3)


def ray_fast(u, v, w, pe_mid, dt: float, ptop: float, rf_cutoff: float, tau: float):
    """Rayleigh friction above ``rf_cutoff`` [Pa] with timescale ``tau`` [s]
    (reference ray_fast). The damping rate ramps smoothly from zero at
    rf_cutoff to 1/tau at the model top:

        r(p) = (1/tau) * sin^2( (pi/2) * log(rf_cutoff/p) / log(rf_cutoff/ptop) )

    ``pe_mid`` is the layer-mean pressure at cell centers; wind points use
    neighbor averages (2-point), adequate for the smooth ramp.
    """
    if tau <= 0.0:
        return u, v, w
    safe_top = max(ptop, 1e-3)

    def rate(p):
        x = jnp.log(rf_cutoff / jnp.maximum(p, safe_top)) / jnp.log(
            rf_cutoff / safe_top
        )
        r = (1.0 / tau) * jnp.sin(0.5 * jnp.pi * jnp.clip(x, 0.0, 1.0)) ** 2
        return jnp.where(p < rf_cutoff, r, 0.0)

    damp_c = 1.0 / (1.0 + dt * rate(pe_mid))
    from .stencil_utils import (
        x_cell_to_left_iface,
        x_cell_to_right_iface,
        y_cell_to_left_iface,
        y_cell_to_right_iface,
    )

    damp_u = 0.5 * (y_cell_to_left_iface(damp_c) + y_cell_to_right_iface(damp_c))
    damp_v = 0.5 * (x_cell_to_left_iface(damp_c) + x_cell_to_right_iface(damp_c))
    u = u * damp_u
    v = v * damp_v
    if w is not None:
        w = w * damp_c
    return u, v, w


def neg_adj3(q, delp):
    """Fill negative tracers by borrowing mass from the layer below, then
    clip any remainder (reference AdjustNegativeTracerMixingRatio, simplified
    to a two-pass downward/clip scheme; exactly conservative except for the
    final clip of column-wide deficits).

    q: (S, nq, K, Y, X); delp: (S, K, Y, X)."""
    import jax

    dp = delp[:, None]
    mass = q * dp  # tracer mass per layer

    def body(carry, m_k):
        # carry = deficit propagated downward (negative mass to absorb)
        m = m_k + carry
        new_deficit = jnp.minimum(m, 0.0)
        return new_deficit, jnp.maximum(m, 0.0)

    m_seq = jnp.moveaxis(mass, -3, 0)
    deficit, m_down = jax.lax.scan(body, jnp.zeros_like(m_seq[0]), m_seq)
    # second pass: propagate the leftover bottom deficit upward
    _, m_up_rev = jax.lax.scan(body, deficit, m_down[::-1])
    m_new = jnp.moveaxis(m_up_rev[::-1], 0, -3)
    # any remaining deficit means the whole column is negative; it is clipped
    return m_new / dp


def sat_adjust(pt, qv, ql, p_mid, pkz, dt: float, tau_l2v: float = 300.0,
               tau_v2l: float = 150.0):
    """Fast saturation adjustment (reference ``SatAdjust3d`` /
    saturation_adjustment stencil, do_sat_adj + tau_l2v/tau_v2l params,
    applied during the Remapping stage per SURVEY.md §2.3).

    Relaxes vapor toward liquid saturation with latent heating on the
    condensation/evaporation timescales. ``pt`` is virtual potential
    temperature; the adjustment operates on real temperature and rebuilds
    theta_v with the updated vapor. Returns (pt, qv, ql).
    """
    from .. import constants
    from ..models.shield.microphysics import saturation_mixing_ratio

    lv = constants.HLV
    cp = constants.CP_AIR
    t = pt * pkz / (1.0 + constants.ZVIR * qv)
    qsat = saturation_mixing_ratio(t, p_mid)
    dqsdt = (
        qsat * 17.502 * 240.97
        / (jnp.clip(t - 273.15, -80.0, 50.0) + 240.97) ** 2
    )
    excess = (qv - qsat) / (1.0 + (lv / cp) * dqsdt)
    cond_frac = 1.0 - jnp.exp(-dt / tau_v2l)
    evap_frac = 1.0 - jnp.exp(-dt / tau_l2v)
    cond = jnp.where(
        excess > 0.0,
        excess * cond_frac,
        -jnp.minimum(ql, -excess * evap_frac),
    )
    qv2 = qv - cond
    ql2 = ql + cond
    t2 = t + (lv / cp) * cond
    pt2 = t2 * (1.0 + constants.ZVIR * qv2) / pkz
    return pt2, qv2, ql2


def cloud_fraction(qv, ql, t, p_mid, rh_crit: float = 0.75,
                   ql_full: float = 1.5e-4):
    """Diagnostic cloud fraction (reference do_qa: sat_adj fills the qcld
    tracer). Sub-grid scheme: fully cloudy once condensate reaches
    ``ql_full``; partially cloudy from relative humidity above ``rh_crit``
    (linear), whichever is larger — the standard RH/condensate hybrid used
    when a prognostic cloud scheme is off."""
    from ..models.shield.microphysics import saturation_mixing_ratio

    qsat = saturation_mixing_ratio(t, p_mid)
    rh = jnp.clip(qv / jnp.maximum(qsat, 1e-12), 0.0, 1.0)
    qa_rh = jnp.clip((rh - rh_crit) / (1.0 - rh_crit), 0.0, 1.0)
    qa_ql = jnp.clip(ql / ql_full, 0.0, 1.0)
    return jnp.maximum(qa_rh * qa_rh, qa_ql)


def total_energy_columns(u, v, w, delp, pt, pkz, phis):
    """Column-integrated total energy estimate [J/m^2 / g]: internal +
    kinetic + potential, with winds averaged to cell centers (used by the
    consv_te global fixer; reference compute_total_energy in the Remapping
    stage)."""
    from .. import constants

    t = pt * pkz  # virtual temperature (moisture factor cancels in the diff)
    u_c = 0.5 * (u[..., :-1, :] + u[..., 1:, :])
    v_c = 0.5 * (v[..., :, :-1] + v[..., :, 1:])
    ke = 0.5 * (u_c**2 + v_c**2)
    if w is not None:
        ke = ke + 0.5 * w**2
    e = delp * (constants.CV_AIR * t + ke)
    te = jnp.sum(e, axis=-3) + phis * jnp.sum(delp, axis=-3)
    return te
