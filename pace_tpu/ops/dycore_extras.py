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


def fillz(q, delp):
    """Vertical filling of negative tracers by column borrowing (reference
    ``fillz`` in fv_fill.F90, called from mapn_tracer when the ``fill``
    namelist flag is set — the function round 1 claimed but did not ship).

    Two-pass scheme: a downward sweep absorbs each layer's deficit into the
    layer below, then the leftover bottom deficit propagates back up.
    Exactly conservative in column tracer mass except for the final clip of
    column-wide deficits (a column that is negative in total cannot be
    filled from itself).

    q: (.., K, Y, X) with delp broadcastable to it (pass delp[:, None] for
    a stacked (S, nq, K, Y, X) tracer block)."""
    import jax

    mass = q * delp  # tracer mass per layer

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
    return m_new / jnp.broadcast_to(delp, q.shape)


def neg_adj3(q, delp, pt=None, pkz=None, nwat: int = 6):
    """Adjust negative water species (reference
    AdjustNegativeTracerMixingRatio / GFDL neg_adj3): balance deficits
    INSIDE the water families first, then condense/deposit the remainder
    from vapor with the matching latent heating, and finally column-fill
    (fillz) + clip whatever is left.

    Order (tracer layout per models.fv3.state.TRACER_NAMES):
      1. frozen family: negative qi/qs/qg filled from the other frozen
         species (no phase change);
      2. remaining frozen deficits deposited from qv (ls heating);
      3. liquid family: negative ql filled from qr and vice versa;
      4. remaining liquid deficits condensed from qv (lv heating);
      5. negative qv evaporated from ql then sublimated from qi (cooling);
      6. fillz per tracer, then clip.

    ``pt`` (virtual potential temperature) and ``pkz`` enable the latent
    heating terms; with pt=None the adjustment is mass-only (round-1
    behavior). Returns (q, pt).

    q: (S, nq, K, Y, X); delp: (S, K, Y, X)."""
    from .. import constants
    from ..models.fv3.state import TRACER_NAMES

    iv = TRACER_NAMES.index("qvapor")
    il = TRACER_NAMES.index("qliquid")
    ii = TRACER_NAMES.index("qice")
    ir = TRACER_NAMES.index("qrain")
    is_ = TRACER_NAMES.index("qsnow")
    ig = TRACER_NAMES.index("qgraupel")

    qv, ql, qi, qr, qs, qg = (q[:, j] for j in (iv, il, ii, ir, is_, ig))
    t_abs = None
    if pt is not None and pkz is not None:
        t_abs = pt * pkz / (1.0 + constants.ZVIR * qv)
    lv = constants.HLV
    ls = constants.HLV + constants.HLF
    cp = constants.CP_AIR

    def fill_from(neg, donor):
        """Move min(deficit, donor) from donor into the negative species."""
        deficit = jnp.maximum(-neg, 0.0)
        take = jnp.minimum(deficit, jnp.maximum(donor, 0.0))
        return neg + take, donor - take, take

    # 1. frozen family internal balancing
    qi, qs, _ = fill_from(qi, qs)
    qi, qg, _ = fill_from(qi, qg)
    qs, qg, _ = fill_from(qs, qg)
    qg, qs, _ = fill_from(qg, qs)
    # 2. remaining frozen deficits deposit from vapor (ls heating)
    for name in ("qi", "qs", "qg"):
        cur = {"qi": qi, "qs": qs, "qg": qg}[name]
        cur, qv, took = fill_from(cur, qv)
        if t_abs is not None:
            t_abs = t_abs + (ls / cp) * took
        if name == "qi":
            qi = cur
        elif name == "qs":
            qs = cur
        else:
            qg = cur
    # 3. liquid family internal balancing
    ql, qr, _ = fill_from(ql, qr)
    qr, ql, _ = fill_from(qr, ql)
    # 4. remaining liquid deficits condense from vapor (lv heating)
    ql, qv, took_l = fill_from(ql, qv)
    qr, qv, took_r = fill_from(qr, qv)
    if t_abs is not None:
        t_abs = t_abs + (lv / cp) * (took_l + took_r)
    # 5. negative vapor evaporates liquid then sublimates ice (cooling)
    qv, ql, took_e = fill_from(qv, ql)
    qv, qi, took_s = fill_from(qv, qi)
    if t_abs is not None:
        t_abs = t_abs - (lv / cp) * took_e - (ls / cp) * took_s

    q = q.at[:, iv].set(qv).at[:, il].set(ql).at[:, ii].set(qi)
    q = q.at[:, ir].set(qr).at[:, is_].set(qs).at[:, ig].set(qg)
    # 6. column fill + clip for every tracer (incl. non-water)
    q = fillz(q, delp[:, None])
    if t_abs is not None:
        pt = t_abs * (1.0 + constants.ZVIR * q[:, iv]) / pkz
    return q, pt


def sat_adjust(pt, qv, ql, qi=None, qr=None, qs=None, qg=None, p_mid=None,
               pkz=None, dt: float = 0.0, config=None):
    """Fast saturation adjustment over ALL six water species (reference
    ``SatAdjust3d`` — the stencil shared between fv_dynamics (do_sat_adj +
    the tau_l2v/tau_v2l/tau_i2s/ql_gen/ql_mlt/qi_lim family,
    reference baroclinic_c12.yaml:60-75) and the GFDL microphysics,
    applied during the Remapping stage per SURVEY.md §2.3).

    Delegates to the SHARED ``fast_saturation_adjustment`` in
    models/shield/microphysics.py (condensation/evaporation, homogeneous +
    Bigg freezing, ice melt with ql_mlt cap, vapor deposition/sublimation,
    Wegener-Bergeron-Findeisen, diagnostic cloud fraction). ``pt`` is
    virtual potential temperature; the adjustment operates on real
    temperature and rebuilds theta_v with the updated vapor.

    Returns (pt, qv, ql, qi, qr, qs, qg, qa); qa is None unless
    ``config.do_qa``. Ice species may be passed as None (hydrostatic
    vapor/liquid-only configurations) and come back unchanged as None.
    """
    from .. import constants
    from ..models.shield.microphysics import (
        MicrophysicsConfig, fast_saturation_adjustment,
    )

    if config is None:
        config = MicrophysicsConfig()
    z = jnp.zeros_like(qv)
    has_ice = qi is not None
    t = pt * pkz / (1.0 + constants.ZVIR * qv)
    qv2, ql2, qi2, qr2, qs2, qg2, t2, qa = fast_saturation_adjustment(
        qv, ql,
        qi if qi is not None else z,
        qr if qr is not None else z,
        qs if qs is not None else z,
        qg if qg is not None else z,
        t, p_mid, dt, config,
    )
    pt2 = t2 * (1.0 + constants.ZVIR * qv2) / pkz
    if not has_ice:
        return pt2, qv2, ql2, None, None, None, None, qa
    return pt2, qv2, ql2, qi2, qr2, qs2, qg2, qa


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


def global_energy_fix_increment(te1, te2, cvm, delp, area, n_halo, consv):
    """Globally-uniform temperature increment restoring the remap's total
    energy loss (reference consv_te: a GLOBAL-integral fixer in the
    Remapping stage, SURVEY.md §2.3 — not a per-column closure).

    dT = consv * ∮(te1 - te2) dA / ∮(Σ_k cvm·delp) dA

    Sums run over every shard's compute domain (each cube cell exactly once)
    so the result is layout-invariant; under a sharded S axis XLA lowers the
    full-axis sums to an all-reduce over the mesh (the reference's MPI
    global sum analog).

    Returns a scalar [K] to be applied as ``pt += dT / pkz``.
    """
    sl = (..., slice(n_halo, -n_halo), slice(n_halo, -n_halo))
    w_area = area[sl]
    dte = jnp.sum((te1 - te2)[sl] * w_area)
    denom = jnp.sum(jnp.sum(cvm * delp, axis=-3)[sl] * w_area)
    return consv * dte / denom


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
