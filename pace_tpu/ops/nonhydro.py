"""Nonhydrostatic vertical dynamics: semi-implicit Riemann solvers, height
advection, and the nonhydrostatic pressure gradient.

TPU-native analogs of ``pyFV3.stencils.{riem_solver_c, riem_solver3,
sim1_solver, updatedzc, updatedzd, nh_p_grad}`` (reference roles per
SURVEY.md §2.3: nonhydrostatic vertical Riemann solvers — semi-implicit,
a_imp/p_fac params, sim1 = tridiagonal column solve; update height fields;
nonhydrostatic horizontal pressure-gradient force).

Formulation (backward-Euler limit a_imp=1, derived in-repo):

- Unknowns: interface vertical velocities W_k (k=0..K; W_K = ws at the
  surface). Layer gas-law pressure linearized in thickness:
      p_k^+ = p_k + B_k (W_{k+1} - W_k) dt,  B_k = -gamma p_k / dz_k > 0
- Interface momentum (dm_hat = half-sum of adjacent layer masses):
      W_k^+ = W_k + (dt/dm_hat_k)(p'_k^+ - p'_{k-1}^+)
  which closes into a diagonally-dominant tridiagonal system solved by the
  Thomas algorithm as a ``lax.scan`` over k with the whole (S, Y, X) plane
  vectorized — the TPU-native shape of the reference's per-column loops.
- Layer w and delz update from the solved interface field; the perturbation
  interface pressure feeds the split-form PGF (hydrostatic pk-contour +
  perturbation Pa-contour, the reference nh_p_grad two-term form, which
  stays well-conditioned in float32).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import constants
from .pgrad import a2b_ord4
from .stencil_utils import (
    bcast_k,
    x_cell_to_left_iface,
    x_cell_to_right_iface,
    x_iface_diff,
    y_cell_to_left_iface,
    y_cell_to_right_iface,
    y_iface_diff,
)

GAMMA = 1.0 / (1.0 - constants.KAPPA)  # cp/cv


def tridiagonal_solve(a, b, c, d):
    """Thomas algorithm along axis -3, vectorized over trailing (Y, X).

    a: sub-diagonal (a[0] unused), b: diagonal, c: super-diagonal (c[-1]
    unused), d: rhs. All (.., K, Y, X). Returns x with b x + a x_(k-1) +
    c x_(k+1) = d.
    """
    a_s, b_s, c_s, d_s = (jnp.moveaxis(t, -3, 0) for t in (a, b, c, d))

    def fwd(carry, args):
        cp_km1, dp_km1 = carry
        a_k, b_k, c_k, d_k = args
        denom = b_k - a_k * cp_km1
        cp_k = c_k / denom
        dp_k = (d_k - a_k * dp_km1) / denom
        return (cp_k, dp_k), (cp_k, dp_k)

    zeros = jnp.zeros_like(d_s[0])
    _, (cp, dp) = jax.lax.scan(fwd, (zeros, zeros), (a_s, b_s, c_s, d_s))

    def bwd(x_kp1, args):
        cp_k, dp_k = args
        x_k = dp_k - cp_k * x_kp1
        return x_k, x_k

    _, x_rev = jax.lax.scan(bwd, zeros, (cp[::-1], dp[::-1]))
    return jnp.moveaxis(x_rev[::-1], 0, -3)


def _interface_mass_weighted(dm, wl):
    """Layer field -> interior interfaces (k=1..K-1), mass-weighted.
    dm, wl: (.., K, Y, X) -> (.., K-1, Y, X)."""
    dm_up = dm[..., :-1, :, :]
    dm_dn = dm[..., 1:, :, :]
    return (dm_dn * wl[..., :-1, :, :] + dm_up * wl[..., 1:, :, :]) / (
        dm_up + dm_dn
    )


def sim1_solver(w, delz, pt, delp, pkz, ws, dt: float, ptop: float = 0.0,
                a_imp: float = 1.0):
    """Semi-implicit vertical solve (reference sim1_solver analog).

    Inputs are layer arrays (.., K, Y, X): w [m/s], delz [m, negative],
    pt (theta_v [K]), delp [Pa], pkz (layer-mean (p/P_REF)^kappa), and
    ``ws`` (.., Y, X) the surface vertical velocity (terrain-following BC).

    ``a_imp`` is the implicitness weight θ of the reference's riem_solver
    family (SURVEY.md §2.3 riem_solver3/sim1 a_imp param): the pressure and
    velocity updates are evaluated at the θ-blended time level,
        p'^+ = p'^0 + B (θ ΔW^+ + (1-θ) ΔW^0)
        W^+  = W^0 + r [θ (δp'^+) + (1-θ) (δp'^0)]
    which closes into the same tridiagonal with the implicit coupling scaled
    by θ² and an explicit divergence term on the rhs; θ=1 is the
    backward-Euler limit (the reference perf configs' setting), θ=0.5 the
    trapezoidal (neutrally off-centered) scheme.

    Returns (w_new, delz_new, pp_interfaces) with ``pp`` the perturbation
    interface pressure [Pa] (pp[0] = 0 at the model top).
    """
    K = w.shape[-3]
    theta = float(a_imp)
    dm = delp / constants.GRAV

    # full gas-law layer pressure: rho = dm / (-delz), T_v = pt * pkz,
    # p = rho Rd Tv
    t_v = pt * pkz
    p_full = dm * constants.RDGAS * t_v / (-delz)
    # hydrostatic reference: the LOG-MEAN layer pressure delp/dln(pe) — for a
    # hydrostatically balanced column the gas-law pressure equals exactly
    # this, so pprime vanishes at equilibrium
    pe_hyd_below = ptop + jnp.cumsum(delp, axis=-3)
    pe_hyd = jnp.concatenate(
        [jnp.full_like(pe_hyd_below[..., :1, :, :], ptop), pe_hyd_below],
        axis=-3,
    )
    peln = jnp.log(jnp.maximum(pe_hyd, 1e-10))
    p_hyd_layer = delp / (peln[..., 1:, :, :] - peln[..., :-1, :, :])
    pprime = p_full - p_hyd_layer

    b_coef = -GAMMA * p_full * dt / delz  # B_k > 0 (delz < 0)

    # interface masses (top interface uses half the first layer)
    dm_hat_int = 0.5 * (dm[..., :-1, :, :] + dm[..., 1:, :, :])  # k=1..K-1
    dm_hat_top = 0.5 * dm[..., :1, :, :]

    # initial interface velocities (mass-weighted), top = w0, bottom = ws
    w_int = _interface_mass_weighted(dm, w)  # k=1..K-1
    w_top = w[..., :1, :, :]

    # --- assemble the tridiagonal for W_k, k=0..K-1 (W_K = ws Dirichlet)
    # row k: -(dt B_{k-1}/dmh_k) W_{k-1} + [1 + (dt/dmh_k)(B_{k-1}+B_k)] W_k
    #        -(dt B_k/dmh_k) W_{k+1} = W_k0 + (dt/dmh_k)(p'_k0 - p'_{k-1,0})
    dmh = jnp.concatenate([dm_hat_top, dm_hat_int], axis=-3)  # k=0..K-1
    b_km1 = jnp.concatenate(
        [jnp.zeros_like(b_coef[..., :1, :, :]), b_coef[..., :-1, :, :]], axis=-3
    )  # B_{k-1}, zero for k=0 (no layer above)
    r = dt / dmh
    th2 = theta * theta
    a_diag = -th2 * r * b_km1
    b_diag = 1.0 + th2 * r * (b_km1 + b_coef)
    c_diag = -th2 * r * b_coef
    pprime_km1 = jnp.concatenate(
        [jnp.zeros_like(pprime[..., :1, :, :]), pprime[..., :-1, :, :]], axis=-3
    )
    w0 = jnp.concatenate([w_top, w_int], axis=-3)
    ws_e = ws[..., None, :, :] if ws.ndim == w.ndim - 1 else ws
    rhs = w0 + r * (pprime - pprime_km1)
    if theta != 1.0:
        # explicit part of the blended divergence: θ(1-θ) r δ(B ΔW^0)
        w0_full = jnp.concatenate([w0, ws_e], axis=-3)
        dwdz0 = w0_full[..., 1:, :, :] - w0_full[..., :-1, :, :]
        bdw0 = b_coef * dwdz0
        bdw0_km1 = jnp.concatenate(
            [jnp.zeros_like(bdw0[..., :1, :, :]), bdw0[..., :-1, :, :]],
            axis=-3,
        )
        rhs = rhs + theta * (1.0 - theta) * r * (bdw0 - bdw0_km1)
    # fold the known W_K = ws into the last row's rhs
    rhs = rhs.at[..., -1:, :, :].add(-c_diag[..., -1:, :, :] * ws_e)
    c_diag = c_diag.at[..., -1:, :, :].set(0.0)

    w_iface = tridiagonal_solve(a_diag, b_diag, c_diag, rhs)  # k=0..K-1
    w_iface_full = jnp.concatenate([w_iface, ws_e], axis=-3)  # k=0..K

    # --- updates
    dwdz = w_iface_full[..., 1:, :, :] - w_iface_full[..., :-1, :, :]
    if theta != 1.0:
        # blended divergence drives the thickness/pressure updates
        dwdz = theta * dwdz + (1.0 - theta) * dwdz0
    delz_new = delz + dt * dwdz
    # B already carries the dt factor: delta p' = B * delta W
    pprime_new = pprime + b_coef * dwdz

    # perturbation pressure at interfaces for the PGF: pp[0]=0 (free top),
    # interior mass-weighted interpolation, bottom one-sided extrapolation
    pp_int = _interface_mass_weighted(dm, pprime_new)
    pp_bot = 1.5 * pprime_new[..., -1:, :, :] - 0.5 * pprime_new[..., -2:-1, :, :]
    pp = jnp.concatenate(
        [jnp.zeros_like(pp_int[..., :1, :, :]), pp_int, pp_bot], axis=-3
    )

    # layer w from interface pressure differences
    w_new = w + (dt / dm) * (pp[..., 1:, :, :] - pp[..., :-1, :, :]) - (
        dt / dm
    ) * 0.0
    return w_new, delz_new, pp


def _p_fac_floor(delz_new, pt, delp, pkz, ptop, p_fac: float):
    """Pressure floor of the reference riem_solver family (p_fac namelist):
    the solver must not expand a layer so far that its gas-law pressure
    drops below ``p_fac`` × the hydrostatic layer pressure (the reference
    floors the pressure when recomputing dz from the gas law in
    SIM1_solver). Equivalent cap on the thickness:
        (-delz)_max = dm·Rd·Tv / (p_fac·p_hyd).
    """
    dm = delp / constants.GRAV
    t_v = pt * pkz
    pe_hyd_below = ptop + jnp.cumsum(delp, axis=-3)
    pe_hyd = jnp.concatenate(
        [jnp.full_like(pe_hyd_below[..., :1, :, :], ptop), pe_hyd_below],
        axis=-3,
    )
    peln = jnp.log(jnp.maximum(pe_hyd, 1e-10))
    p_hyd_layer = delp / (peln[..., 1:, :, :] - peln[..., :-1, :, :])
    limit = dm * constants.RDGAS * t_v / (p_fac * p_hyd_layer)
    return jnp.maximum(delz_new, -limit)


def sim1_solver_best(w, delz, pt, delp, pkz, ws, dt: float, ptop: float = 0.0,
                     a_imp: float = 1.0, p_fac: float = 0.05):
    """Backend-dispatched sim1: the Pallas column kernel on TPU float32
    (whole Thomas solve in VMEM — see sim1_pallas), the lax.scan formulation
    elsewhere (CPU tests, float64 validation runs, and the semi-implicit
    a_imp<1 blend, which the reference perf configs never enable —
    a_imp: 1.0 in baroclinic_c12.yaml:43 and baroclinic_c192_6ranks.yaml:30).
    The p_fac pressure floor applies on every path."""
    from ._dispatch import use_pallas

    if a_imp == 1.0 and use_pallas("sim1") and w.dtype == jnp.float32:
        from .sim1_pallas import sim1_solver_pallas

        # the kernel applies the p_fac floor in-VMEM (its hydrostatic layer
        # pressure is already resident; the external floor would redo the
        # whole cumsum/log pass through HBM)
        return sim1_solver_pallas(
            w, delz, pt, delp, pkz, ws, float(dt), float(ptop),
            p_fac=float(p_fac),
        )
    w_new, delz_new, pp = sim1_solver(
        w, delz, pt, delp, pkz, ws, dt, ptop, a_imp=a_imp
    )
    delz_new = _p_fac_floor(delz_new, pt, delp, pkz, ptop, p_fac)
    return w_new, delz_new, pp


def riem_solver3(w, delz, pt, delp, pkz, ws, dt: float, ptop: float = 0.0,
                 a_imp: float = 1.0, p_fac: float = 0.05):
    """D-grid vertical solve (reference riem_solver3)."""
    w_new, delz_new, pp = sim1_solver_best(
        w, delz, pt, delp, pkz, ws, dt, ptop, a_imp=a_imp, p_fac=p_fac
    )
    return w_new, delz_new, pp


def riem_solver_c(w, delz, ptc, delpc, pkz, ws, dt2: float, ptop: float,
                  a_imp: float = 1.0, p_fac: float = 0.05):
    """C-grid provisional solve (reference riem_solver_c): returns the full
    nonhydrostatic interface pressure [Pa] and gz for p_grad_c."""
    _w_new, delz_new, pp = sim1_solver_best(
        w, delz, ptc, delpc, pkz, ws, dt2, ptop, a_imp=a_imp, p_fac=p_fac
    )
    pe_below = ptop + jnp.cumsum(delpc, axis=-3)
    pe = jnp.concatenate(
        [jnp.full_like(pe_below[..., :1, :, :], ptop), pe_below], axis=-3
    )
    return pe + pp, delz_new


def heights_from_delz(delz, phis):
    """Interface geopotential heights zh [m] integrated up from the surface.
    delz (.., K, Y, X) negative; phis (.., Y, X) surface geopotential.
    TPU f32 dispatches to the Pallas column kernel (XLA lowers the reverse
    cumsum to reduce_window passes plus a concat copy)."""
    from ._dispatch import use_pallas

    if (
        use_pallas("updatedz")
        and delz.dtype == jnp.float32
        and delz.ndim == 4
        and phis.ndim == 3
    ):
        from .updatedz_pallas import heights_from_delz_pallas

        return heights_from_delz_pallas(delz, phis)
    zs = jnp.expand_dims(phis, -3) / constants.GRAV
    csum = jnp.cumsum(delz[..., ::-1, :, :], axis=-3)[..., ::-1, :, :]
    zh_top = zs - csum  # zh_k = zs - sum_{m>=k} delz_m (delz<0 => zh above zs)
    zh = jnp.concatenate([zh_top, zs * jnp.ones_like(delz[..., :1, :, :])], axis=-3)
    return zh


def updatedz_c(zh_x, zh_y, xfx_l, yfx_l, grid, dt2: float):
    """C-grid interface-height update before riem_solver_c (reference
    updatedzc, SURVEY.md §2.3 updatedzc/updatedzd row; VERDICT r2 #7): the
    provisional C-grid solve must see heights advected by the same C-grid
    winds that advected delpc/ptc, plus the terrain-following surface
    velocity ws_c those heights imply.

    ``zh_x``/``zh_y``: interface heights (.., K+1, Y, X) with x/y corner
    folds; ``xfx_l``/``yfx_l``: the LAYER upwind area fluxes already
    computed by c_sw for the provisional delp/pt transport (CGridState
    .xfx/.yfx — averaged to interfaces here). First-order upwind (matching
    that transport — the reference's update_dz_c is likewise low-order).

    Returns (zh_new, ws_c) with the bottom interface pinned back to the
    surface.
    """
    from ._dispatch import use_pallas

    if use_pallas("updatedz") and zh_x.dtype == jnp.float32:
        from .updatedz_pallas import updatedz_c_pallas

        return updatedz_c_pallas(zh_x, zh_y, xfx_l, yfx_l, grid.area, dt2)

    def to_iface(f):
        mid = 0.5 * (f[..., :-1, :, :] + f[..., 1:, :, :])
        return jnp.concatenate(
            [f[..., :1, :, :], mid, f[..., -1:, :, :]], axis=-3
        )

    xfx, yfx = to_iface(xfx_l), to_iface(yfx_l)
    zx = jnp.where(
        xfx > 0.0, x_cell_to_left_iface(zh_x), x_cell_to_right_iface(zh_x)
    )
    zy = jnp.where(
        yfx > 0.0, y_cell_to_left_iface(zh_y), y_cell_to_right_iface(zh_y)
    )
    area_b = bcast_k(grid.area, zh_x)
    ra = area_b + x_iface_diff(xfx) + y_iface_diff(yfx)
    zh_new = (
        zh_x * area_b + x_iface_diff(zx * xfx) + y_iface_diff(zy * yfx)
    ) / ra
    zs = zh_x[..., -1:, :, :]
    ws_c = (zh_new[..., -1:, :, :] - zs)[..., 0, :, :] / dt2
    zh_new = jnp.concatenate([zh_new[..., :-1, :, :], zs], axis=-3)
    return zh_new, ws_c


def updatedz_d(zh_x, zh_y, crx, cry, xfx, yfx, grid, dt: float, hord: int = 5):
    """Horizontal advection of interface heights by the layer winds
    (reference updatedzd). zh: (.., K+1, Y, X) with corner ghosts in x/y fold;
    courant/area fluxes are LAYER quantities — interface values are averaged
    from the adjacent layers (top/bottom use the nearest layer).

    Uses the same 2-D PPM transport as the mass fluxes so height surfaces and
    pressure surfaces move consistently (a first-order upwind here leaves
    O(upwind-diffusion) height errors that the implicit vertical solver turns
    into spurious w). Returns the advected zh; the caller enforces the
    surface BC and derives ws."""
    from .fvtp2d import fvtp2d_best as fvtp2d

    def to_iface(f):
        mid = 0.5 * (f[..., :-1, :, :] + f[..., 1:, :, :])
        return jnp.concatenate(
            [f[..., :1, :, :], mid, f[..., -1:, :, :]], axis=-3
        )

    crx_i = to_iface(crx)
    cry_i = to_iface(cry)
    xfx_i = to_iface(xfx)
    yfx_i = to_iface(yfx)
    fl = fvtp2d(zh_x, zh_y, crx_i, cry_i, xfx_i, yfx_i, grid.area, hord)
    from ._dispatch import use_pallas

    if use_pallas("updatedz") and zh_x.dtype == jnp.float32:
        from .updatedz_pallas import flux_height_update_pallas

        return flux_height_update_pallas(
            zh_x, fl.fx, fl.fy, xfx_i, yfx_i, grid.area
        )
    area_b = bcast_k(grid.area, zh_x)
    ra = area_b + x_iface_diff(xfx_i) + y_iface_diff(yfx_i)
    zh_new = (
        zh_x * area_b + x_iface_diff(fl.fx) + y_iface_diff(fl.fy)
    ) / ra
    return zh_new


def nh_p_grad(u, v, pk, gz, pp, delp, grid, dt: float):
    """Nonhydrostatic split-form pressure gradient (reference nh_p_grad):
    hydrostatic pk-contour + perturbation Pa-contour."""
    from .pgrad import _pgf_pair

    pk_b = a2b_ord4(pk, grid)
    gz_b = a2b_ord4(gz, grid)
    pp_b = a2b_ord4(pp, grid)
    delp_b = a2b_ord4(delp, grid)

    rdx = bcast_k(grid.rdx, u)
    rdy = bcast_k(grid.rdy, v)

    du_h = _pgf_pair(
        gz_b[..., :, :-1], gz_b[..., :, 1:], pk_b[..., :, :-1], pk_b[..., :, 1:],
        dt, rdx,
    )
    dv_h = _pgf_pair(
        gz_b[..., :-1, :], gz_b[..., 1:, :], pk_b[..., :-1, :], pk_b[..., 1:, :],
        dt, rdy,
    )

    def pert_pair(gz1, gz2, pp1, pp2, dp1, dp2, rdl):
        g1k, g1kp = gz1[..., :-1, :, :], gz1[..., 1:, :, :]
        g2k, g2kp = gz2[..., :-1, :, :], gz2[..., 1:, :, :]
        p1k, p1kp = pp1[..., :-1, :, :], pp1[..., 1:, :, :]
        p2k, p2kp = pp2[..., :-1, :, :], pp2[..., 1:, :, :]
        term = (g1kp - g2k) * (p2kp - p1k) + (g1k - g2kp) * (p1kp - p2k)
        return dt * rdl * term / (dp1 + dp2)

    du_p = pert_pair(
        gz_b[..., :, :-1], gz_b[..., :, 1:], pp_b[..., :, :-1], pp_b[..., :, 1:],
        delp_b[..., :, :-1], delp_b[..., :, 1:], rdx,
    )
    dv_p = pert_pair(
        gz_b[..., :-1, :], gz_b[..., 1:, :], pp_b[..., :-1, :], pp_b[..., 1:, :],
        delp_b[..., :-1, :], delp_b[..., 1:, :], rdy,
    )
    return u + du_h + du_p, v + dv_h + dv_p
