"""Pressure-gradient force (Lin 1997 finite-volume form) + hydrostatic columns.

TPU-native analogs of ``pyFV3.stencils.{nh_p_grad, one_grad_p, a2b_ord4}`` and
the C-grid ``p_grad_c`` (reference roles per SURVEY.md §2.3). The PGF along an
edge between two columns (1=left/south, 2=right/north), layers k bounded by
interfaces k, k+1, is the contour integral of gz d(pk) around the (edge, k)
face (shoelace form):

    du = dt/(dl * (wk1 + wk2)) * [ (gz1[k+1]-gz2[k])*(pk2[k+1]-pk1[k])
                                 + (gz1[k]-gz2[k+1])*(pk1[k+1]-pk2[k]) ]

with wk = pk[k+1]-pk[k]. Vertical convention: pk = (p/P_REF)^kappa, prognostic
pt = virtual potential temperature [K], hydrostatic gz: dgz = -cp * pt * d(pk).

Layer arrays are (.., K, Y, X); interface arrays (.., K+1, Y, X) — the K axis
stays at position -3 so the trailing (Y, X) stencil helpers keep working.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from .d2a2c import centers_to_x_ifaces, centers_to_y_ifaces
from .stencil_utils import (
    bcast_k,
    x_cell_to_left_iface,
    x_cell_to_right_iface,
    y_cell_to_left_iface,
    y_cell_to_right_iface,
)


def a2b_ord4(q, grid=None):
    """4th-order A-grid (cell centers) -> B-grid (corners) interpolation.

    Analog of ``pyFV3.stencils.a2b_ord4.AGrid2BGridFourthOrder``. Uniform
    separable 4th-order weights in the interior. On TILE-EDGE interface
    lines the two adjacent cell centers straddle the coordinate kink, so
    index-space interpolation misplaces the value there (measured: 30x the
    interior error, and the resulting spurious edge PGF drove a stationary
    ~10 hPa cube-corner surface-pressure anomaly in the JW06 steady state);
    the across-edge value is instead the great-circle-distance-weighted
    2-point interpolation (grid.a2b_wx/a2b_wy — the reference's
    edge_w/edge_vect metric treatment), then the usual 4th-order
    interpolation ALONG the (smooth) edge. At 3-valent cube corners the
    value is the mean of the 3 one-sided diagonal extrapolations (reference
    a2b_ord4 extrap_corner analog). (.., Y, X) -> (.., Y+1, X+1).
    """
    from .stencil_utils import (
        bcast_k,
        x_cell_to_left_iface,
        x_cell_to_right_iface,
        y_cell_to_left_iface,
        y_cell_to_right_iface,
    )

    qx = centers_to_x_ifaces(q)
    if grid is not None:
        # W/E tile-edge columns: along-edge-corrected ghost + across average
        q_l = x_cell_to_left_iface(q)
        q_r = x_cell_to_right_iface(q)
        gl = bcast_k(grid.a2b_ghost_left_x, qx)
        ghost = gl * q_l + (1.0 - gl) * q_r
        inside = gl * q_r + (1.0 - gl) * q_l
        ghost_t = (
            bcast_k(grid.a2b_x_w0, qx) * ghost
            + bcast_k(grid.a2b_x_wp, qx) * jnp.roll(ghost, -1, axis=-2)
            + bcast_k(grid.a2b_x_wm, qx) * jnp.roll(ghost, 1, axis=-2)
        )
        qmx = 0.5 * (inside + ghost_t)
        ex = bcast_k(grid.edge_w_iface + grid.edge_e_iface, qx)
        qx = qx + ex * (qmx - qx)
        # first interior interface next to the edge: its centered 4-pt
        # stencil reads one ghost center across the kink — replace with the
        # one-sided cubic from the 4 INSIDE centers (Lagrange at the
        # interface of uniformly-indexed centers: 5/16, 15/16, -5/16, 1/16)
        from .stencil_utils import sx

        os_r = (
            0.3125 * q_l + 0.9375 * q_r
            - 0.3125 * x_cell_to_right_iface(sx(q, 1))
            + 0.0625 * x_cell_to_right_iface(sx(q, 2))
        )
        os_l = (
            0.3125 * q_r + 0.9375 * q_l
            - 0.3125 * x_cell_to_left_iface(sx(q, -1))
            + 0.0625 * x_cell_to_left_iface(sx(q, -2))
        )
        in_w = bcast_k(jnp.roll(grid.edge_w_iface, 1, axis=-1), qx)
        in_e = bcast_k(jnp.roll(grid.edge_e_iface, -1, axis=-1), qx)
        qx = qx + in_w * (os_r - qx) + in_e * (os_l - qx)
    out = centers_to_y_ifaces(qx)
    if grid is not None:
        # S/N tile-edge rows: same treatment, then 4th-order along the edge
        qy = centers_to_y_ifaces(q)
        q_s = y_cell_to_left_iface(q)
        q_n = y_cell_to_right_iface(q)
        gs = bcast_k(grid.a2b_ghost_south_y, qy)
        ghost = gs * q_s + (1.0 - gs) * q_n
        inside = gs * q_n + (1.0 - gs) * q_s
        ghost_t = (
            bcast_k(grid.a2b_y_w0, qy) * ghost
            + bcast_k(grid.a2b_y_wp, qy) * jnp.roll(ghost, -1, axis=-1)
            + bcast_k(grid.a2b_y_wm, qy) * jnp.roll(ghost, 1, axis=-1)
        )
        qmy = 0.5 * (inside + ghost_t)
        ey_line = bcast_k(grid.edge_s_iface + grid.edge_n_iface, qy)
        qy = qy + ey_line * (qmy - qy)
        from .stencil_utils import sy

        os_n = (
            0.3125 * q_s + 0.9375 * q_n
            - 0.3125 * y_cell_to_right_iface(sy(q, 1))
            + 0.0625 * y_cell_to_right_iface(sy(q, 2))
        )
        os_s = (
            0.3125 * q_n + 0.9375 * q_s
            - 0.3125 * y_cell_to_left_iface(sy(q, -1))
            + 0.0625 * y_cell_to_left_iface(sy(q, -2))
        )
        in_s = bcast_k(jnp.roll(grid.edge_s_iface, 1, axis=-2), qy)
        in_n = bcast_k(jnp.roll(grid.edge_n_iface, -1, axis=-2), qy)
        qy = qy + in_s * (os_n - qy) + in_n * (os_s - qy)
        out_y = centers_to_x_ifaces(qy)
        ey = bcast_k(grid.edge_s_iface + grid.edge_n_iface, out)
        out = out + ey * (out_y - out)

        from .corners import extrapolate_3_to_corner

        out = extrapolate_3_to_corner(q, grid, out)
    return out


def hydrostatic_interfaces(delp, pt, phis, ptop: float):
    """Interface pressures and geopotential from layer thickness/temperature.

    Computing over the FULL padded domain (halo columns included — delp's
    halo is valid after exchange) subsumes the reference's dedicated halo
    edge-fill stencils ``pyFV3.stencils.pe_halo.edge_pe`` and
    ``pyFV3.stencils.pk3_halo.PK3Halo`` (SURVEY.md §2.3): on TPU one dense
    cumsum over (K, Y, X) is cheaper than separate edge-strip kernels, and
    the halo ring of pe/pk comes out identical by construction.

    Returns (pe, peln, pk, pkz, gz):
      pe   (.., K+1, Y, X) interface pressure [Pa], pe[0] = ptop
      peln log(pe)
      pk   (pe / P_REF)^kappa
      pkz  layer-mean pk (exact integral: d(pk)/(kappa d(ln p)))
      gz   interface geopotential [m^2/s^2], gz[K] = phis
    """
    kap = constants.KAPPA
    pe_below = ptop + jnp.cumsum(delp, axis=-3)
    top = jnp.full_like(pe_below[..., :1, :, :], ptop)
    pe = jnp.concatenate([top, pe_below], axis=-3)
    peln = jnp.log(pe)
    pk = (pe / constants.P_REF) ** kap
    dpk = pk[..., 1:, :, :] - pk[..., :-1, :, :]
    pkz = dpk / (kap * (peln[..., 1:, :, :] - peln[..., :-1, :, :]))
    # gz upward accumulation: gz[k] = phis + cp * sum_{m>=k} pt[m] * dpk[m]
    contrib = constants.CP_AIR * pt * dpk  # (.., K, Y, X)
    csum = jnp.cumsum(contrib[..., ::-1, :, :], axis=-3)[..., ::-1, :, :]
    phis_e = jnp.expand_dims(phis, -3) if phis.ndim < contrib.ndim else phis
    gz_top = phis_e + csum
    gz_sfc = phis_e * jnp.ones_like(contrib[..., :1, :, :])
    gz = jnp.concatenate([gz_top, gz_sfc], axis=-3)
    return pe, peln, pk, pkz, gz


def _pgf_pair(gz1, gz2, pk1, pk2, dt: float, rdl):
    """du = contour integral PGF between two interface-columns (K+1 arrays)."""
    wk1 = pk1[..., 1:, :, :] - pk1[..., :-1, :, :]
    wk2 = pk2[..., 1:, :, :] - pk2[..., :-1, :, :]
    g1k, g1kp = gz1[..., :-1, :, :], gz1[..., 1:, :, :]
    g2k, g2kp = gz2[..., :-1, :, :], gz2[..., 1:, :, :]
    p1k, p1kp = pk1[..., :-1, :, :], pk1[..., 1:, :, :]
    p2k, p2kp = pk2[..., :-1, :, :], pk2[..., 1:, :, :]
    term = (g1kp - g2k) * (p2kp - p1k) + (g1k - g2kp) * (p1kp - p2k)
    return dt * rdl * term / (wk1 + wk2)


def p_grad_c(uc, vc, pkc, gz, grid, dt2: float):
    """C-grid pressure-gradient update from cell-center interface columns."""
    du = _pgf_pair(
        x_cell_to_left_iface(gz),
        x_cell_to_right_iface(gz),
        x_cell_to_left_iface(pkc),
        x_cell_to_right_iface(pkc),
        dt2,
        bcast_k(grid.rdxc, uc),
    )
    dv = _pgf_pair(
        y_cell_to_left_iface(gz),
        y_cell_to_right_iface(gz),
        y_cell_to_left_iface(pkc),
        y_cell_to_right_iface(pkc),
        dt2,
        bcast_k(grid.rdyc, vc),
    )
    return uc + du, vc + dv


_A2B_FACTORY = None


def _a2b_factory():
    """Module-level StencilFactory, built once and reused across traces —
    the reference's factory likewise lives for the Driver's lifetime
    (driver.py:471-475). Zero per-call cost either way under jit (stencil
    construction happens at trace time only), hoisted so the facade's
    caching behavior is exercised as designed."""
    global _A2B_FACTORY
    if _A2B_FACTORY is None:
        from ..dsl import StencilFactory

        _A2B_FACTORY = StencilFactory()
    return _A2B_FACTORY


def one_grad_p(u, v, pk, gz, grid, dt: float):
    """Hydrostatic D-grid pressure-gradient update (reference one_grad_p):
    pk/gz interpolated to corners, then the contour PGF along each edge.

    The corner interpolations run through the dsl-layer ``FrozenStencil``
    — the production consumer of the stencil facade, mirroring the
    reference where AGrid2BGridFourthOrder is a StencilFactory product
    built once and reused (reference driver/pace/driver/driver.py:471-475;
    stencil construction in pyFV3's one_grad_p/a2b_ord4). One stencil
    serves both fields (pk and gz share a shape), exercising the
    reference's stencil-reuse/caching behavior; origin/domain is the full
    padded (y, x) window because this op, like every op in this package,
    computes ghost values that the next halo exchange overwrites.
    """
    factory = _a2b_factory()
    # func sees (out_window, q_window); grid is the stencil's "externals"
    # closure (tracer-safe under the outer jit — metric terms stay jit
    # arguments, not baked constants)
    a2b = factory.from_origin_domain(
        lambda out, q: a2b_ord4(q, grid), origin=(0, 0), domain=(-1, -1)
    )
    out_buf = jnp.zeros(
        pk.shape[:-2] + (pk.shape[-2] + 1, pk.shape[-1] + 1), pk.dtype
    )
    pk_b = a2b(out_buf, pk)  # (.., K+1, Y+1, X+1)
    gz_b = a2b(out_buf, gz)
    du = _pgf_pair(
        gz_b[..., :, :-1],
        gz_b[..., :, 1:],
        pk_b[..., :, :-1],
        pk_b[..., :, 1:],
        dt,
        bcast_k(grid.rdx, u),
    )
    dv = _pgf_pair(
        gz_b[..., :-1, :],
        gz_b[..., 1:, :],
        pk_b[..., :-1, :],
        pk_b[..., 1:, :],
        dt,
        bcast_k(grid.rdy, v),
    )
    return u + du, v + dv