"""D-grid -> A-grid -> C-grid wind staggering transforms.

TPU-native analog of ``pyFV3.stencils.d2a2c_vect`` (reference role per
SURVEY.md §2.3; on-disk import at reference driver/examples/notebooks/
serial_debugging.ipynb). Produces, from the prognostic D-grid covariant winds:

- ``ua, va``: contravariant winds at cell centers (used for upwinding and as
  the advecting wind in several places),
- ``uc, vc``: covariant C-grid winds (x-wind at x-interfaces, y-wind at
  y-interfaces),
- ``ut, vt``: their contravariant counterparts.

4th-order interpolation uses the uniform (9/16, -1/16) weights everywhere:
halo ghost values are exact neighbor-tile values along continued index lines
(see pace_tpu.parallel.topology), so no one-sided edge variants are required,
unlike the reference.
"""

from __future__ import annotations


from .fxadv import contravariant_c_winds
from .stencil_utils import (
    bcast_k,
    sx,
    sy,
    x_cell_to_left_iface,
    x_cell_to_right_iface,
    y_cell_to_left_iface,
    y_cell_to_right_iface,
)

A1 = 9.0 / 16.0
A2 = -1.0 / 16.0


def u_to_centers(u):
    """4th-order average of a y-interface field to cell centers along y.
    (.., Y+1, X) -> (.., Y, X)."""
    u_j = u[..., :-1, :]
    u_jp1 = u[..., 1:, :]
    u_jm1 = sy(u, -1)[..., :-1, :]
    u_jp2 = sy(u, 2)[..., :-1, :]
    return A1 * (u_j + u_jp1) + A2 * (u_jm1 + u_jp2)


def v_to_centers(v):
    """(.., Y, X+1) -> (.., Y, X) along x."""
    v_i = v[..., :-1]
    v_ip1 = v[..., 1:]
    v_im1 = sx(v, -1)[..., :-1]
    v_ip2 = sx(v, 2)[..., :-1]
    return A1 * (v_i + v_ip1) + A2 * (v_im1 + v_ip2)


def centers_to_x_ifaces(q):
    """4th-order interpolation of a center field to x-interfaces.
    (.., Y, X) -> (.., Y, X+1); interface ii between cells ii-1, ii."""
    q_m1 = x_cell_to_left_iface(q)
    q_0 = x_cell_to_right_iface(q)
    q_m2 = x_cell_to_left_iface(sx(q, -1))
    q_p1 = x_cell_to_right_iface(sx(q, 1))
    return A1 * (q_m1 + q_0) + A2 * (q_m2 + q_p1)


def centers_to_y_ifaces(q):
    """(.., Y, X) -> (.., Y+1, X)."""
    q_m1 = y_cell_to_left_iface(q)
    q_0 = y_cell_to_right_iface(q)
    q_m2 = y_cell_to_left_iface(sy(q, -1))
    q_p1 = y_cell_to_right_iface(sy(q, 1))
    return A1 * (q_m1 + q_0) + A2 * (q_m2 + q_p1)


def cartesian_wind_centers(u, v, grid):
    """Physical wind as a Cartesian 3-vector at cell centers (.., 3, Y, X).

    Interior: 4th-order covariant averages of the D-grid winds, converted to
    contravariant and expanded in the local basis. Within 2 cells of a tile
    edge (where the 4-point stencils cross the basis kink and the covariant
    samples JUMP in value): a per-cell least-squares reconstruction from the
    cell's own four staggered covariant samples with their exact per-point
    bases (precomputed inverse normal matrix ``grid.minv``) — uniformly
    2nd-order and kink-proof. This replaces the reference's one-sided
    edge_interpolate4 / csw edge regions with data-driven masking.
    """
    import jax.numpy as jnp

    utmp = u_to_centers(u)  # covariant x-wind at centers (4th order)
    vtmp = v_to_centers(v)
    rsin2 = bcast_k(grid.rsin2, utmp)
    cosa_s = bcast_k(grid.cosa_s, utmp)
    ua4 = (utmp - vtmp * cosa_s) * rsin2  # contravariant
    va4 = (vtmp - utmp * cosa_s) * rsin2
    ua4_e = jnp.expand_dims(ua4, -3)
    va4_e = jnp.expand_dims(va4, -3)
    v4 = ua4_e * bcast_k(grid.ec1, ua4_e) + va4_e * bcast_k(grid.ec2, va4_e)

    # local solve: b = sum_k sample_k * basis_k over the 4 cell faces
    u_e = jnp.expand_dims(u, -3)  # (.., 1, Y+1, X)
    v_e = jnp.expand_dims(v, -3)
    es1 = bcast_k(grid.es1, u_e)
    ew2 = bcast_k(grid.ew2, v_e)
    b = (
        (u_e * es1)[..., :-1, :]
        + (u_e * es1)[..., 1:, :]
        + (v_e * ew2)[..., :, :-1]
        + (v_e * ew2)[..., :, 1:]
    )  # (.., 3, Y, X)
    v2 = None
    for jcomp in range(3):
        bj = b[..., jcomp, :, :]
        col = bcast_k(grid.minv[:, :, jcomp], jnp.expand_dims(bj, -3))
        term = col * jnp.expand_dims(bj, -3)
        v2 = term if v2 is None else v2 + term

    band = bcast_k(grid.band_c, v4) > 0.5
    return jnp.where(band, v2, v4)


def d2a2c_vect(u, v, grid):
    """All staggering transforms from the D-grid winds in one call.

    Returns (ua, va, uc, vc, ut, vt). All interpolation to interfaces happens
    on the Cartesian wind vector (value-continuous across tile edges), then
    projects onto the local interface bases.

    On TPU with 4-D winds, dispatches to the fused Pallas kernel
    (:mod:`d2a2c_pallas`: one VMEM pass instead of ~15 HBM round trips of
    3-vector intermediates); agreement verified to round-off on the consumed
    interior (tests/main/test_d2a2c_pallas.py).
    """
    import jax

    import jax.numpy as jnp

    from ._dispatch import use_pallas

    if use_pallas("d2a2c") and u.ndim == 4:
        from .d2a2c_pallas import d2a2c_vect_pallas

        return d2a2c_vect_pallas(u, v, grid)

    vcart = cartesian_wind_centers(u, v, grid)

    u_cov = jnp.sum(vcart * bcast_k(grid.ec1, vcart), axis=-3)
    v_cov = jnp.sum(vcart * bcast_k(grid.ec2, vcart), axis=-3)
    rsin2 = bcast_k(grid.rsin2, u_cov)
    cosa_s = bcast_k(grid.cosa_s, u_cov)
    ua = (u_cov - v_cov * cosa_s) * rsin2  # contravariant at centers
    va = (v_cov - u_cov * cosa_s) * rsin2

    vcart_x = centers_to_x_ifaces(vcart)  # (.., 3, Y, X+1)
    uc = jnp.sum(vcart_x * bcast_k(grid.ew1, vcart_x), axis=-3)
    vcart_y = centers_to_y_ifaces(vcart)  # (.., 3, Y+1, X)
    vc = jnp.sum(vcart_y * bcast_k(grid.es2, vcart_y), axis=-3)

    ut, vt = contravariant_c_winds(uc, vc, grid)
    return ua, va, uc, vc, ut, vt
