"""Lagrangian -> Eulerian vertical remapping (PPM, conservative).

TPU-native analog of ``pyFV3.stencils.remapping.LagrangianToEulerian`` with
``map_single``/``mapn_tracer`` (reference roles per SURVEY.md §2.3: vertical
remap kernels, cubic-spline/PPM, kord_* params; savepoint stage ``Remapping``).

Design: instead of the reference's per-column searching loops (data-dependent
control flow), the remap evaluates the PPM cumulative integral

    Q(p) = sum_m dp1[m] * F_m( clip((p - pe1[m]) / dp1[m], 0, 1) )

at every target interface with a ``lax.scan`` over target levels — each scan
step is a dense elementwise+reduce over source levels, ideal for the TPU
vector unit; memory stays O(K) per column. Exactly conservative:
Q(pe_bottom) = sum q dp by construction, and target means are differences of
Q. Monotone (CW84-limited) reconstruction by default (the reference's
monotone kord variants).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ppm import _al_limited, _al_unlimited, _monotone_limit


def _vertical_perturbations(q, monotone: bool):
    """bl/br perturbations along the K axis (axis -3) with edge-cell flattening."""

    def shift(a, n):
        return jnp.roll(a, -n, axis=-3)

    al = _al_limited(q, shift) if monotone else _al_unlimited(q, shift)
    bl = al - q
    br = shift(al, 1) - q
    if monotone:
        bl, br = _monotone_limit(q, bl, br)
    # top/bottom two cells: piecewise constant (their interface estimates
    # would read wrapped/one-sided neighbors)
    k = q.shape[-3]
    idx = jnp.arange(k).reshape((k,) + (1,) * 2)
    edge = (idx <= 1) | (idx >= k - 2)
    bl = jnp.where(edge, 0.0, bl)
    br = jnp.where(edge, 0.0, br)
    return bl, br


def remap_field(q, pe1, pe2, monotone: bool = True):
    """Conservatively remap layer means ``q`` from source interfaces ``pe1``
    to target interfaces ``pe2``.

    q: (.., K, Y, X); pe1, pe2: (.., K+1, Y, X), monotone increasing in k,
    with pe1[0] == pe2[0] and pe1[K] == pe2[K] (same column mass).
    Returns target layer means (.., K, Y, X).
    """
    dp1 = pe1[..., 1:, :, :] - pe1[..., :-1, :, :]
    bl, br = _vertical_perturbations(q, monotone)
    a_l = q + bl
    d_a = br - bl
    a6 = -3.0 * (bl + br)

    p_top = pe1[..., :1, :, :]

    def cumulative(p):
        """Q(p): integral of the reconstruction from the column top to p.
        p: (.., Y, X) broadcastable against the source arrays."""
        t = jnp.clip((p[..., None, :, :] - pe1[..., :-1, :, :]) / dp1, 0.0, 1.0)
        f = a_l * t + 0.5 * d_a * t**2 + a6 * (0.5 * t**2 - t**3 / 3.0)
        return jnp.sum(dp1 * f, axis=-3)

    k2 = pe2.shape[-3]
    # scan over target interfaces (skip the top: Q=0 there)
    p_seq = jnp.moveaxis(pe2, -3, 0)  # (K+1, .., Y, X)

    def body(carry, p):
        qv = cumulative(p)
        return carry, qv

    _, qs = jax.lax.scan(body, 0.0, p_seq[1:])
    del p_top, k2
    q_int = jnp.concatenate(
        [jnp.zeros_like(qs[:1]), qs], axis=0
    )  # (K+1, .., Y, X) cumulative at targets
    dq = q_int[1:] - q_int[:-1]
    dp2 = p_seq[1:] - p_seq[:-1]
    out = dq / dp2
    return jnp.moveaxis(out, 0, -3)


def remap_tracers(q, pe1, pe2, monotone: bool = True):
    """Remap a stacked tracer block (S, nq, K, Y, X) with shared columns."""
    return remap_field(q, pe1[:, None], pe2[:, None], monotone)


def pe_at_u_points(pe):
    """Interface pressures averaged to D-grid u points (y-interfaces).
    (.., K+1, Y, X) -> (.., K+1, Y+1, X)."""
    from .stencil_utils import y_cell_to_left_iface, y_cell_to_right_iface

    return 0.5 * (y_cell_to_left_iface(pe) + y_cell_to_right_iface(pe))


def pe_at_v_points(pe):
    from .stencil_utils import x_cell_to_left_iface, x_cell_to_right_iface

    return 0.5 * (x_cell_to_left_iface(pe) + x_cell_to_right_iface(pe))
