"""Lagrangian -> Eulerian vertical remapping (PPM, conservative).

TPU-native analog of ``pyFV3.stencils.remapping.LagrangianToEulerian`` with
``map_single``/``mapn_tracer`` (reference roles per SURVEY.md §2.3: vertical
remap kernels, cubic-spline/PPM, kord_* params; savepoint stage ``Remapping``).

Design: instead of the reference's per-column searching loops (data-dependent
control flow), the remap computes the cumulative PPM integral at target
interfaces

    Q(p) = Q1[m] + dp1[m] * F_m((p - pe1[m]) / dp1[m]),   m = cell containing p

with ``Q1`` the running column integral at source interfaces (one cumsum) and
``m`` located by a vmapped binary search over the monotone interface columns —
O(K log K) per column instead of the naive O(K^2) sum-over-sources-per-target
(which cost ~650 ms per remap at C192 npz=79). Exactly conservative:
Q(pe_bottom) = sum q dp by construction (F(1) integrates to the cell mean),
and target means are differences of Q. Monotone (CW84-limited) reconstruction
by default (the reference's monotone kord variants).
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

    K = q.shape[-3]
    K2 = pe2.shape[-3]

    # running column integral at source interfaces: Q1[k] = sum_{m<k} q dp
    q_dp = q * dp1
    Q1 = jnp.concatenate(
        [jnp.zeros_like(q_dp[..., :1, :, :]), jnp.cumsum(q_dp, axis=-3)],
        axis=-3,
    )

    # locate the source cell containing each target interface:
    # m = #{k in 1..K : pe1[k] <= p}, evaluated as dense chunked comparison
    # sums — pure VPU work. (A vmapped binary search lowers to sequential
    # per-element gathers on TPU and measured ~80x SLOWER than even the naive
    # O(K^2) integral; comparison counting is ~2 field passes per chunk.)
    CH = 16
    n_ch = -(-K // CH)
    pad = n_ch * CH - K
    pe1_bot = pe1[..., 1:, :, :]  # bottom interface of each source cell
    if pad:
        big = jnp.full_like(pe1_bot[..., :1, :, :], jnp.inf)
        pe1_bot = jnp.concatenate(
            [pe1_bot] + [big] * pad, axis=-3
        )
    m = jnp.zeros(pe2.shape, dtype=jnp.int32)
    for c in range(n_ch):
        sl = pe1_bot[..., c * CH : (c + 1) * CH, :, :]
        # (..., CH, 1, Y, X) <= (..., 1, K2, Y, X) summed over the CH axis
        m = m + jnp.sum(
            (sl[..., :, None, :, :] <= pe2[..., None, :, :, :]).astype(
                jnp.int32
            ),
            axis=-4,
        )
    m = jnp.clip(m, 0, K - 1)

    # Read the source-cell quantities at m WITHOUT per-element gathers
    # (take_along_axis along k lowers to serial gathers on TPU — measured
    # seconds per call at C192). m is within a few cells of the identity
    # (vertical displacement per remap interval is << D layers for any state
    # the acoustic solver survives), so val[m] = sum over a small window of
    # statically shifted copies selected by the offset mask — pure VPU work.
    D = 5
    base = jnp.clip(jnp.arange(K2, dtype=jnp.int32) - 1, 0, K - 1)
    base = base.reshape((K2,) + (1,) * 2)
    off = jnp.clip(m - base, -D, D)

    def shift_k(val, s):
        """out[..., j, :, :] = val[..., clip(base[j] + s, 0, Kv-1), :, :] via
        static pad-and-slice (base[j] = clip(j-1, 0, K-1))."""
        Kv = val.shape[-3]
        first = val[..., :1, :, :]
        last = val[..., -1:, :, :]
        # indices needed: clip(j - 1 + s, 0, Kv-1) for j = 0..K2-1; the index
        # range [lo, lo+K2) may fall entirely below 0 or above Kv when the
        # window D exceeds the column depth (small-nz tests)
        lo = -1 + s
        pads_front = min(K2, max(0, -lo))
        pads_back = min(K2 - pads_front, max(0, lo + K2 - Kv))
        sl_start = min(max(0, lo), Kv)
        sl_stop = max(sl_start, min(Kv, lo + K2))
        parts = []
        if pads_front:
            parts.extend([first] * pads_front)
        if sl_stop > sl_start:
            parts.append(val[..., sl_start:sl_stop, :, :])
        if pads_back:
            parts.extend([last] * pads_back)
        return jnp.concatenate(parts, axis=-3) if len(parts) > 1 else parts[0]

    pe1_m = jnp.zeros_like(pe2)
    dp1_m = jnp.zeros_like(pe2)
    al_m = jnp.zeros_like(pe2)
    da_m = jnp.zeros_like(pe2)
    a6_m = jnp.zeros_like(pe2)
    Q1_m = jnp.zeros_like(pe2)
    pe1_cells = pe1[..., :-1, :, :]  # top interface of each cell
    Q1_cells = Q1[..., :-1, :, :]
    for o in range(-D, D + 1):
        mask = off == o
        pe1_m = jnp.where(mask, shift_k(pe1_cells, o), pe1_m)
        dp1_m = jnp.where(mask, shift_k(dp1, o), dp1_m)
        al_m = jnp.where(mask, shift_k(a_l, o), al_m)
        da_m = jnp.where(mask, shift_k(d_a, o), da_m)
        a6_m = jnp.where(mask, shift_k(a6, o), a6_m)
        Q1_m = jnp.where(mask, shift_k(Q1_cells, o), Q1_m)

    t = jnp.clip((pe2 - pe1_m) / dp1_m, 0.0, 1.0)
    f = al_m * t + 0.5 * da_m * t**2 + a6_m * (0.5 * t**2 - t**3 / 3.0)
    q_int = Q1_m + dp1_m * f
    dq = q_int[..., 1:, :, :] - q_int[..., :-1, :, :]
    dp2 = pe2[..., 1:, :, :] - pe2[..., :-1, :, :]
    return dq / dp2


def remap_field_best(q, pe1, pe2, monotone: bool = True):
    """Backend-dispatched remap: the Pallas column kernel on TPU float32
    (whole remap in VMEM, ~4 HBM passes — see remap_pallas), the XLA
    formulation elsewhere (CPU tests, float64 validation runs)."""
    import jax

    from ._dispatch import use_pallas

    if use_pallas("remap") and q.dtype == jnp.float32:
        from .remap_pallas import remap_field_pallas

        return remap_field_pallas(q, pe1, pe2, monotone)
    return remap_field(q, pe1, pe2, monotone)


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
