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

from .ppm import _al_limited, _al_unlimited, _monotone_limit, _positive_limit


def _overshoot_limit(bl, br):
    """CW84 parabola overshoot corrections WITHOUT extremum flattening —
    the low-diffusion constraint core shared by kord 7/9/10."""
    da = br - bl
    a6 = -3.0 * (bl + br)
    over_r = da * a6 > da * da
    over_l = -(da * da) > da * a6
    bl2 = jnp.where(over_r, -2.0 * br, bl)
    br2 = jnp.where(over_l & ~over_r, -2.0 * bl, br)
    return bl2, br2


def _noise_mask(q, shift, loose: bool):
    """Cells whose reconstruction must be monotonized: grid-scale (2dz)
    extrema that are NOT smooth (curvature changes sign nearby). Smooth
    extrema — jet maxima, tropopause minima — keep the unlimited parabola:
    this is what makes kord 9/10 less diffusive than the fully monotone
    schemes (reference: FV3 cs_profile selective monotonization). ``loose``
    (kord 10) additionally requires an ADJACENT extremum (pure 2dz noise)."""
    dqm = q - shift(q, -1)  # q[k] - q[k-1]
    dqp = shift(q, 1) - q
    ext = dqm * dqp <= 0.0
    d2 = dqp - dqm
    smooth = (d2 * shift(d2, -1) > 0.0) & (d2 * shift(d2, 1) > 0.0)
    mask = ext & ~smooth
    if loose:
        mask = mask & (shift(ext, -1) | shift(ext, 1))
    # the shifts wrap at the column ends: always constrain the 2 edge cells
    K = q.shape[-3]
    idx = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
    return mask | (idx <= 1) | (idx >= K - 2)


def _one_sided_edges(q, bl, br, clamp: bool = False):
    """Replace the wrap-contaminated interface estimates at the column ends
    with one-sided cubic reconstructions (uniform-spacing analog of the
    reference's one-sided edge formulas in map_single/cs_profile). Exact for
    quadratic profiles; replaces round-1's piecewise-constant flattening of
    the top/bottom two cells, which over-diffused exactly where the sponge
    and stratosphere live (VERDICT r1 missing #2)."""
    K = q.shape[-3]
    if K < 3:
        # degenerate columns: flatten (the round-1 behavior)
        idx = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
        edge = (idx <= 1) | (idx >= K - 2)
        return jnp.where(edge, 0.0, bl), jnp.where(edge, 0.0, br)
    q0 = q[..., 0:1, :, :]
    q1 = q[..., 1:2, :, :]
    q2 = q[..., 2:3, :, :]
    qm1 = q[..., K - 1 : K, :, :]
    qm2 = q[..., K - 2 : K - 1, :, :]
    qm3 = q[..., K - 3 : K - 2, :, :]
    al0 = (11.0 * q0 - 7.0 * q1 + 2.0 * q2) / 6.0  # top interface
    al1 = (2.0 * q0 + 5.0 * q1 - q2) / 6.0  # interface between cells 0,1
    alK = (11.0 * qm1 - 7.0 * qm2 + 2.0 * qm3) / 6.0  # bottom interface
    alK1 = (2.0 * qm1 + 5.0 * qm2 - qm3) / 6.0  # between cells K-2,K-1
    if clamp:
        # strictly monotone schemes: edge interface values bounded by the
        # adjacent cell means so the CW84 constraint guarantees no new
        # extrema (the extrapolated values can escape the data range)
        lo01, hi01 = jnp.minimum(q0, q1), jnp.maximum(q0, q1)
        loK, hiK = jnp.minimum(qm1, qm2), jnp.maximum(qm1, qm2)
        al0 = jnp.clip(al0, lo01, hi01)
        al1 = jnp.clip(al1, lo01, hi01)
        alK = jnp.clip(alK, loK, hiK)
        alK1 = jnp.clip(alK1, loK, hiK)
    bl = jnp.concatenate(
        [al0 - q0, al1 - q1, bl[..., 2 : K - 1, :, :], alK1 - qm1], axis=-3
    )
    br = jnp.concatenate(
        [al1 - q0, br[..., 1 : K - 2, :, :], alK1 - qm2, alK - qm1], axis=-3
    )
    return bl, br


def vertical_reconstruction(q, kord: int, shift):
    """(bl, br) interface perturbations along k for one remap scheme.

    The reference exposes kord_mt/tm/tr/wz as integer scheme selectors with
    distinct limiters (reference baroclinic_c12.yaml:76-79 uses 6/6/8/9; the
    c192 perf config uses 9/-9; SURVEY.md §2.3 map_single/mapn_tracer).
    TPU-native branchless analogs, not bit-ports:

    - |kord| <= 6: limited interface values + full CW84 monotone constraint
      (most diffusive, strictly monotone).
    - |kord| == 7: limited interfaces + overshoot corrections only (Huynh-
      style: no extremum flattening away from grid-scale noise).
    - |kord| == 8: limited interfaces + SELECTIVE monotonization (noise mask).
    - |kord| == 9: unlimited cubic interfaces + selective monotonization —
      smooth extrema keep the full parabola.
    - |kord| >= 10: as 9 with a looser (adjacent-extremum) noise trigger.
    - kord < 0: the positive-definite constraint replaces/augments full
      monotonicity (reference negative-kord variants, e.g. kord_tm=-9).

    Shared by the XLA remap below and the Pallas column kernel
    (remap_pallas.py); ``shift(a, n)`` must return a with its k axis shifted
    so that shift(a, 1)[k] == a[k+1].
    """
    akord = abs(int(kord))
    if akord <= 8:
        al = _al_limited(q, shift)
    else:
        al = _al_unlimited(q, shift)
        # runaway guard (reference cs_profile bounds its "unlimited"
        # interface estimates too): the interface value may overshoot the
        # range of the 4-cell stencil the cubic reads by at most that
        # stencil's own range. A smooth extremum keeps its (small, range-
        # proportional) overshoot — the low-diffusion property — while the
        # unbounded amplification mode that made undamped multi-day kord-9
        # columns blow up (measured: NaN by day 6-8 at C24 without this
        # clamp or the sponge/Rayleigh set) is removed.
        qm2, qm1, qp1 = shift(q, -2), shift(q, -1), shift(q, 1)
        lo = jnp.minimum(jnp.minimum(q, qm1), jnp.minimum(qm2, qp1))
        hi = jnp.maximum(jnp.maximum(q, qm1), jnp.maximum(qm2, qp1))
        r = hi - lo
        al = jnp.clip(al, lo - r, hi + r)
    bl = al - q
    br = shift(al, 1) - q
    bl, br = _one_sided_edges(q, bl, br, clamp=akord <= 8)
    if akord <= 6:
        bl, br = _monotone_limit(q, bl, br)
    elif akord == 7:
        blm, brm = _monotone_limit(q, bl, br)
        blo, bro = _overshoot_limit(bl, br)
        # constrain fully only the 2 wrap-contaminated edge cells
        K = q.shape[-3]
        idx = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
        edge = (idx <= 1) | (idx >= K - 2)
        bl = jnp.where(edge, blm, blo)
        br = jnp.where(edge, brm, bro)
    else:  # 8, 9, 10+: selective
        blm, brm = _monotone_limit(q, bl, br)
        blo, bro = _overshoot_limit(bl, br)
        sel = _noise_mask(q, shift, loose=akord >= 10)
        bl = jnp.where(sel, blm, blo)
        br = jnp.where(sel, brm, bro)
    if kord < 0:
        bl, br = _positive_limit(q, bl, br)
    return bl, br


def _coerce_kord(kord) -> int:
    """Back-compat: boolean ``monotone`` flags map to the scheme they meant
    (True -> fully monotone kord 4, False -> low-diffusion kord 9)."""
    if isinstance(kord, bool):
        return 4 if kord else 9
    return int(kord)


def _vertical_perturbations(q, kord):
    """bl/br perturbations along the K axis (axis -3)."""

    def shift(a, n):
        return jnp.roll(a, -n, axis=-3)

    return vertical_reconstruction(q, _coerce_kord(kord), shift)


def remap_field(q, pe1, pe2, kord=4, monotone=None):
    """Conservatively remap layer means ``q`` from source interfaces ``pe1``
    to target interfaces ``pe2`` with the ``kord`` reconstruction scheme
    (see vertical_reconstruction; a boolean ``monotone`` is accepted for
    back-compat and maps True -> kord 4, False -> kord 9).

    q: (.., K, Y, X); pe1, pe2: (.., K+1, Y, X), monotone increasing in k,
    with pe1[0] == pe2[0] and pe1[K] == pe2[K] (same column mass).
    Returns target layer means (.., K, Y, X).
    """
    if monotone is not None:
        kord = _coerce_kord(monotone)
    dp1 = pe1[..., 1:, :, :] - pe1[..., :-1, :, :]
    bl, br = _vertical_perturbations(q, kord)
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


def remap_field_best(q, pe1, pe2, kord=4):
    """Backend-dispatched remap: the Pallas column kernel on TPU float32
    (whole remap in VMEM, ~4 HBM passes — see remap_pallas), the XLA
    formulation elsewhere (CPU tests, float64 validation runs)."""
    import jax

    from ._dispatch import use_pallas

    if use_pallas("remap") and q.dtype == jnp.float32:
        from .remap_pallas import remap_field_pallas

        return remap_field_pallas(q, pe1, pe2, _coerce_kord(kord))
    return remap_field(q, pe1, pe2, kord)


def remap_tracers(q, pe1, pe2, kord=4):
    """Remap a stacked tracer block (S, nq, K, Y, X) with shared columns."""
    return remap_field(q, pe1[:, None], pe2[:, None], kord)


def pe_at_u_points(pe):
    """Interface pressures averaged to D-grid u points (y-interfaces).
    (.., K+1, Y, X) -> (.., K+1, Y+1, X)."""
    from .stencil_utils import y_cell_to_left_iface, y_cell_to_right_iface

    return 0.5 * (y_cell_to_left_iface(pe) + y_cell_to_right_iface(pe))


def pe_at_v_points(pe):
    from .stencil_utils import x_cell_to_left_iface, x_cell_to_right_iface

    return 0.5 * (x_cell_to_left_iface(pe) + x_cell_to_right_iface(pe))
