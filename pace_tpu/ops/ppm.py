"""1-D PPM (piecewise parabolic method) interface reconstruction and fluxes.

TPU-native analog of ``pyFV3.stencils.xppm`` / ``yppm`` (reference role per
SURVEY.md §2.3: 1-D PPM reconstruction/flux in x/y, hord 5/6/7/8 variants).
Everything is branchless ``jnp.where`` selects on whole arrays — one program
for all shards, limiters included.

Index convention: cell ``i`` spans chart interval ``[i, i+1)``; interface array
index ``i`` is the boundary between cells ``i-1`` and ``i``. Courant numbers
are in cell (index) units, positive toward +axis. The returned interface value
``f`` is the mean of the reconstructed upstream profile over the swept
interval; the physical flux is ``f * (area flux)``.

Because halo ghost cells hold true neighbor-tile values along the continued
index line (see pace_tpu.parallel.topology), the interior 4th-order formula is
applied uniformly across tile edges — no one-sided edge variants are needed,
unlike the reference (which cannot continue index lines across charts).
"""

from __future__ import annotations

import jax.numpy as jnp

from .stencil_utils import sx, sy

#: hord values accepted (reference namelist hord_mt/hord_vt/hord_tm/hord_dp/hord_tr)
SUPPORTED_HORDS = (1, 5, 6, 7, 8)


def _al_unlimited(q, shift):
    """4th-order interface interpolation: al[i] estimates q at interface i."""
    # al_i = 7/12 (q_{i-1} + q_i) - 1/12 (q_{i-2} + q_{i+1})
    return (7.0 / 12.0) * (shift(q, -1) + q) - (1.0 / 12.0) * (
        shift(q, -2) + shift(q, 1)
    )


def _limited_slope(q, shift):
    """Van Leer / CW84 limited slope per cell: bounds al within neighbors."""
    dm = 0.5 * (shift(q, 1) - shift(q, -1))
    dq_r = shift(q, 1) - q
    dq_l = q - shift(q, -1)
    mono = dq_r * dq_l > 0.0
    lim = jnp.minimum(jnp.abs(dm), 2.0 * jnp.minimum(jnp.abs(dq_r), jnp.abs(dq_l)))
    return jnp.where(mono, jnp.sign(dm) * lim, 0.0)


def _al_limited(q, shift):
    """CW84 interface interpolation from limited slopes: al_i in
    [min, max](q_{i-1}, q_i)."""
    dm = _limited_slope(q, shift)
    return 0.5 * (shift(q, -1) + q) + (shift(dm, -1) - dm) / 6.0


def _dm_mono(q, shift):
    """Mono limited slope (Lin 2004 style): the centered slope clamped to
    the distance from the cell mean to the local 3-cell extremes, with sign
    transfer — zero at extrema, |dm| <= min(q_hi, q_lo) inside."""
    qp = shift(q, 1)
    qm = shift(q, -1)
    xt = 0.5 * (qp - qm)
    q_hi = jnp.maximum(jnp.maximum(qm, q), qp) - q
    q_lo = q - jnp.minimum(jnp.minimum(qm, q), qp)
    lim = jnp.minimum(jnp.abs(xt), jnp.minimum(q_hi, q_lo))
    return jnp.where(xt >= 0.0, lim, -lim)


def _perturbations_mono(q, shift):
    """hord=8 monotone interface perturbations, dm-clamp formulation.

    The slope-limited interpolant al (CW84-style, from _dm_mono slopes) is
    clamped so each interface perturbation satisfies |b| <= 2|dm| with the
    slope's sign — the leaner mono constraint of the FV3 xppm family
    (reference pyFV3.stencils.xppm role, SURVEY.md §2.3) instead of the
    three-case CW84 parabola test. Equivalent monotonicity guarantee
    (asserted by test_xppm_monotone_no_overshoot to 1e-12 at f64), ~16%
    faster on the C192 tracer-transport kernel (VMEM-traffic-bound: cost
    tracks op count; see docs/performance.md round-5 campaign)."""
    dm = _dm_mono(q, shift)
    al = 0.5 * (shift(q, -1) + q) + (1.0 / 3.0) * (shift(dm, -1) - dm)
    xt2 = 2.0 * dm
    axt = jnp.abs(xt2)
    blm = jnp.minimum(axt, jnp.abs(al - q))
    brm = jnp.minimum(axt, jnp.abs(shift(al, 1) - q))
    bl = jnp.where(xt2 >= 0.0, -blm, blm)
    br = jnp.where(xt2 >= 0.0, brm, -brm)
    return bl, br


def _monotone_limit(q, bl, br):
    """Colella-Woodward monotonicity constraint on interface perturbations.

    bl = aL - q, br = aR - q. Conditions (CW84 eq. 1.10, rewritten):
    - local extremum (bl*br >= 0): flatten to piecewise constant,
    - parabola overshoots right: bl = -2 br,
    - parabola overshoots left:  br = -2 bl.
    """
    da = br - bl
    a6 = -3.0 * (bl + br)
    extremum = bl * br >= 0.0
    over_r = da * a6 > da * da
    over_l = -(da * da) > da * a6
    bl2 = jnp.where(over_r, -2.0 * br, bl)
    br2 = jnp.where(over_l & ~over_r, -2.0 * bl, br)
    bl = jnp.where(extremum, 0.0, bl2)
    br = jnp.where(extremum, 0.0, br2)
    return bl, br


def _positive_limit(q, bl, br):
    """Positive-definite constraint (Lin 2004 'iv=0' style): GUARANTEE the
    cell parabola stays >= 0 where the input mean is >= 0, touching only
    cells whose parabola undershoots zero.

    The cell parabola is p(xi) = aL + dA*xi + A6*xi*(1-xi) with aL = q + bl,
    dA = br - bl, A6 = -3(bl + br); its interior extremum (when it exists,
    |dA| < |A6|) has value aL + (dA + A6)^2 / (4 A6). Delegating to the
    monotone constraint (the round-1 version) is NOT sufficient when the
    interface values themselves are out of the data range (unlimited kord
    9/-9 reconstructions): instead, clamp the interface values to >= 0 and
    flatten the (rare) cells whose interior vertex still dips below zero.
    """

    def vertex_min(bl_, br_, aL_):
        da_ = br_ - bl_
        a6_ = -3.0 * (bl_ + br_)
        has_vertex = jnp.abs(da_) < jnp.abs(a6_)
        safe_a6 = jnp.where(a6_ == 0.0, 1e-30, a6_)
        p_vertex = aL_ + (da_ + a6_) ** 2 / (4.0 * safe_a6)
        return jnp.where(has_vertex, p_vertex, aL_)

    aL = q + bl
    aR = q + br
    p_min = jnp.minimum(jnp.minimum(aL, aR), vertex_min(bl, br, aL))
    need = p_min < 0.0
    # step 1: interface values >= 0
    bl1 = jnp.maximum(bl, -q)
    br1 = jnp.maximum(br, -q)
    # step 2: flatten cells whose interior vertex still undershoots
    still_neg = vertex_min(bl1, br1, q + bl1) < 0.0
    bl1 = jnp.where(still_neg, 0.0, bl1)
    br1 = jnp.where(still_neg, 0.0, br1)
    return jnp.where(need, bl1, bl), jnp.where(need, br1, br)


def _perturbations(q, hord: int, shift):
    if hord == 8:
        return _perturbations_mono(q, shift)
    al = _al_unlimited(q, shift)
    bl = al - q
    br = shift(al, 1) - q
    if hord in (5, 6):
        pass  # unlimited
    elif hord == 7:
        bl, br = _positive_limit(q, bl, br)
    else:
        raise ValueError(f"unsupported hord {hord}; choose from {SUPPORTED_HORDS}")
    return bl, br


def _flux_1d(q, c, hord: int, shift):
    """Interface value of the upstream PPM profile mean, along one axis.

    q: (..., N) cell means; c: (..., N+?) courant at interfaces, aligned so
    c[..., i] belongs to the interface between cells i-1 and i (both arrays
    are the same padded size in practice; only valid interior is meaningful).
    """
    if hord == 1:  # first-order upwind
        return jnp.where(c > 0.0, shift(q, -1), q)
    bl, br = _perturbations(q, hord, shift)
    b0 = bl + br
    # upstream cell i-1 (c > 0): mean over [1-c, 1] of its parabola
    f_pos = shift(q, -1) + (1.0 - c) * (shift(br, -1) - c * shift(b0, -1))
    # upstream cell i (c < 0): mean over [0, |c|]
    f_neg = q + (1.0 + c) * (bl + c * b0)
    return jnp.where(c > 0.0, f_pos, f_neg)


def xppm(q, crx, hord: int):
    """PPM interface values along x. q: (..., Y, X); crx: (..., Y, X') with
    interface index i between cells i-1, i. Returns array shaped like crx's
    trailing dims broadcast over q's — both padded arrays share shape here."""
    return _flux_1d(q, crx, hord, sx)


def yppm(q, cry, hord: int):
    """PPM interface values along y (interface j between cells j-1, j).

    Runs natively along axis -2 via the ``sy`` shift — transposing to x and
    back would cost two full-array relayouts per call on TPU."""
    return _flux_1d(q, cry, hord, sy)


def xppm_i(q, crx, hord: int):
    """As xppm but for arrays where the interface axis is one larger than the
    cell axis (staggered storage): q: (..., Y, X), crx: (..., Y, X+1).
    Interface ii of crx is between cells ii-1 and ii of q."""
    # Embed q into the interface-sized array (cells 0..X-1 at positions 0..X-1)
    pad = [(0, 0)] * (q.ndim - 1) + [(0, 1)]
    qp = jnp.pad(q, pad)
    f = _flux_1d(qp, crx, hord, sx)
    return f


def yppm_i(q, cry, hord: int):
    """As yppm with cry: (..., Y+1, X)."""
    pad = [(0, 0)] * (q.ndim - 2) + [(0, 1), (0, 0)]
    qp = jnp.pad(q, pad)
    return _flux_1d(qp, cry, hord, sy)
