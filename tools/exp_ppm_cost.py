"""Cost-split experiment for the fvtp2d tracer kernel: what fraction of
the 45 ms/call is DMA floor, roll (shift) cost, and limiter arithmetic?

Monkeypatches ppm._flux_1d with stripped variants and times one fresh
call of fvtp2d_tracer_pallas at model shapes via profiler device events.

Usage: python tools/exp_ppm_cost.py {floor|rolls|hord6|hord8|hord8w}
  floor  — q + c (no shifts, no limiter: DMA + loop overhead)
  rolls  — sum of the 7 shift patterns of hord6 (shift cost only)
  hord6  — unlimited PPM (production hord for dynamics fields)
  hord8  — monotone PPM (production hord_tr)
  hord8w — hord8 with sign()->where and fused-reuse micro-opts
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.kprof import _trace_pallas_seconds  # reuse the tracing harness

from pace_tpu.ops import ppm

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "hord8"


def _flux_floor(q, c, hord, shift):
    return q + c


def _flux_rolls(q, c, hord, shift):
    # the 7 distinct shifts of the hord6 path, minimal arithmetic
    return (
        shift(q, -1) + shift(q, -2) + shift(q, 1)
        + shift(q + c, 1) + shift(q - c, -1)
        + shift(q * c, -1) + c
    )


def _limited_slope_w(q, shift):
    dm = 0.5 * (shift(q, 1) - shift(q, -1))
    dq_r = shift(q, 1) - q
    dq_l = q - shift(q, -1)
    mono = dq_r * dq_l > 0.0
    lim = jnp.minimum(
        jnp.abs(dm), 2.0 * jnp.minimum(jnp.abs(dq_r), jnp.abs(dq_l))
    )
    signed = jnp.where(dm >= 0.0, lim, -lim)
    return jnp.where(mono, signed, 0.0)


def _flux_hord8w(q, c, hord, shift):
    dm = _limited_slope_w(q, shift)
    al = 0.5 * (shift(q, -1) + q) + (shift(dm, -1) - dm) * (1.0 / 6.0)
    bl = al - q
    br = shift(al, 1) - q
    da = br - bl
    a6 = -3.0 * (bl + br)
    da2 = da * da
    daa6 = da * a6
    extremum = bl * br >= 0.0
    over_r = daa6 > da2
    over_l = -da2 > daa6
    bl2 = jnp.where(over_r, -2.0 * br, bl)
    br2 = jnp.where(over_l & ~over_r, -2.0 * bl, br)
    bl = jnp.where(extremum, 0.0, bl2)
    br = jnp.where(extremum, 0.0, br2)
    b0 = bl + br
    f_pos = shift(q, -1) + (1.0 - c) * (shift(br, -1) - c * shift(b0, -1))
    f_neg = q + (1.0 + c) * (bl + c * b0)
    return jnp.where(c > 0.0, f_pos, f_neg)


def _flux_hord8fv3(q, c, hord, shift):
    """FV3 xppm iord=8 (Lin 2004): limited slope dm, al from dm, then
    interface perturbations clamped by 2|dm| with sign transfer — the
    reference scheme for hord_tr=8 (reference pyFV3.stencils.xppm role,
    SURVEY.md §2.3)."""
    qp = shift(q, 1)
    qm = shift(q, -1)
    xt = 0.5 * (qp - qm)
    q_hi = jnp.maximum(jnp.maximum(qm, q), qp) - q
    q_lo = q - jnp.minimum(jnp.minimum(qm, q), qp)
    lim = jnp.minimum(jnp.abs(xt), jnp.minimum(q_hi, q_lo))
    dm = jnp.where(xt >= 0.0, lim, -lim)
    al = 0.5 * (qm + q) + (1.0 / 3.0) * (shift(dm, -1) - dm)
    xt2 = 2.0 * dm
    axt = jnp.abs(xt2)
    blm = jnp.minimum(axt, jnp.abs(al - q))
    brm = jnp.minimum(axt, jnp.abs(shift(al, 1) - q))
    bl = jnp.where(xt2 >= 0.0, -blm, blm)
    br = jnp.where(xt2 >= 0.0, brm, -brm)
    b0 = bl + br
    f_pos = shift(q, -1) + (1.0 - c) * (shift(br, -1) - c * shift(b0, -1))
    f_neg = q + (1.0 + c) * (bl + c * b0)
    return jnp.where(c > 0.0, f_pos, f_neg)


def main() -> None:
    orig = ppm._flux_1d
    if VARIANT == "floor":
        ppm._flux_1d = _flux_floor
    elif VARIANT == "rolls":
        ppm._flux_1d = _flux_rolls
    elif VARIANT == "hord8w":
        ppm._flux_1d = _flux_hord8w
    elif VARIANT == "hord8fv3":
        ppm._flux_1d = _flux_hord8fv3
    elif VARIANT not in ("hord6", "hord8"):
        raise SystemExit(f"unknown variant {VARIANT}")
    hord = 6 if VARIANT == "hord6" else 8

    from pace_tpu.ops.fvtp2d_pallas import fvtp2d_tracer_pallas

    S, NQ, K, Y, X = 6, 9, 79, 198, 198
    key = jax.random.PRNGKey(0)

    def r(*sh, s=1.0):
        nonlocal key
        key, sub = jax.random.split(key)
        return s * jax.random.normal(sub, sh, jnp.float32)

    qt = r(S, NQ, K, Y, X) + 5.0
    crx, cry = r(S, K, Y, X + 1, s=0.3), r(S, K, Y + 1, X, s=0.3)
    xfx, yfx = r(S, K, Y, X + 1), r(S, K, Y + 1, X)
    mfx, mfy = r(S, K, Y, X + 1), r(S, K, Y + 1, X)
    area = jnp.abs(r(S, Y, X)) + 1e8

    fn = jax.jit(
        lambda qt, crx, cry, xfx, yfx, area, mfx, mfy:
        fvtp2d_tracer_pallas(qt, qt, crx, cry, xfx, yfx, area, mfx, mfy, hord)
    )
    t, top = _trace_pallas_seconds(
        fn, [qt, crx, cry, xfx, yfx, area, mfx, mfy]
    )
    run_t = max(
        (v for k, v in top.items() if "_run_tracer" in k), default=t
    )
    print(f"{VARIANT}: kernel {run_t*1e3:.1f} ms", flush=True)
    ppm._flux_1d = orig


if __name__ == "__main__":
    main()
