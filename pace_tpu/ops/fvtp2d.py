"""2-D finite-volume transport (Lin & Rood 1996 directionally-symmetric PPM).

TPU-native analog of ``pyFV3.stencils.fvtp2d.FiniteVolumeTransport`` (reference
role per SURVEY.md §2.3; on-disk usage reference driver/examples/notebooks/
functions.py:826-1005). Scheme:

    Fx = 1/2 [ X(q) + X(Y(q)) ] * xfx
    Fy = 1/2 [ Y(q) + Y(X(q)) ] * yfx

where X/Y are 1-D PPM interface-value operators and Y(q)/X(q) denote the
flux-form inner update divided by the updated area (``ra_y``/``ra_x``).

Corner handling: the caller passes two corner-filled versions of q — ``qx``
with corner ghosts along continued x index lines and ``qy`` along y (see
pace_tpu.parallel.halo fold semantics, the analog of the reference's
copy_corners x/y variants). The inner y-sweep feeding the x-flux uses ``qy``
and vice versa.
"""

from __future__ import annotations

import dataclasses

import jax

import jax.numpy as jnp

from . import ppm
from .stencil_utils import bcast_k, x_iface_diff, y_iface_diff


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Fluxes2D:
    fx: jnp.ndarray  # (S, [K,] Y, X+1) flux through x-interfaces (+x positive)
    fy: jnp.ndarray  # (S, [K,] Y+1, X)


def fvtp2d(
    qx,
    qy,
    crx,
    cry,
    xfx,
    yfx,
    area,
    hord: int,
    mfx=None,
    mfy=None,
) -> Fluxes2D:
    """Compute 2-D PPM fluxes of a cell-mean scalar.

    Parameters
    ----------
    qx, qy:
        the transported field with corner ghosts filled in x / y fold
        convention; identical away from tile corners. ``(S, [K,] Y, X)``.
    crx, cry:
        courant numbers at x/y interfaces (cell units).
    xfx, yfx:
        area fluxes [m^2] (or any per-face weights) at interfaces.
    area:
        cell areas ``(S, Y, X)``.
    hord:
        PPM variant (1, 5, 6, 7, 8).
    mfx, mfy:
        optional mass fluxes; when given the returned fluxes are interface
        values times ``mfx``/``mfy`` instead of ``xfx``/``yfx`` (the
        delp-weighted tracer-transport path).
    """
    from .folds import materialize_qy

    qy = materialize_qy(qx, qy)
    area_b = bcast_k(area, qx)

    # 1-D PPM interface values of the raw field (inner terms, also reused for
    # the cross-direction updates)
    fy1 = ppm.yppm_i(qy, cry, hord)  # (.., Y+1, X)
    fx1 = ppm.xppm_i(qx, crx, hord)  # (.., Y, X+1)

    # --- x-flux branch: inner y-advection of qy, then outer xppm
    ra_y = area_b + y_iface_diff(yfx)
    q_i = (qy * area_b + y_iface_diff(yfx * fy1)) / ra_y
    fx_outer = ppm.xppm_i(q_i, crx, hord)
    wx = xfx if mfx is None else mfx
    fx = 0.5 * (fx_outer + fx1) * wx

    # --- y-flux branch: inner x-advection of qx, then outer yppm
    ra_x = area_b + x_iface_diff(xfx)
    q_j = (qx * area_b + x_iface_diff(xfx * fx1)) / ra_x
    fy_outer = ppm.yppm_i(q_j, cry, hord)
    wy = yfx if mfy is None else mfy
    fy = 0.5 * (fy_outer + fy1) * wy

    return Fluxes2D(fx=fx, fy=fy)


def fvtp2d_best(
    qx,
    qy,
    crx,
    cry,
    xfx,
    yfx,
    area,
    hord: int,
    mfx=None,
    mfy=None,
) -> Fluxes2D:
    """As :func:`fvtp2d`, dispatched to the fused Pallas kernel on TPU.

    The Pallas path (fvtp2d_pallas) is bit-exact vs this module's XLA
    formulation on the consumed interior (verified at C192 for every hord,
    with and without mass fluxes) but keeps the whole Lin-Rood scheme in
    VMEM: ~7 HBM field reads + 2 writes instead of ~30 materialized
    intermediates. Only the never-consumed outermost interface row/col
    differs (zero vs unspecified).
    """
    from ._dispatch import use_pallas

    if use_pallas("fvtp2d") and qx.ndim == 4:
        from .fvtp2d_pallas import fvtp2d_pallas

        fx, fy = fvtp2d_pallas(
            qx, qy, crx, cry, xfx, yfx, area, hord, mfx=mfx, mfy=mfy
        )
        return Fluxes2D(fx=fx, fy=fy)
    return fvtp2d(qx, qy, crx, cry, xfx, yfx, area, hord, mfx=mfx, mfy=mfy)


def fvtp2d_multi_best(
    fields,
    crx,
    cry,
    xfx,
    yfx,
    area,
    mfx=None,
    mfy=None,
):
    """Transport several fields sharing the same winds/fluxes.

    ``fields``: sequence of ``(qx, qy, hord, use_mf)``. On TPU this runs ONE
    fused Pallas kernel that stages crx/cry/xfx/yfx/area (and mfx/mfy) in
    VMEM once for all fields — for d_sw's pt/vorticity/w triple that cuts the
    HBM operand traffic roughly in half vs three single-field calls.
    Returns a list of :class:`Fluxes2D` in field order.
    """
    from ._dispatch import use_pallas

    if use_pallas("fvtp2d") and fields[0][0].ndim == 4:
        from .fvtp2d_pallas import fvtp2d_multi_pallas

        outs = fvtp2d_multi_pallas(
            fields, crx, cry, xfx, yfx, area, mfx=mfx, mfy=mfy
        )
        return [Fluxes2D(fx=fx, fy=fy) for (fx, fy) in outs]
    return [
        fvtp2d(
            qx, qy, crx, cry, xfx, yfx, area, hord,
            mfx=mfx if use_mf else None,
            mfy=mfy if use_mf else None,
        )
        for (qx, qy, hord, use_mf) in fields
    ]


def flux_divergence(fx, fy, rarea):
    """Per-cell tendency sum of face fluxes: (in - out) * 1/area."""
    return (x_iface_diff(fx) + y_iface_diff(fy)) * bcast_k(rarea, fx[..., :-1])
