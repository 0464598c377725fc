"""Fused Pallas TPU kernel for the D->A->C wind staggering transforms.

The XLA formulation (:func:`pace_tpu.ops.d2a2c.d2a2c_vect`, the analog of
``pyFV3.stencils.d2a2c_vect`` per SURVEY.md §2.3) materializes the Cartesian
3-vector wind and its two interface interpolants as field-sized HBM
intermediates (3x the scalar field volume each), plus the least-squares
edge-band solve — ~15 field-sized HBM round trips per acoustic substep. This
kernel stages one K-block of the two D-grid winds plus the static grid basis
fields in VMEM and produces all six outputs (ua, va, uc, vc, ut, vt) in one
pass.

Same layout trick as :mod:`fvtp2d_pallas`: interface-sized arrays are
cell-aligned in-kernel (interface i at cell slot i); shifts are wrap-around
rolls whose contamination stays in the outermost two halo rings, which the
consumed region never reads (the XLA path's edge-mode pads are equally
unspecified there). The math mirrors d2a2c.py line for line.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fvtp2d_pallas import _COMPILER_PARAMS, _mk_shift

A1 = 9.0 / 16.0
A2 = -1.0 / 16.0


def _kernel(
    u_r,
    v_r,
    rsin2_r,
    cosa_s_r,
    band_r,
    cosa_u_r,
    rsin_u2_r,
    cosa_v_r,
    rsin_v2_r,
    ec1_r,
    ec2_r,
    ew1_r,
    ew2_r,
    es1_r,
    es2_r,
    minv_r,
    ua_r,
    va_r,
    uc_r,
    vc_r,
    ut_r,
    vt_r,
    *,
    interpret,
):
    sx, sy = _mk_shift(interpret)
    Y = ua_r.shape[-2]
    X = ua_r.shape[-1]

    # cell-aligned loads: interface i at slot i
    u = u_r[..., :Y, :]  # (1, bk, Y, X) covariant D-grid x-wind at y-ifaces
    v = v_r[..., :, :X]
    rsin2 = rsin2_r[...][:, None]  # (1, 1, Y, X): broadcast over the k block
    cosa_s = cosa_s_r[...][:, None]
    band = band_r[...][:, None] > 0.5
    ec1 = [ec1_r[..., c, :, :][:, None] for c in range(3)]
    ec2 = [ec2_r[..., c, :, :][:, None] for c in range(3)]
    ew1 = [ew1_r[..., c, :, :X][:, None] for c in range(3)]
    ew2 = [ew2_r[..., c, :, :X][:, None] for c in range(3)]
    es1 = [es1_r[..., c, :Y, :][:, None] for c in range(3)]
    es2 = [es2_r[..., c, :Y, :][:, None] for c in range(3)]

    # --- 4th-order D winds to centers (u_to_centers / v_to_centers)
    utmp = A1 * (u + sy(u, 1)) + A2 * (sy(u, -1) + sy(u, 2))
    vtmp = A1 * (v + sx(v, 1)) + A2 * (sx(v, -1) + sx(v, 2))
    ua4 = (utmp - vtmp * cosa_s) * rsin2
    va4 = (vtmp - utmp * cosa_s) * rsin2
    v4 = [ua4 * ec1[c] + va4 * ec2[c] for c in range(3)]

    # --- edge-band least-squares reconstruction (cartesian_wind_centers)
    b = []
    for c in range(3):
        t = u * es1[c]
        s_ = v * ew2[c]
        b.append(t + sy(t, 1) + s_ + sx(s_, 1))
    v2 = []
    for i in range(3):
        acc = None
        for j in range(3):
            col = minv_r[..., i, j, :, :][:, None]
            term = col * b[j]
            acc = term if acc is None else acc + term
        v2.append(acc)

    vcart = [jnp.where(band, v2[c], v4[c]) for c in range(3)]

    # --- A-grid contravariant winds (d2a2c_vect)
    u_cov = sum(vcart[c] * ec1[c] for c in range(3))
    v_cov = sum(vcart[c] * ec2[c] for c in range(3))
    ua = (u_cov - v_cov * cosa_s) * rsin2
    va = (v_cov - u_cov * cosa_s) * rsin2

    # --- centers -> interfaces on the Cartesian vector, project on C bases
    uc = None
    vc = None
    for c in range(3):
        q = vcart[c]
        qx = A1 * (sx(q, -1) + q) + A2 * (sx(q, -2) + sx(q, 1))
        qy = A1 * (sy(q, -1) + q) + A2 * (sy(q, -2) + sy(q, 1))
        tx = qx * ew1[c]
        ty = qy * es2[c]
        uc = tx if uc is None else uc + tx
        vc = ty if vc is None else vc + ty

    # --- contravariant C winds (fxadv.contravariant_c_winds)
    cosa_u = cosa_u_r[..., :, :X][:, None]
    rsin_u2 = rsin_u2_r[..., :, :X][:, None]
    cosa_v = cosa_v_r[..., :Y, :][:, None]
    rsin_v2 = rsin_v2_r[..., :Y, :][:, None]
    vc_cell = vc + sy(vc, 1)
    vc4 = 0.25 * (sx(vc_cell, -1) + vc_cell)
    ut = (uc - cosa_u * vc4) * rsin_u2
    uc_cell = uc + sx(uc, 1)
    uc4 = 0.25 * (sy(uc_cell, -1) + uc_cell)
    vt = (vc - cosa_v * uc4) * rsin_v2

    ua_r[...] = ua
    va_r[...] = va
    for ref, val, ax in ((uc_r, uc, "x"), (vc_r, vc, "y"), (ut_r, ut, "x"), (vt_r, vt, "y")):
        if ax == "x":
            ref[..., :, :X] = val
            ref[..., :, X:] = jnp.zeros_like(ref[..., :, X:])
        else:
            ref[..., :Y, :] = val
            ref[..., Y:, :] = jnp.zeros_like(ref[..., Y:, :])


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def _run(u, v, grid_fields, block_k, interpret):
    S, K, Yp1, X = u.shape
    Y = Yp1 - 1
    nb = pl.cdiv(K, block_k)

    def kspec(a):
        return pl.BlockSpec(
            (1, block_k) + a.shape[-2:], lambda s, kb: (s, kb, 0, 0)
        )

    def gspec(a):
        # grid arrays: no k axis; (S, [3[,3],] Y', X') blocked per shard only
        blk = (1,) + a.shape[1:]
        nl = a.ndim - 1
        return pl.BlockSpec(blk, lambda s, kb, _n=nl: (s,) + (0,) * _n)

    in_specs = [kspec(u), kspec(v)] + [gspec(g) for g in grid_fields]
    out_specs = (
        pl.BlockSpec((1, block_k, Y, X), lambda s, kb: (s, kb, 0, 0)),
        pl.BlockSpec((1, block_k, Y, X), lambda s, kb: (s, kb, 0, 0)),
        pl.BlockSpec((1, block_k, Y, X + 1), lambda s, kb: (s, kb, 0, 0)),
        pl.BlockSpec((1, block_k, Y + 1, X), lambda s, kb: (s, kb, 0, 0)),
        pl.BlockSpec((1, block_k, Y, X + 1), lambda s, kb: (s, kb, 0, 0)),
        pl.BlockSpec((1, block_k, Y + 1, X), lambda s, kb: (s, kb, 0, 0)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((S, K, Y, X), u.dtype),
        jax.ShapeDtypeStruct((S, K, Y, X), u.dtype),
        jax.ShapeDtypeStruct((S, K, Y, X + 1), u.dtype),
        jax.ShapeDtypeStruct((S, K, Y + 1, X), u.dtype),
        jax.ShapeDtypeStruct((S, K, Y, X + 1), u.dtype),
        jax.ShapeDtypeStruct((S, K, Y + 1, X), u.dtype),
    )
    from ._dispatch import pallas_cost

    return pl.pallas_call(
        functools.partial(_kernel, interpret=interpret),
        grid=(S, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **(
            {"compiler_params": _COMPILER_PARAMS,
             **pallas_cost((u, v) + tuple(grid_fields), out_shape,
                           flops_per_point=40)}
            if _COMPILER_PARAMS is not None and not interpret
            else {}
        ),
    )(u, v, *grid_fields)


def d2a2c_vect_pallas(u, v, grid, block_k: int = 8, interpret: bool = False):
    """Same contract as :func:`d2a2c.d2a2c_vect` for 4-D (S, K, Y+1/Y, X/X+1)
    winds; returns (ua, va, uc, vc, ut, vt) with the never-consumed outermost
    interface row/col zeroed."""
    grid_fields = (
        grid.rsin2,
        grid.cosa_s,
        grid.band_c,
        grid.cosa_u,
        grid.rsin_u2,
        grid.cosa_v,
        grid.rsin_v2,
        grid.ec1,
        grid.ec2,
        grid.ew1,
        grid.ew2,
        grid.es1,
        grid.es2,
        grid.minv,
    )
    # adapt the k-block to the plane size: the kernel's VMEM working set
    # (windows x2 buffering + the staging compute's register spills) scales
    # with bk x padded plane; bk=8 fits C192 (200x256 padded planes) but
    # blew VMEM by 95 MB at C384 (392x512 — compile-time OOM with 77 MB of
    # register-allocator spill slots). Budget chosen so C192 keeps bk=8.
    from ._dispatch import fit_block_k, run_kernel_sharded

    bk = min(
        fit_block_k(u.shape[-2], u.shape[-1], u.dtype.itemsize,
                    default=block_k),
        u.shape[1],
    )
    return run_kernel_sharded(
        lambda uu, vv, gf: _run(uu, vv, gf, bk, interpret),
        (u, v, grid_fields),
    )
