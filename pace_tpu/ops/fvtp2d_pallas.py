"""Fused Pallas TPU kernel for the 2-D PPM finite-volume transport.

The XLA formulation of :func:`pace_tpu.ops.fvtp2d.fvtp2d` materializes ~30
field-sized intermediates per call (PPM interface interpolants, limited
slopes, monotonicity selects, inner-update quotients, roll copies): at C192
npz=79 the chain moves several GB of HBM per call and the four d_sw calls
plus tracer transport dominate the acoustic budget. This kernel stages a
K-block of every operand in VMEM and runs the whole Lin & Rood (1996) scheme

    Fx = 1/2 [ X(q) + X(Y(q)) ] * wx
    Fy = 1/2 [ Y(q) + Y(X(q)) ] * wy

in one pass: ~7 field reads + 2 writes of HBM traffic total, everything else
in VMEM. The PPM math is the *same code* as :mod:`pace_tpu.ops.ppm`
(``_flux_1d`` parameterized over the shift function), so the scheme and its
limiters stay defined in exactly one place.

Layout trick: interface-sized arrays (X+1 / Y+1) keep their natural HBM
shapes, but in-kernel all arithmetic runs on uniform cell-sized (Y, X)
slabs — interface index i lives at cell slot i, and the one missing
interface (the outermost padded row/col, whose value the model never
consumes — see ppm.py docstring) is written as zero. Shifts are
``pltpu.roll`` (wrap-around values land only in the never-consumed outer
halo ring, mirroring the jnp.roll convention of stencil_utils).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import ppm

try:
    from jax.experimental.pallas import tpu as pltpu

    _COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
except Exception:  # pragma: no cover
    pltpu = None
    _COMPILER_PARAMS = None


def _mk_shift(interpret: bool):
    """(sx, sy) shift helpers: result[..., i] = a[..., i + n] (jnp.roll
    convention of stencil_utils.sx/sy)."""
    if interpret or pltpu is None:
        sx = lambda a, n: a if n == 0 else jnp.roll(a, -n, axis=-1)
        sy = lambda a, n: a if n == 0 else jnp.roll(a, -n, axis=-2)
    else:
        # pltpu.roll requires a non-negative shift; jnp.roll(a, -n, ax) ==
        # pltpu.roll(a, (size - n) % size, ax)
        sx = lambda a, n: a if n == 0 else pltpu.roll(
            a, (-n) % a.shape[-1], axis=a.ndim - 1
        )
        sy = lambda a, n: a if n == 0 else pltpu.roll(
            a, (-n) % a.shape[-2], axis=a.ndim - 2
        )
    return sx, sy


def _fvtp2d_block(qx, qy, crx, cry, xfx, yfx, area, wx, wy, hord, interpret):
    """The whole 2-D transport on cell-aligned (.., Y, X) slabs; returns
    (fx, fy) cell-aligned (interface i at slot i)."""
    sx, sy = _mk_shift(interpret)
    fy1 = ppm._flux_1d(qy, cry, hord, sy)
    fx1 = ppm._flux_1d(qx, crx, hord, sx)

    # x-flux branch: inner y-advection of qy, then outer x-PPM
    gy = yfx * fy1
    ra_y = area + (yfx - sy(yfx, 1))
    q_i = (qy * area + (gy - sy(gy, 1))) / ra_y
    fx = 0.5 * (ppm._flux_1d(q_i, crx, hord, sx) + fx1) * wx

    # y-flux branch: inner x-advection of qx, then outer y-PPM
    gx = xfx * fx1
    ra_x = area + (xfx - sx(xfx, 1))
    q_j = (qx * area + (gx - sx(gx, 1))) / ra_x
    fy = 0.5 * (ppm._flux_1d(q_j, cry, hord, sy) + fy1) * wy
    return fx, fy


def _kernel(*refs, hord, use_mf, interpret):
    if use_mf:
        (qx_r, qy_r, crx_r, cry_r, xfx_r, yfx_r, area_r, mfx_r, mfy_r,
         fx_r, fy_r) = refs
    else:
        (qx_r, qy_r, crx_r, cry_r, xfx_r, yfx_r, area_r,
         fx_r, fy_r) = refs
        mfx_r = mfy_r = None
    X = qx_r.shape[-1]
    Y = qx_r.shape[-2]
    qx = qx_r[...]
    qy = qy_r[...]
    crx = crx_r[..., :, :X]
    cry = cry_r[..., :Y, :]
    xfx = xfx_r[..., :, :X]
    yfx = yfx_r[..., :Y, :]
    area = area_r[...][:, None]  # (S, 1, Y, X) broadcasts over the k block
    wx = mfx_r[..., :, :X] if use_mf else xfx
    wy = mfy_r[..., :Y, :] if use_mf else yfx
    fx, fy = _fvtp2d_block(
        qx, qy, crx, cry, xfx, yfx, area, wx, wy, hord, interpret
    )
    fx_r[..., :, :X] = fx
    fx_r[..., :, X:] = jnp.zeros_like(fx_r[..., :, X:])
    fy_r[..., :Y, :] = fy
    fy_r[..., Y:, :] = jnp.zeros_like(fy_r[..., Y:, :])


@functools.partial(
    jax.jit, static_argnames=("hord", "use_mf", "block_k", "interpret")
)
def _run(args, hord, use_mf, block_k, interpret):
    qx = args[0]
    S, K, Y, X = qx.shape
    nb = pl.cdiv(K, block_k)

    # shards are independent (no cross-shard reads), so S rides the grid —
    # VMEM per program holds one shard's k-block, not all six
    def spec(a):
        return pl.BlockSpec(
            (1, block_k) + a.shape[-2:], lambda s, kb: (s, kb, 0, 0)
        )

    area_spec = pl.BlockSpec(
        (1,) + args[6].shape[-2:], lambda s, kb: (s, 0, 0)
    )
    in_specs = [spec(a) for a in args[:6]] + [area_spec] + [
        spec(a) for a in args[7:]
    ]
    out_specs = (
        pl.BlockSpec((1, block_k, Y, X + 1), lambda s, kb: (s, kb, 0, 0)),
        pl.BlockSpec((1, block_k, Y + 1, X), lambda s, kb: (s, kb, 0, 0)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((S, K, Y, X + 1), qx.dtype),
        jax.ShapeDtypeStruct((S, K, Y + 1, X), qx.dtype),
    )
    kernel = functools.partial(
        _kernel, hord=hord, use_mf=use_mf, interpret=interpret
    )
    return pl.pallas_call(
        kernel,
        grid=(S, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **(
            {"compiler_params": _COMPILER_PARAMS}
            if _COMPILER_PARAMS is not None and not interpret
            else {}
        ),
    )(*args)


def fvtp2d_pallas(
    qx,
    qy,
    crx,
    cry,
    xfx,
    yfx,
    area,
    hord: int,
    mfx: Optional[jnp.ndarray] = None,
    mfy: Optional[jnp.ndarray] = None,
    block_k: int = 8,
    interpret: bool = False,
):
    """Fused-transport fluxes; same contract as :func:`fvtp2d.fvtp2d` for
    4-D (S, K, Y, X) fields. Returns (fx, fy) at natural interface sizes;
    the outermost interface row/col (never consumed) is zero rather than the
    XLA path's garbage values."""
    use_mf = mfx is not None
    args = [qx, qy, crx, cry, xfx, yfx, area]
    if use_mf:
        args += [mfx, mfy]
    bk = min(block_k, qx.shape[1])
    return _run(tuple(args), hord, use_mf, bk, interpret)
