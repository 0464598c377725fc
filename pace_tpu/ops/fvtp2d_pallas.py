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


def _pad_plane(a, Y2, X2, v=0.0):
    """Pad the trailing (Y, X) dims up to (Y2, X2) with constant ``v``."""
    py = Y2 - a.shape[-2]
    px = X2 - a.shape[-1]
    if py <= 0 and px <= 0:
        return a
    cfg = [(0, 0)] * (a.ndim - 2) + [(0, max(py, 0)), (0, max(px, 0))]
    return jnp.pad(a, cfg, constant_values=v)


def _fulltile(Y0, X0):
    """Smallest exact (8, 128)-tile plane covering (Y0, X0). Mosaic's
    ragged-last-lane-tile handling costs ~3.3x per point at X=198 vs the
    full-tile 256 (measured, docs/performance.md round-5 table), so the
    transport kernels pad to full tiles, compute, and slice the valid
    interfaces back out. Pad values: fields/winds/fluxes 0, area 1 (a
    zero area would 0/0 the inner-advection update and the NaNs would
    roll within reach of consumed interfaces). Pad garbage lands only in
    the never-consumed outer interface ring — the same guarantee as the
    wrap-around roll convention."""
    return -(-Y0 // 8) * 8, -(-X0 // 128) * 128


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


def _fvtp2d_block(
    qx, qy, crx, cry, xfx, yfx, area, wx, wy, hord, interpret,
    ra_x=None, ra_y=None,
):
    """The whole 2-D transport on cell-aligned (.., Y, X) slabs; returns
    (fx, fy) cell-aligned (interface i at slot i). ``ra_x``/``ra_y`` are the
    field-independent inner-update denominators — precompute them once when
    transporting several fields with the same winds."""
    sx, sy = _mk_shift(interpret)
    fy1 = ppm._flux_1d(qy, cry, hord, sy)
    fx1 = ppm._flux_1d(qx, crx, hord, sx)

    # x-flux branch: inner y-advection of qy, then outer x-PPM
    gy = yfx * fy1
    if ra_y is None:
        ra_y = area + (yfx - sy(yfx, 1))
    q_i = (qy * area + (gy - sy(gy, 1))) / ra_y
    fx = 0.5 * (ppm._flux_1d(q_i, crx, hord, sx) + fx1) * wx

    # y-flux branch: inner x-advection of qx, then outer y-PPM
    gx = xfx * fx1
    if ra_x is None:
        ra_x = area + (xfx - sx(xfx, 1))
    q_j = (qx * area + (gx - sx(gx, 1))) / ra_x
    fy = 0.5 * (ppm._flux_1d(q_j, cry, hord, sy) + fy1) * wy
    return fx, fy


def _patch_qy(qx, p, scr_r, orig_yx=None):
    """Reconstruct the y-fold in VMEM: copy the x-fold block to scratch,
    overwrite the four corner ghost rects from the (…, 2h, 2h) pack value
    ``p`` (ops.folds layout [[SW, SE], [NW, NE]]), read back as a value.
    Static ref-slice writes — Mosaic has no DUS/scatter lowering for
    values. ``orig_yx``: the logical plane size when ``qx`` is a padded
    full-tile block (corners sit at the logical edges)."""
    h = p.shape[-1] // 2
    Y, X = orig_yx if orig_yx is not None else qx.shape[-2:]
    scr_r[...] = qx
    # explicit end bounds: the scratch block may be tile-padded beyond
    # (Y, X), so open-ended slices would over-span the write
    scr_r[..., :h, :h] = p[..., :h, :h]
    scr_r[..., :h, X - h : X] = p[..., :h, h:]
    scr_r[..., Y - h : Y, :h] = p[..., h:, :h]
    scr_r[..., Y - h : Y, X - h : X] = p[..., h:, h:]
    return scr_r[...]


def _kernel(*refs, hord, use_mf, qy_patch, orig_yx, interpret):
    if qy_patch:
        refs, scr_r = refs[:-1], refs[-1]
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
    qy = (
        _patch_qy(qx, qy_r[...], scr_r, orig_yx=orig_yx)
        if qy_patch
        else qy_r[...]
    )
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
    jax.jit,
    static_argnames=(
        "hord", "use_mf", "qy_patch", "orig_yx", "block_k", "interpret"
    ),
)
def _run(args, hord, use_mf, qy_patch, orig_yx, block_k, interpret):
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
        _kernel, hord=hord, use_mf=use_mf, qy_patch=qy_patch,
        orig_yx=orig_yx, interpret=interpret,
    )
    from ._dispatch import pallas_cost

    scratch = (
        [pltpu.VMEM((1, block_k, Y, X), qx.dtype)]
        if qy_patch and pltpu is not None
        else []
    )
    return pl.pallas_call(
        kernel,
        grid=(S, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **(
            {"compiler_params": _COMPILER_PARAMS,
             **pallas_cost(args, out_shape, flops_per_point=80)}
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
    4-D (S, K, Y, X) fields. ``qy`` may be a :class:`folds.CornerPatch`
    (the y-fold reconstructed in VMEM — no second full-size HBM array).
    Returns (fx, fy) at natural interface sizes; the outermost interface
    row/col (never consumed) is zero rather than the XLA path's garbage
    values."""
    from .folds import CornerPatch

    qy_patch = isinstance(qy, CornerPatch)
    if qy_patch:
        qy = qy.data
    use_mf = mfx is not None
    S, K, Y0, X0 = qx.shape
    Y2, X2 = _fulltile(Y0, X0)
    orig_yx = (Y0, X0)
    pad = (Y2, X2) != (Y0, X0)
    if pad:
        qx = _pad_plane(qx, Y2, X2)
        if not qy_patch:
            qy = _pad_plane(qy, Y2, X2)
        crx, cry = _pad_plane(crx, Y2, X2), _pad_plane(cry, Y2, X2)
        xfx, yfx = _pad_plane(xfx, Y2, X2), _pad_plane(yfx, Y2, X2)
        area = _pad_plane(area, Y2, X2, 1.0)
        if use_mf:
            mfx, mfy = _pad_plane(mfx, Y2, X2), _pad_plane(mfy, Y2, X2)
    args = [qx, qy, crx, cry, xfx, yfx, area]
    if use_mf:
        args += [mfx, mfy]
    from ._dispatch import fit_block_k, run_kernel_sharded

    bk = min(fit_block_k(qx.shape[-2], qx.shape[-1], default=block_k),
             qx.shape[1])
    fx, fy = run_kernel_sharded(
        lambda *a: _run(a, hord, use_mf, qy_patch, orig_yx, bk, interpret),
        args,
    )
    if pad:
        fx = fx[..., :Y0, : X0 + 1]
        fy = fy[..., : Y0 + 1, :X0]
    return fx, fy


# --- multi-field variant ----------------------------------------------------
#
# d_sw transports pt, vorticity and w with the SAME winds (crx/cry/xfx/yfx and
# optionally the same mass fluxes). Calling the single-field kernel three
# times re-reads the 5-7 shared operand fields from HBM each time and
# recomputes the field-independent inner-update denominators ra_x/ra_y. This
# variant stages the shared operands once and loops the PPM scheme over the
# fields inside VMEM: for 3 fields, ~13 HBM field reads instead of ~25.


def _kernel_multi(*refs, hords, use_mfs, patches, orig_yx, interpret):
    n = len(hords)
    if any(patches):
        refs, scr_r = refs[:-1], refs[-1]
    q_refs = refs[: 2 * n]
    crx_r, cry_r, xfx_r, yfx_r, area_r = refs[2 * n : 2 * n + 5]
    pos = 2 * n + 5
    if any(use_mfs):
        mfx_r, mfy_r = refs[pos : pos + 2]
        pos += 2
    else:
        mfx_r = mfy_r = None
    out_refs = refs[pos : pos + 2 * n]

    X = q_refs[0].shape[-1]
    Y = q_refs[0].shape[-2]
    crx = crx_r[..., :, :X]
    cry = cry_r[..., :Y, :]
    xfx = xfx_r[..., :, :X]
    yfx = yfx_r[..., :Y, :]
    area = area_r[...][:, None]
    wx_mf = mfx_r[..., :, :X] if mfx_r is not None else None
    wy_mf = mfy_r[..., :Y, :] if mfy_r is not None else None

    sx, sy = _mk_shift(interpret)
    ra_y = area + (yfx - sy(yfx, 1))
    ra_x = area + (xfx - sx(xfx, 1))

    for f in range(n):
        qx = q_refs[2 * f][...]
        qy = (
            _patch_qy(qx, q_refs[2 * f + 1][...], scr_r, orig_yx=orig_yx)
            if patches[f]
            else q_refs[2 * f + 1][...]
        )
        wx = wx_mf if use_mfs[f] else xfx
        wy = wy_mf if use_mfs[f] else yfx
        fx, fy = _fvtp2d_block(
            qx, qy, crx, cry, xfx, yfx, area, wx, wy, hords[f], interpret,
            ra_x=ra_x, ra_y=ra_y,
        )
        fx_r = out_refs[2 * f]
        fy_r = out_refs[2 * f + 1]
        fx_r[..., :, :X] = fx
        fx_r[..., :, X:] = jnp.zeros_like(fx_r[..., :, X:])
        fy_r[..., :Y, :] = fy
        fy_r[..., Y:, :] = jnp.zeros_like(fy_r[..., Y:, :])


@functools.partial(
    jax.jit,
    static_argnames=(
        "hords", "use_mfs", "patches", "orig_yx", "block_k", "interpret"
    ),
)
def _run_multi(args, hords, use_mfs, patches, orig_yx, block_k, interpret):
    n = len(hords)
    qx = args[0]
    S, K, Y, X = qx.shape
    nb = pl.cdiv(K, block_k)
    area_idx = 2 * n + 4  # position of the (S, Y, X) area array in args

    def spec(a):
        return pl.BlockSpec(
            (1, block_k) + a.shape[-2:], lambda s, kb: (s, kb, 0, 0)
        )

    in_specs = []
    for i, a in enumerate(args):
        if i == area_idx:
            in_specs.append(
                pl.BlockSpec((1,) + a.shape[-2:], lambda s, kb: (s, 0, 0))
            )
        else:
            in_specs.append(spec(a))
    out_specs = []
    out_shape = []
    for _ in range(n):
        out_specs.append(
            pl.BlockSpec((1, block_k, Y, X + 1), lambda s, kb: (s, kb, 0, 0))
        )
        out_specs.append(
            pl.BlockSpec((1, block_k, Y + 1, X), lambda s, kb: (s, kb, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((S, K, Y, X + 1), qx.dtype))
        out_shape.append(jax.ShapeDtypeStruct((S, K, Y + 1, X), qx.dtype))
    kernel = functools.partial(
        _kernel_multi, hords=hords, use_mfs=use_mfs, patches=patches,
        orig_yx=orig_yx, interpret=interpret,
    )
    scratch = (
        [pltpu.VMEM((1, block_k, Y, X), qx.dtype)]
        if any(patches) and pltpu is not None
        else []
    )
    return pl.pallas_call(
        kernel,
        grid=(S, nb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
        **(
            {"compiler_params": _COMPILER_PARAMS,
             **__import__("pace_tpu.ops._dispatch", fromlist=["pallas_cost"]
                          ).pallas_cost(args, out_shape, flops_per_point=80)}
            if _COMPILER_PARAMS is not None and not interpret
            else {}
        ),
    )(*args)


# --- tracer-batched variant -------------------------------------------------
#
# Tracer transport moves nq fields with IDENTICAL winds, mass fluxes and hord.
# Instead of separate refs per field (the d_sw multi variant, which allows
# mixed hords/weightings), the tracers ride a leading array axis and the
# kernel grid iterates (S, k-block, tracer) with the tracer axis INNERMOST:
# the shared operand blocks' indices don't depend on the tracer index, so the
# Pallas pipeline elides their DMA between consecutive tracer steps — the
# winds are fetched from HBM once per k-block, not once per tracer.


def _kernel_tracer(q_x_r, q_y_r, crx_r, cry_r, xfx_r, yfx_r, area_r,
                   mfx_r, mfy_r, fx_r, fy_r, *scr, hord, qy_patch,
                   orig_yx, interpret):
    X = q_x_r.shape[-1]
    Y = q_x_r.shape[-2]
    qx = q_x_r[:, 0]
    if qy_patch:
        # corner rects live at the ORIGINAL plane edges, not the padded
        # block edges (full-tile pad shim below)
        qy = _patch_qy(qx, q_y_r[:, 0], scr[0], orig_yx=orig_yx)
    else:
        qy = q_y_r[:, 0]
    crx = crx_r[..., :, :X]
    cry = cry_r[..., :Y, :]
    xfx = xfx_r[..., :, :X]
    yfx = yfx_r[..., :Y, :]
    area = area_r[...][:, None]
    wx = mfx_r[..., :, :X]
    wy = mfy_r[..., :Y, :]
    fx, fy = _fvtp2d_block(
        qx, qy, crx, cry, xfx, yfx, area, wx, wy, hord, interpret
    )
    fx_r[:, 0, :, :, :X] = fx
    fx_r[:, 0, :, :, X:] = jnp.zeros_like(fx_r[:, 0, :, :, X:])
    fy_r[:, 0, :, :Y, :] = fy
    fy_r[:, 0, :, Y:, :] = jnp.zeros_like(fy_r[:, 0, :, Y:, :])


@functools.partial(
    jax.jit,
    static_argnames=("hord", "qy_patch", "orig_yx", "block_k", "interpret"),
)
def _run_tracer(qx, qy, crx, cry, xfx, yfx, area, mfx, mfy,
                hord, qy_patch, orig_yx, block_k, interpret):
    S, NQ, K, Y, X = qx.shape
    nb = pl.cdiv(K, block_k)

    def q_spec(dy=0, dx=0):
        return pl.BlockSpec(
            (1, 1, block_k, Y + dy, X + dx),
            lambda s, kb, qi: (s, qi, kb, 0, 0),
        )

    def shared_spec(a):
        return pl.BlockSpec(
            (1, block_k) + a.shape[-2:], lambda s, kb, qi: (s, kb, 0, 0)
        )

    area_spec = pl.BlockSpec(
        (1,) + area.shape[-2:], lambda s, kb, qi: (s, 0, 0)
    )
    qy_spec = (
        pl.BlockSpec(
            (1, 1, block_k) + qy.shape[-2:],
            lambda s, kb, qi: (s, qi, kb, 0, 0),
        )
        if qy_patch
        else q_spec()
    )
    in_specs = [
        q_spec(), qy_spec,
        shared_spec(crx), shared_spec(cry),
        shared_spec(xfx), shared_spec(yfx),
        area_spec,
        shared_spec(mfx), shared_spec(mfy),
    ]
    out_specs = (q_spec(dx=1), q_spec(dy=1))
    out_shape = (
        jax.ShapeDtypeStruct((S, NQ, K, Y, X + 1), qx.dtype),
        jax.ShapeDtypeStruct((S, NQ, K, Y + 1, X), qx.dtype),
    )
    kernel = functools.partial(
        _kernel_tracer, hord=hord, qy_patch=qy_patch, orig_yx=orig_yx,
        interpret=interpret,
    )
    scratch = (
        [pltpu.VMEM((1, block_k, Y, X), qx.dtype)]
        if qy_patch and pltpu is not None
        else []
    )
    from ._dispatch import pallas_cost

    return pl.pallas_call(
        kernel,
        grid=(S, nb, NQ),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **(
            {"compiler_params": _COMPILER_PARAMS,
             **pallas_cost((qx, qy, crx, cry, xfx, yfx, area, mfx, mfy),
                           out_shape, flops_per_point=80)}
            if _COMPILER_PARAMS is not None and not interpret
            else {}
        ),
    )(qx, qy, crx, cry, xfx, yfx, area, mfx, mfy)


def fvtp2d_tracer_pallas(
    qx,
    qy,
    crx,
    cry,
    xfx,
    yfx,
    area,
    mfx,
    mfy,
    hord: int,
    block_k: int = 8,
    interpret: bool = False,
):
    """Mass-flux-weighted transport of a stacked tracer block.

    ``qx``/``qy``: ``(S, nq, K, Y, X)`` corner-fold variants of the tracers
    (``qy`` may be a :class:`folds.CornerPatch` of shape ``(S, nq, K, 2h,
    2h)`` — the y-fold is then reconstructed in VMEM); all other operands
    as in :func:`fvtp2d_pallas` (shared by every tracer). Returns
    ``(fx, fy)`` of shapes ``(S, nq, K, Y, X+1)`` / ``(S, nq, K, Y+1, X)``,
    each tracer identical to its single-field call.
    """
    from ._dispatch import fit_block_k
    from .folds import CornerPatch

    qy_patch = isinstance(qy, CornerPatch)
    if qy_patch:
        qy = qy.data

    # full-tile pad shim (see _fulltile)
    S, NQ, K, Y0, X0 = qx.shape
    Y2, X2 = _fulltile(Y0, X0)
    orig_yx = (Y0, X0)
    pad = (Y2, X2) != (Y0, X0)
    if pad:
        qx = _pad_plane(qx, Y2, X2)
        if not qy_patch:
            qy = _pad_plane(qy, Y2, X2)
        crx, cry = _pad_plane(crx, Y2, X2), _pad_plane(cry, Y2, X2)
        xfx, yfx = _pad_plane(xfx, Y2, X2), _pad_plane(yfx, Y2, X2)
        mfx, mfy = _pad_plane(mfx, Y2, X2), _pad_plane(mfy, Y2, X2)
        area = _pad_plane(area, Y2, X2, 1.0)

    bk = min(fit_block_k(qx.shape[-2], qx.shape[-1], default=block_k),
             qx.shape[2])
    from ._dispatch import run_kernel_sharded

    fx, fy = run_kernel_sharded(
        lambda *a: _run_tracer(*a, int(hord), qy_patch, orig_yx, bk,
                               interpret),
        (qx, qy, crx, cry, xfx, yfx, area, mfx, mfy),
    )
    if pad:
        fx = fx[..., :Y0, : X0 + 1]
        fy = fy[..., : Y0 + 1, :X0]
    return fx, fy


def fvtp2d_multi_pallas(
    fields,
    crx,
    cry,
    xfx,
    yfx,
    area,
    mfx: Optional[jnp.ndarray] = None,
    mfy: Optional[jnp.ndarray] = None,
    block_k: int = 8,
    interpret: bool = False,
):
    """Transport several fields with shared winds in ONE fused kernel.

    ``fields`` is a sequence of ``(qx, qy, hord, use_mf)`` tuples; ``qy``
    may be a :class:`folds.CornerPatch` (y-fold reconstructed in VMEM).
    Fields with ``use_mf=True`` weight their interface values by ``mfx``/
    ``mfy`` (the mass-flux path), others by ``xfx``/``yfx``. Returns a
    list of ``(fx, fy)`` pairs in field order, each identical (up to
    compile-order round-off on CPU) to the corresponding single-field call.
    """
    from .folds import CornerPatch

    hords = tuple(int(h) for (_, _, h, _) in fields)
    use_mfs = tuple(bool(m) for (_, _, _, m) in fields)
    patches = tuple(isinstance(qy, CornerPatch) for (_, qy, _, _) in fields)
    q0 = fields[0][0]
    for (qx, qy, _, _), is_p in zip(fields, patches):
        # output shapes and block specs are sized from fields[0]; a mismatch
        # would otherwise surface as an obscure Pallas layout error
        if qx.shape != q0.shape or (not is_p and qy.shape != q0.shape):
            raise ValueError(
                f"fvtp2d_multi_pallas: all fields must share shape "
                f"{q0.shape}, got {qx.shape}/{getattr(qy, 'shape', '?')}"
            )
        qy_dt = qy.data.dtype if is_p else qy.dtype
        if qx.dtype != q0.dtype or qy_dt != q0.dtype:
            raise ValueError(
                f"fvtp2d_multi_pallas: all fields must share dtype "
                f"{q0.dtype}, got {qx.dtype}/{qy_dt}"
            )
    S, K, Y0, X0 = q0.shape
    Y2, X2 = _fulltile(Y0, X0)
    orig_yx = (Y0, X0)
    pad = (Y2, X2) != (Y0, X0)
    args = []
    for (qx, qy, _, _), is_p in zip(fields, patches):
        qy_a = qy.data if is_p else qy
        if pad:
            qx = _pad_plane(qx, Y2, X2)
            if not is_p:
                qy_a = _pad_plane(qy_a, Y2, X2)
        args += [qx, qy_a]
    if pad:
        crx, cry = _pad_plane(crx, Y2, X2), _pad_plane(cry, Y2, X2)
        xfx, yfx = _pad_plane(xfx, Y2, X2), _pad_plane(yfx, Y2, X2)
        area = _pad_plane(area, Y2, X2, 1.0)
        if any(use_mfs):
            mfx = _pad_plane(mfx, Y2, X2)
            mfy = _pad_plane(mfy, Y2, X2)
    args += [crx, cry, xfx, yfx, area]
    if any(use_mfs):
        assert mfx is not None and mfy is not None
        args += [mfx, mfy]
    from ._dispatch import fit_block_k

    bk = min(fit_block_k(args[0].shape[-2], args[0].shape[-1],
                         default=block_k),
             args[0].shape[1])
    from ._dispatch import run_kernel_sharded

    flat = run_kernel_sharded(
        lambda *a: _run_multi(a, hords, use_mfs, patches, orig_yx, bk,
                              interpret),
        args,
    )
    if pad:
        flat = [
            (o[..., :Y0, : X0 + 1] if i % 2 == 0 else o[..., : Y0 + 1, :X0])
            for i, o in enumerate(flat)
        ]
    return [(flat[2 * f], flat[2 * f + 1]) for f in range(len(fields))]
