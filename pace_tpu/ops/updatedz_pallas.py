"""Pallas TPU kernels for the interface-height (UpdateDZ) chain.

Round-4 profiling at C192 showed the updatedz XLA chains moving ~367 GB of
the 2.3 TB step (UpdateDZ `mul` fusions 177 GB, to_iface concatenates
89 GB, heights cumsum reduce_windows 67 GB, plus the RiemannC gz rebuild)
— ~10x the minimal traffic of the operation. Three kernels close that:

- :func:`heights_from_delz_pallas` — the reverse column integral
  zh[k] = zs - sum_{m>=k} delz[m] as a (BY, BX)-blocked column kernel
  (XLA lowers the cumsum to reduce_window passes + a concat).
- :func:`updatedz_c_pallas` — the full first-order upwind C-grid height
  update (interface-averaged fluxes, upwind select, flux divergence,
  surface pin + ws) in one k-blocked full-plane pass.
- :func:`flux_height_update_pallas` — the updatedz_d tail
  (zh*area + flux divergence)/ra in one pass.

Numerics are formula- and order-identical to the jnp forms in
:mod:`pace_tpu.ops.nonhydro` (asserted by tests/main/test_updatedz_pallas
in interpret mode, and on hardware by tests/tpu). Reference analog:
pyFV3 updatedzc/updatedzd stencils (SURVEY.md §2.3).

Mosaic constraints honored (see docs/performance.md): dynamic k-indexing
through refs only; no (1,1)->(Y,X) value broadcasts; the layer->interface
averaging reads the previous k-block's last layer through a dedicated
single-plane operand (the pk_last pattern of pgrad_pallas) instead of an
overlapping block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from .stencil_utils import (
    x_cell_to_left_iface,
    x_cell_to_right_iface,
    x_iface_diff,
    y_cell_to_left_iface,
    y_cell_to_right_iface,
    y_iface_diff,
)


# ----------------------------------------------------------------------
# heights column kernel
# ----------------------------------------------------------------------
def _heights_kernel(delz_ref, phis_ref, out_ref, *, K):
    zs = phis_ref[0] / constants.GRAV
    out_ref[0, K] = zs

    def bwd(i, acc):
        k = K - 1 - i
        # same association as the XLA form zh_top = zs - cumsum: the
        # accumulated sum is built first, then subtracted from zs
        acc = acc + delz_ref[0, k]
        out_ref[0, k] = zs - acc
        return acc

    jax.lax.fori_loop(0, K, bwd, jnp.zeros_like(zs))


def heights_from_delz_pallas(delz, phis, interpret: bool = False):
    """Drop-in for nonhydro.heights_from_delz on TPU f32:
    delz (S, K, Y, X), phis (S, Y, X) -> zh (S, K+1, Y, X). Mesh-aware
    dispatch (see _dispatch.run_kernel_sharded)."""
    from ._dispatch import run_kernel_sharded

    return run_kernel_sharded(
        lambda d, p: _heights_jit(d, p, interpret), (delz, phis)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _heights_jit(delz, phis, interpret: bool = False):
    S, K, Y, X = delz.shape
    BY, BX = 32, 256
    while BY // 2 >= Y and BY > 8:
        BY //= 2
    while BX // 2 >= X and BX > 128:
        BX //= 2
    ny, nx = pl.cdiv(Y, BY), pl.cdiv(X, BX)
    from ._dispatch import pallas_cost

    out_sds = jax.ShapeDtypeStruct((S, K + 1, Y, X), delz.dtype)
    return pl.pallas_call(
        functools.partial(_heights_kernel, K=K),
        grid=(S, ny, nx),
        in_specs=[
            pl.BlockSpec((1, K, BY, BX), lambda s, i, j: (s, 0, i, j)),
            pl.BlockSpec((1, BY, BX), lambda s, i, j: (s, i, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, K + 1, BY, BX), lambda s, i, j: (s, 0, i, j)
        ),
        out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        **({} if interpret else pallas_cost(
            (delz, phis), (out_sds,), flops_per_point=2
        )),
    )(delz, phis)


# ----------------------------------------------------------------------
# updatedz_c upwind kernel (k-blocked full planes)
# ----------------------------------------------------------------------
def _iface_flux(l, j, cur_ref, prev_ref, K):
    """Interface-k average of a layer flux: 0.5*(layer[j-1] + layer[j])
    with one-sided top/bottom — via the in-block layers plus the previous
    block's last layer (prev_ref; index-map-clamped to layer 0 at the top,
    which makes the top one-sidedness automatic)."""
    cur = cur_ref[0, l]
    prev = jnp.where(
        l == 0, prev_ref[0, 0], cur_ref[0, jnp.maximum(l - 1, 0)]
    )
    # bottom interface j == K: layer K is out of range (block padding) —
    # its value is the last real layer, i.e. prev
    cur = jnp.where(j >= K, prev, cur)
    return 0.5 * (prev + cur)


def _updatedzc_kernel(zhx_ref, zhy_ref, xfx_ref, xfxp_ref, yfx_ref,
                      yfxp_ref, area_ref, out_ref, ws_ref, *,
                      K, bi, dt2):
    kb = pl.program_id(1)
    area = area_ref[0]

    def body(l, _):
        j = kb * bi + l
        xfx = _iface_flux(l, j, xfx_ref, xfxp_ref, K)
        yfx = _iface_flux(l, j, yfx_ref, yfxp_ref, K)
        zx_pl = zhx_ref[0, l]
        zy_pl = zhy_ref[0, l]
        zx = jnp.where(
            xfx > 0.0, x_cell_to_left_iface(zx_pl),
            x_cell_to_right_iface(zx_pl),
        )
        zy = jnp.where(
            yfx > 0.0, y_cell_to_left_iface(zy_pl),
            y_cell_to_right_iface(zy_pl),
        )
        ra = area + x_iface_diff(xfx) + y_iface_diff(yfx)
        zh_new = (
            zx_pl * area + x_iface_diff(zx * xfx) + y_iface_diff(zy * yfx)
        ) / ra
        # bottom interface: pinned back to the surface; its advected value
        # only feeds the terrain-following ws
        out_ref[0, l] = jnp.where(j >= K, zx_pl, zh_new)

        @pl.when(j == K)
        def _():
            ws_ref[0] = (zh_new - zx_pl) / dt2

        return 0

    jax.lax.fori_loop(0, bi, body, 0)


def updatedz_c_pallas(zh_x, zh_y, xfx_l, yfx_l, area, dt2: float,
                      interpret: bool = False):
    """Drop-in for nonhydro.updatedz_c on TPU f32 (same return pair).
    Mesh-aware dispatch (see _dispatch.run_kernel_sharded)."""
    from ._dispatch import run_kernel_sharded

    return run_kernel_sharded(
        lambda *a: _updatedz_c_jit(*a, dt2, interpret),
        (zh_x, zh_y, xfx_l, yfx_l, area),
    )


@functools.partial(jax.jit, static_argnames=("dt2", "interpret"))
def _updatedz_c_jit(zh_x, zh_y, xfx_l, yfx_l, area, dt2: float,
                    interpret: bool = False):
    S, K1, Y, X = zh_x.shape
    K = K1 - 1
    from ._dispatch import fit_block_k, pallas_cost

    bi = min(fit_block_k(Y, X), K1)
    nk = pl.cdiv(K1, bi)

    def iface_blk(a):
        return pl.BlockSpec(
            (1, bi) + a.shape[-2:], lambda s, kb: (s, kb, 0, 0)
        )

    def prev_blk(a):
        return pl.BlockSpec(
            (1, 1) + a.shape[-2:],
            lambda s, kb, _bi=bi: (
                s, jnp.clip(kb * _bi - 1, 0, K - 1), 0, 0
            ),
        )

    out_sds = (
        jax.ShapeDtypeStruct((S, K1, Y, X), zh_x.dtype),
        jax.ShapeDtypeStruct((S, Y, X), zh_x.dtype),
    )
    zh_new, ws = pl.pallas_call(
        functools.partial(_updatedzc_kernel, K=K, bi=bi, dt2=float(dt2)),
        grid=(S, nk),
        in_specs=[
            iface_blk(zh_x), iface_blk(zh_y),
            iface_blk(xfx_l), prev_blk(xfx_l),
            iface_blk(yfx_l), prev_blk(yfx_l),
            pl.BlockSpec((1,) + area.shape[-2:], lambda s, kb: (s, 0, 0)),
        ],
        out_specs=[
            iface_blk(zh_x),
            pl.BlockSpec(
                (1,) + zh_x.shape[-2:], lambda s, kb: (s, 0, 0)
            ),
        ],
        out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        **({} if interpret else pallas_cost(
            (zh_x, zh_y, xfx_l, yfx_l), out_sds, flops_per_point=12
        )),
    )(zh_x, zh_y, xfx_l, xfx_l, yfx_l, yfx_l, area)
    return zh_new, ws


# ----------------------------------------------------------------------
# updatedz_d flux-update tail (k-blocked full planes)
# ----------------------------------------------------------------------
def _flux_update_kernel(zh_ref, fx_ref, fy_ref, xfx_ref, yfx_ref,
                        area_ref, out_ref, *, bi):
    area = area_ref[0]

    def body(l, _):
        xfx = xfx_ref[0, l]
        yfx = yfx_ref[0, l]
        ra = area + x_iface_diff(xfx) + y_iface_diff(yfx)
        out_ref[0, l] = (
            zh_ref[0, l] * area
            + x_iface_diff(fx_ref[0, l])
            + y_iface_diff(fy_ref[0, l])
        ) / ra
        return 0

    jax.lax.fori_loop(0, bi, body, 0)


def flux_height_update_pallas(zh, fx, fy, xfx_i, yfx_i, area,
                              interpret: bool = False):
    """The updatedz_d tail: (zh*area + div(fx, fy)) / (area + div(xfx,
    yfx)) in one fused pass. All operands interface-registered in k.
    Mesh-aware dispatch (see _dispatch.run_kernel_sharded)."""
    from ._dispatch import run_kernel_sharded

    return run_kernel_sharded(
        lambda *a: _flux_height_jit(*a, interpret),
        (zh, fx, fy, xfx_i, yfx_i, area),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flux_height_jit(zh, fx, fy, xfx_i, yfx_i, area,
                     interpret: bool = False):
    S, K1, Y, X = zh.shape
    from ._dispatch import fit_block_k, pallas_cost

    bi = min(fit_block_k(Y, X), K1)
    nk = pl.cdiv(K1, bi)

    def blk(a):
        return pl.BlockSpec(
            (1, bi) + a.shape[-2:], lambda s, kb: (s, kb, 0, 0)
        )

    out_sds = jax.ShapeDtypeStruct(zh.shape, zh.dtype)
    return pl.pallas_call(
        functools.partial(_flux_update_kernel, bi=bi),
        grid=(S, nk),
        in_specs=[
            blk(zh), blk(fx), blk(fy), blk(xfx_i), blk(yfx_i),
            pl.BlockSpec((1,) + area.shape[-2:], lambda s, kb: (s, 0, 0)),
        ],
        out_specs=blk(zh),
        out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        **({} if interpret else pallas_cost(
            (zh, fx, fy, xfx_i, yfx_i), (out_sds,), flops_per_point=8
        )),
    )(zh, fx, fy, xfx_i, yfx_i, area)
