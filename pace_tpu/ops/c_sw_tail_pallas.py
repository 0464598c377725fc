"""Fused Pallas TPU kernel for the C-grid half-step chain.

Everything in c_sw after d2a2c + the halo exchanges — contravariant wind
conversion, upwind area fluxes, provisional delp/pt transport, corner
kinetic energy/vorticity momentum update, and the corner divergence with
its tile-edge one-sided branch — is ~80 plane-sized XLA ops (measured
~170 GB/step of C_SW fusion traffic at C192 running at 240 GB/s). This
kernel reads the 14 wind/scalar fields once per k-block, runs the chain
in VMEM, and writes the 9 results.

Numerics are op-for-op identical to :func:`pace_tpu.ops.c_sw.c_sw_tail_jnp`
(asserted to 1e-12 by tests/main/test_csw_tail_pallas.py). Cube-corner
point fixes use the static corner-point path with per-shard ownership
flags (see pgrad_pallas). One deliberate shortcut: dedup_corner_divergence
is skipped in-kernel — in this composite its corner-point writes are
always overwritten by the 3-quadrant cell-divergence average at the same
(table, own) points, so the result is identical.

Reference analog: pyFV3 stencils c_sw.py (circulation_cgrid,
divergence_corner, ke_c_sw; SURVEY.md §2.3), fused TPU-first.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .corners import _FOLDED, _QUADRANTS
from .stencil_utils import (
    x_cell_to_left_iface,
    x_cell_to_right_iface,
    x_iface_diff,
    y_cell_to_left_iface,
    y_cell_to_right_iface,
    y_iface_diff,
)

_FIELDS = ("u", "v", "delp", "pt", "uc", "vc", "uc_x", "vc_x", "uc_y",
           "vc_y", "ua", "va", "va_x", "ua_y")
_CONSTS = ("cosa_u", "rsin_u2", "cosa_v", "rsin_v2", "dx", "dy",
           "sin_sg_e", "sin_sg_w", "sin_sg_n", "sin_sg_s", "rarea",
           "dxc", "dyc", "rarea_c", "fC", "sina_u", "sina_v", "rdxc",
           "rdyc", "uedge_w", "vedge_w", "edge_y", "edge_x")


def _tail_math(f, c, own, *, dt2, corner_pos):
    """The c_sw tail on (bk, Y(+1), X(+1)) slabs. ``f``: dict of field
    slabs; ``c``: dict of 2-D const planes (broadcast over k)."""
    # --- contravariant winds (fxadv.contravariant_ut/vt)
    vc_cell = f["vc_x"][..., :-1, :] + f["vc_x"][..., 1:, :]
    vc4 = 0.25 * (
        x_cell_to_left_iface(vc_cell) + x_cell_to_right_iface(vc_cell)
    )
    ut = (f["uc_x"] - c["cosa_u"] * vc4) * c["rsin_u2"]
    uc_cell = f["uc_y"][..., :-1] + f["uc_y"][..., 1:]
    uc4 = 0.25 * (
        y_cell_to_left_iface(uc_cell) + y_cell_to_right_iface(uc_cell)
    )
    vt = (f["vc_y"] - c["cosa_v"] * uc4) * c["rsin_v2"]

    # --- upwind area fluxes (c_grid_area_fluxes)
    xfx = (
        dt2 * ut * c["dy"]
        * jnp.where(
            ut > 0.0,
            x_cell_to_left_iface(c["sin_sg_e"]),
            x_cell_to_right_iface(c["sin_sg_w"]),
        )
    )
    yfx = (
        dt2 * vt * c["dx"]
        * jnp.where(
            vt > 0.0,
            y_cell_to_left_iface(c["sin_sg_n"]),
            y_cell_to_right_iface(c["sin_sg_s"]),
        )
    )

    # --- provisional delp/pt: first-order upwind transport over dt2
    delp, pt = f["delp"], f["pt"]
    dp_x = jnp.where(
        xfx > 0.0, x_cell_to_left_iface(delp), x_cell_to_right_iface(delp)
    )
    pt_x = jnp.where(
        xfx > 0.0, x_cell_to_left_iface(pt), x_cell_to_right_iface(pt)
    )
    dp_y = jnp.where(
        yfx > 0.0, y_cell_to_left_iface(delp), y_cell_to_right_iface(delp)
    )
    pt_y = jnp.where(
        yfx > 0.0, y_cell_to_left_iface(pt), y_cell_to_right_iface(pt)
    )
    fx1 = dp_x * xfx
    fy1 = dp_y * yfx
    rarea = c["rarea"]
    delpc = delp + (x_iface_diff(fx1) + y_iface_diff(fy1)) * rarea
    ptc = (
        pt * delp
        + (x_iface_diff(pt_x * fx1) + y_iface_diff(pt_y * fy1)) * rarea
    ) / delpc

    # --- kinetic energy at centers
    uc, vc = f["uc"], f["vc"]
    uc_up = jnp.where(f["ua"] > 0.0, uc[..., :-1], uc[..., 1:])
    vc_up = jnp.where(f["va"] > 0.0, vc[..., :-1, :], vc[..., 1:, :])
    ke = 0.5 * (f["ua"] * uc_up + f["va"] * vc_up)

    # --- absolute vorticity at corners (corner_vorticity, absolute=True)
    ucdx = uc * c["dxc"]
    vcdy = vc * c["dyc"]
    circ = (
        y_cell_to_left_iface(ucdx)
        - y_cell_to_right_iface(ucdx)
        + x_cell_to_right_iface(vcdy)
        - x_cell_to_left_iface(vcdy)
    )
    vort = circ * c["rarea_c"] + c["fC"]

    # --- momentum update
    vt_cell = vt[..., :-1, :] + vt[..., 1:, :]
    vt4 = 0.25 * (
        x_cell_to_left_iface(vt_cell) + x_cell_to_right_iface(vt_cell)
    )
    v_n = vt4 * c["sina_u"]
    zeta_u = jnp.where(v_n > 0.0, vort[..., :-1, :], vort[..., 1:, :])
    ke_gx = (
        x_cell_to_left_iface(ke) - x_cell_to_right_iface(ke)
    ) * c["rdxc"]
    uc_new = uc + dt2 * (zeta_u * v_n + ke_gx)

    ut_cell = ut[..., :-1] + ut[..., 1:]
    ut4 = 0.25 * (
        y_cell_to_left_iface(ut_cell) + y_cell_to_right_iface(ut_cell)
    )
    u_n = ut4 * c["sina_v"]
    zeta_v = jnp.where(u_n > 0.0, vort[..., :-1], vort[..., 1:])
    ke_gy = (
        y_cell_to_left_iface(ke) - y_cell_to_right_iface(ke)
    ) * c["rdyc"]
    vc_new = vc + dt2 * (-zeta_v * u_n + ke_gy)

    # --- corner divergence (divergence_corner + 3-quadrant corner average)
    u_, v_ = f["u"], f["v"]
    va_c = 0.5 * (
        y_cell_to_left_iface(f["va_x"]) + y_cell_to_right_iface(f["va_x"])
    )
    uf = (u_ - va_c * c["cosa_v"]) * c["sina_v"] * c["dyc"]
    uf = jnp.where(c["edge_y"] > 0.0, u_ * c["uedge_w"], uf)
    ua_c = 0.5 * (
        x_cell_to_left_iface(f["ua_y"]) + x_cell_to_right_iface(f["ua_y"])
    )
    vf = (v_ - ua_c * c["cosa_u"]) * c["sina_u"] * c["dxc"]
    vf = jnp.where(c["edge_x"] > 0.0, v_ * c["vedge_w"], vf)
    out = (
        x_cell_to_right_iface(uf) - x_cell_to_left_iface(uf)
    ) + (y_cell_to_right_iface(vf) - y_cell_to_left_iface(vf))
    # dedup_corner_divergence skipped: its corner-point writes are always
    # overwritten by the 3-quadrant average below (same table, same own)
    divg = out * c["rarea_c"]

    cell_div = -(x_iface_diff(xfx) + y_iface_diff(yfx)) * rarea / dt2
    Y, X = cell_div.shape[-2:]

    def cell(jj, ii, a, b):
        if jj >= Y or ii >= X:
            return jnp.zeros_like(cell_div[..., :1, :1])
        return cell_div[
            ..., (jj + a) % Y : (jj + a) % Y + 1,
            (ii + b) % X : (ii + b) % X + 1,
        ]

    # corner fixes become PATCHES the kernel stores pointwise into the
    # divg output ref after the plane store: the value-level where-form
    # needs a (bk,1,1)->(bk,Y,X) broadcast that Mosaic cannot lower
    # ("Broadcast in both sublanes and lanes"). own[idx] is a 0/1 scalar,
    # so the arithmetic mix equals the masked select.
    patches = []
    for idx, (kind, jj, ii) in enumerate(corner_pos):
        folded = _FOLDED[kind]
        acc = None
        for (a, b) in _QUADRANTS:
            if (a, b) == folded:
                continue
            val = cell(jj, ii, a, b)
            acc = val if acc is None else acc + val
        d = divg[..., jj : jj + 1, ii : ii + 1]
        patches.append(
            (jj, ii, own[idx] * (acc / 3.0) + (1.0 - own[idx]) * d)
        )

    return (delpc, ptc, uc_new, vc_new, ut, vt, xfx, yfx, divg), patches


def _kernel(*refs, dt2, corner_pos, n_corners):
    nf, nc = len(_FIELDS), len(_CONSTS)
    f = {name: r[0] for name, r in zip(_FIELDS, refs[:nf])}
    c = {name: r[0] for name, r in zip(_CONSTS, refs[nf : nf + nc])}
    own_r = refs[nf + nc]
    outs = refs[nf + nc + 1 :]
    own = tuple(own_r[0, 0, j] for j in range(n_corners))
    res, patches = _tail_math(f, c, own, dt2=dt2, corner_pos=corner_pos)
    for o_ref, val in zip(outs, res):
        o_ref[0] = val
    divg_ref = outs[-1]  # divg is the last output
    for jj, ii, neww in patches:
        divg_ref[0, :, jj : jj + 1, ii : ii + 1] = neww


@functools.partial(
    jax.jit, static_argnames=("dt2", "corner_pos", "bk", "interpret")
)
def _run(fields, consts, own, dt2, corner_pos, bk, interpret=False):
    from jax.experimental.pallas import tpu as pltpu

    u = fields[0]
    S, K = u.shape[:2]
    nk = pl.cdiv(K, bk)

    def fld(a):
        return pl.BlockSpec(
            (1, bk) + a.shape[-2:], lambda s, kb: (s, kb, 0, 0)
        )

    def cst(a):
        zeros = (0,) * (a.ndim - 1)
        return pl.BlockSpec(
            (1,) + a.shape[1:], lambda s, kb, _z=zeros: (s,) + _z
        )

    in_specs = (
        [fld(a) for a in fields] + [cst(a) for a in consts] + [cst(own)]
    )
    # outputs: delpc, ptc (cell), uc_new/ut/xfx (Y, X+1), vc_new/vt/yfx
    # (Y+1, X), divg (Y+1, X+1)
    Y1, X = fields[0].shape[-2:]  # u is (Y+1, X)
    Y = Y1 - 1
    shapes = [
        (Y, X), (Y, X), (Y, X + 1), (Y + 1, X), (Y, X + 1), (Y + 1, X),
        (Y, X + 1), (Y + 1, X), (Y + 1, X + 1),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((S, K) + sh, u.dtype) for sh in shapes
    ]
    out_specs = [
        pl.BlockSpec((1, bk) + sh, lambda s, kb: (s, kb, 0, 0))
        for sh in shapes
    ]
    kern = functools.partial(
        _kernel, dt2=dt2, corner_pos=corner_pos, n_corners=len(corner_pos)
    )
    from ._dispatch import pallas_cost

    return pl.pallas_call(
        kern,
        grid=(S, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        **({} if interpret else pallas_cost(
            list(fields) + list(consts), out_shape, flops_per_point=50
        )),
    )(*fields, *consts, own)


def c_sw_tail_pallas(u, v, delp, pt, uc, vc, uc_x, vc_x, uc_y, vc_y,
                     ua, va, va_x, ua_y, grid, dt2: float,
                     interpret: bool = False):
    """Drop-in for :func:`pace_tpu.ops.c_sw.c_sw_tail_jnp` on TPU f32."""
    import numpy as np

    S = u.shape[0]
    table = tuple(grid.corner_table)
    corner_pos = tuple((kind, jj, ii) for kind, jj, ii, _own in table)
    own = jnp.asarray(
        np.array(
            [[1.0 if e[3][s] else 0.0 for e in table] for s in range(S)],
            dtype=np.float32,
        ).reshape(S, max(1, len(table))) if table else
        np.zeros((S, 1), dtype=np.float32),
        dtype=u.dtype,
    )[:, None, :]
    sin_u_edge = 0.5 * (
        y_cell_to_left_iface(grid.sin_sg_n)
        + y_cell_to_right_iface(grid.sin_sg_s)
    )
    edge_y = jnp.clip(grid.edge_s_iface + grid.edge_n_iface, 0.0, 1.0)
    sin_v_edge = 0.5 * (
        x_cell_to_left_iface(grid.sin_sg_e)
        + x_cell_to_right_iface(grid.sin_sg_w)
    )
    edge_x = jnp.clip(grid.edge_w_iface + grid.edge_e_iface, 0.0, 1.0)
    cvals = dict(
        cosa_u=grid.cosa_u, rsin_u2=grid.rsin_u2, cosa_v=grid.cosa_v,
        rsin_v2=grid.rsin_v2, dx=grid.dx, dy=grid.dy,
        sin_sg_e=grid.sin_sg_e, sin_sg_w=grid.sin_sg_w,
        sin_sg_n=grid.sin_sg_n, sin_sg_s=grid.sin_sg_s, rarea=grid.rarea,
        dxc=grid.dxc, dyc=grid.dyc, rarea_c=grid.rarea_c, fC=grid.fC,
        sina_u=grid.sina_u, sina_v=grid.sina_v, rdxc=grid.rdxc,
        rdyc=grid.rdyc, uedge_w=sin_u_edge * grid.dyc,
        vedge_w=sin_v_edge * grid.dxc, edge_y=edge_y, edge_x=edge_x,
    )
    consts = tuple(cvals[n] for n in _CONSTS)
    fields = (u, v, delp, pt, uc, vc, uc_x, vc_x, uc_y, vc_y,
              ua, va, va_x, ua_y)
    # ~46 bk-scaled I/O buffers double-buffered: tighter VMEM than the
    # standard stencil kernels — budget accordingly
    Yp, Xp = delp.shape[-2:]
    padded = ((Yp + 7) // 8 * 8) * ((Xp + 127) // 128 * 128) * 4
    bk = max(1, min(8, 53 * 1024 * 1024 // (56 * padded)))
    bk = min(bk, delp.shape[1])
    from ._dispatch import run_kernel_sharded

    return run_kernel_sharded(
        lambda f, c, o: _run(f, c, o, float(dt2), corner_pos, bk,
                             interpret=interpret),
        (fields, consts, own),
    )
