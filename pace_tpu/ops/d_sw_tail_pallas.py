"""Fused Pallas TPU kernel for the d_sw tail (KE + damping + momentum).

After the transport fluxes, the D-grid step's remaining chain — corner
kinetic energy, Smagorinsky + del-2^(nord+1) divergence-damping potential,
the circulation-form momentum update and the dissipation estimate — is
~130 plane-sized XLA ops streaming intermediates through HBM (measured
387 GB/step of D_SW fusion traffic at C192, the largest single line of
the round-3 profile). This kernel reads u/v/ut/vt/divg_d/vort and the
vorticity fluxes once per k-block, runs the whole chain in VMEM, and
writes only u_new/v_new/heat: ~10 field reads + 3 writes.

Numerics are op-for-op identical to :func:`pace_tpu.ops.d_sw.d_sw_tail_jnp`
(asserted to 1e-12 by tests/main/test_dsw_tail_pallas.py). The cube-corner
KE fix uses the static corner-point path (per-shard ownership delivered as
scalar flag operands), mirroring the pgrad kernel's treatment.

Reference analog: pyFV3 stencils d_sw.py kinetic-energy/vorticity section +
divergence_damping.py (SURVEY.md §2.3); here fused TPU-first instead of
stencil-by-stencil.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .corners import _FOLDED, _QUADRANTS
from .stencil_utils import (
    _pad,
    x_cell_to_left_iface,
    x_cell_to_right_iface,
    y_cell_to_left_iface,
    y_cell_to_right_iface,
)

_BK = 8


def _tail_math(u, v, ut, vt, divg, vort, vfx, vfy, dvfx, dvfy,
               dx, rdx, dy, rdy, rsin2, cosa_s, f0, wgx, wgy, rarea_c,
               band, d2_col, own, ke_s, *, dt, cfg, corner_pos, da_min_c):
    """The tail on (bk, Y(+1), X(+1)) slabs; identical arithmetic to
    d_sw_tail_jnp. ``cfg`` is the static DSWConfig; ``own`` per-corner
    scalar ownership flags; 2-D consts broadcast over the k axis."""
    # --- kinetic energy at corners (dt * KE)
    ub = 0.5 * (y_cell_to_left_iface(ut) + y_cell_to_right_iface(ut))
    vb = 0.5 * (x_cell_to_left_iface(vt) + x_cell_to_right_iface(vt))
    u_up = jnp.where(
        ub > 0.0, x_cell_to_left_iface(u), x_cell_to_right_iface(u)
    )
    v_up = jnp.where(
        vb > 0.0, y_cell_to_left_iface(v), y_cell_to_right_iface(v)
    )
    ke = 0.5 * (ub * u_up + vb * v_up)

    # cube-corner fix: mean cell energy of the 3 real quadrants, applied at
    # the static corner points only
    u_cov = 0.5 * (u[..., :-1, :] + u[..., 1:, :])
    v_cov = 0.5 * (v[..., :-1] + v[..., 1:])
    ua_c = (u_cov - v_cov * cosa_s) * rsin2
    va_c = (v_cov - u_cov * cosa_s) * rsin2
    e_cell = 0.5 * (ua_c * u_cov + va_c * v_cov)
    Y, X = e_cell.shape[-2:]

    def cell(jj, ii, a, b):
        if jj >= Y or ii >= X:
            return jnp.zeros_like(e_cell[..., :1, :1])
        return e_cell[
            ..., (jj + a) % Y : (jj + a) % Y + 1,
            (ii + b) % X : (ii + b) % X + 1,
        ]

    # corner patch through the SCRATCH ref with static (1,1)-point stores:
    # the value-level where-form needs a (bk,1,1)->(bk,Y,X) broadcast,
    # which Mosaic cannot lower ("Broadcast in both sublanes and lanes");
    # per-point masked stores of the (bk,1,1) slabs lower fine. own[idx]
    # is a 0/1 scalar, so the arithmetic mix equals the masked select.
    if corner_pos:
        ke_s[...] = ke
        for idx, (kind, jj, ii) in enumerate(corner_pos):
            folded = _FOLDED[kind]
            acc = None
            for (a, b) in _QUADRANTS:
                if (a, b) == folded:
                    continue
                val = cell(jj, ii, a, b)
                acc = val if acc is None else acc + val
            d = ke[..., jj : jj + 1, ii : ii + 1]
            ke_s[:, jj : jj + 1, ii : ii + 1] = (
                own[idx] * (acc / 3.0) + (1.0 - own[idx]) * d
            )
        ke = ke_s[...]
    dtke = dt * ke

    # --- divergence-damping potential chi at corners
    if cfg.dddmp > 0.0:
        zeta = vort - f0
        zeta_p = _pad(_pad(zeta, -2, 1, 1), -1, 1, 1)
        zeta_c = 0.25 * (
            zeta_p[..., :-1, :-1]
            + zeta_p[..., :-1, 1:]
            + zeta_p[..., 1:, :-1]
            + zeta_p[..., 1:, 1:]
        )
        smag = dt * jnp.sqrt(divg * divg + zeta_c * zeta_c)
        damp2 = jnp.maximum(d2_col, jnp.minimum(0.20, cfg.dddmp * smag))
    else:
        damp2 = jnp.broadcast_to(d2_col, divg.shape)
    chi = da_min_c * damp2 * divg
    if cfg.nord > 0:
        d2 = divg
        for _ in range(cfg.nord):
            gx = (d2[..., :, 1:] - d2[..., :, :-1]) * wgx
            gy = (d2[..., 1:, :] - d2[..., :-1, :]) * wgy
            lap = (
                x_cell_to_right_iface(gx)
                - x_cell_to_left_iface(gx)
                + y_cell_to_right_iface(gy)
                - y_cell_to_left_iface(gy)
            ) * rarea_c
            d2 = lap * da_min_c
        dampn = cfg.d4_bg ** (cfg.nord + 1) * da_min_c
        chin = dampn * d2 * ((-1.0) ** cfg.nord)
        if cfg.edge_damp_band:
            d2_edge = max(cfg.d4_bg / 3.0, cfg.d2_bg)
            chi_edge = da_min_c * d2_edge * divg
            chi = chi + (1.0 - band) * chin + band * chi_edge
        else:
            chi = chi + chin
    dtke = dtke - chi

    if dvfx is not None:
        vfx = vfx + dvfx
        vfy = vfy + dvfy

    # --- circulation-form momentum update
    u_new = (
        u * dx + (dtke[..., :-1] - dtke[..., 1:]) + vfy
    ) * rdx
    v_new = (
        v * dy + (dtke[..., :-1, :] - dtke[..., 1:, :]) - vfx
    ) * rdy

    heat = None
    if cfg.d_con > 0.0 or cfg.vtdm4 > 0.0:
        du_d = (chi[..., 1:] - chi[..., :-1]) * rdx
        dv_d = (chi[..., 1:, :] - chi[..., :-1, :]) * rdy
        if dvfy is not None:
            du_d = du_d + dvfy * rdx
            dv_d = dv_d - dvfx * rdy
        e_u = (u + 0.5 * du_d) * du_d
        e_v = (v + 0.5 * dv_d) * dv_d
        heat = -(
            0.5 * (e_u[..., :-1, :] + e_u[..., 1:, :])
            + 0.5 * (e_v[..., :-1] + e_v[..., 1:])
        )
    return u_new, v_new, heat


def _kernel(*refs, dt, cfg, corner_pos, has_vd, has_heat, n_corners,
            da_min_c):
    i = 0
    u_r, v_r, ut_r, vt_r, divg_r, vort_r, vfx_r, vfy_r = refs[:8]
    i = 8
    dvfx_r = dvfy_r = None
    if has_vd:
        dvfx_r, dvfy_r = refs[i : i + 2]
        i += 2
    (dx_r, rdx_r, dy_r, rdy_r, rsin2_r, cosa_r, f0_r, wgx_r, wgy_r,
     rac_r, band_r, d2c_r, own_r) = refs[i : i + 13]
    i += 13
    outs = refs[i:-1]
    ke_s = refs[-1]
    u_out, v_out = outs[0], outs[1]
    heat_out = outs[2] if has_heat else None

    own = tuple(own_r[0, 0, j] for j in range(n_corners))
    u_new, v_new, heat = _tail_math(
        u_r[0], v_r[0], ut_r[0], vt_r[0], divg_r[0], vort_r[0],
        vfx_r[0], vfy_r[0],
        dvfx_r[0] if has_vd else None,
        dvfy_r[0] if has_vd else None,
        dx_r[0], rdx_r[0], dy_r[0], rdy_r[0], rsin2_r[0], cosa_r[0],
        f0_r[0], wgx_r[0], wgy_r[0], rac_r[0], band_r[0], d2c_r[...],
        own, ke_s, dt=dt, cfg=cfg, corner_pos=corner_pos,
        da_min_c=da_min_c,
    )
    u_out[0] = u_new
    v_out[0] = v_new
    if has_heat:
        heat_out[0] = heat


@functools.partial(
    jax.jit,
    static_argnames=("dt", "cfg", "corner_pos", "bk", "da_min_c",
                     "interpret"),
)
def _run(args, consts, d2_col, own, dt, cfg, corner_pos, bk, da_min_c,
         interpret=False):
    from jax.experimental.pallas import tpu as pltpu

    u = args[0]
    S, K = u.shape[:2]
    nk = pl.cdiv(K, bk)
    has_vd = len(args) == 10
    has_heat = cfg.d_con > 0.0 or cfg.vtdm4 > 0.0
    n_corners = len(corner_pos)

    def fld(a):
        return pl.BlockSpec(
            (1, bk) + a.shape[-2:], lambda s, kb: (s, kb, 0, 0)
        )

    def cst(a):
        zeros = (0,) * (a.ndim - 1)
        return pl.BlockSpec(
            (1,) + a.shape[1:], lambda s, kb, _z=zeros: (s,) + _z
        )

    # d2_col arrives lane-EXPANDED (K, 1, Xc+1): in-kernel use broadcasts
    # it over sublanes only (a both-axes (bk,1,1)->(bk,Y,X) broadcast has
    # no Mosaic lowering)
    d2_spec = pl.BlockSpec(
        (bk, 1, d2_col.shape[-1]), lambda s, kb: (kb, 0, 0)
    )
    in_specs = (
        [fld(a) for a in args]
        + [cst(c) for c in consts]
        + [d2_spec, cst(own)]
    )
    Yc, Xc = u.shape[-2] - 1, u.shape[-1]  # cell extents
    out_shape = [
        jax.ShapeDtypeStruct(args[0].shape, u.dtype),  # u_new
        jax.ShapeDtypeStruct(args[1].shape, u.dtype),  # v_new
    ]
    out_specs = [fld(args[0]), fld(args[1])]
    if has_heat:
        hs = jax.ShapeDtypeStruct((S, K, Yc, Xc), u.dtype)
        out_shape.append(hs)
        out_specs.append(
            pl.BlockSpec((1, bk, Yc, Xc), lambda s, kb: (s, kb, 0, 0))
        )
    kern = functools.partial(
        _kernel, dt=dt, cfg=cfg, corner_pos=corner_pos, has_vd=has_vd,
        has_heat=has_heat, n_corners=n_corners, da_min_c=da_min_c,
    )
    from ._dispatch import pallas_cost

    res = pl.pallas_call(
        kern,
        grid=(S, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bk, Yc + 1, Xc + 1), u.dtype)  # corner-fixed ke
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        **({} if interpret else pallas_cost(
            list(args) + list(consts), out_shape, flops_per_point=60
        )),
    )(*args, *consts, d2_col, own)
    u_new, v_new = res[0], res[1]
    heat = res[2] if has_heat else None
    return u_new, v_new, heat


def d_sw_tail_pallas(u, v, ut, vt, divg_d, vort, vfx, vfy, dvfx, dvfy,
                     grid, dt: float, config, interpret: bool = False):
    """Drop-in for :func:`pace_tpu.ops.d_sw.d_sw_tail_jnp` on TPU f32."""
    import numpy as np

    from .d_sw import damping_profile
    from ._dispatch import fit_block_k

    S, K = u.shape[:2]
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
    band = jnp.clip(
        grid.edge_s_iface
        + grid.edge_n_iface
        + grid.edge_w_iface
        + grid.edge_e_iface,
        0.0,
        1.0,
    )  # (S, Y+1, X+1)
    # damping-Laplacian gradient weights: plain metric or the reference's
    # sina-carrying divg_u/divg_v arrays (DSWConfig.lap_divg_weights)
    if config.lap_divg_weights:
        wgx, wgy = grid.divg_u(), grid.divg_v()
    else:
        wgx, wgy = grid.rdx * grid.dyc, grid.rdy * grid.dxc
    consts = (
        grid.dx, grid.rdx, grid.dy, grid.rdy, grid.rsin2, grid.cosa_s,
        grid.f0, wgx, wgy, grid.rarea_c,
        band,
    )
    # lane-expanded per-k damping column (see d2_spec note in _run)
    d2_col = jnp.broadcast_to(
        damping_profile(config, K, u.dtype)[:, :, :],
        (K, 1, u.shape[-1] + 1),
    )
    args = [u, v, ut, vt, divg_d, vort, vfx, vfy]
    if dvfx is not None:
        args += [dvfx, dvfy]
    bk = min(fit_block_k(u.shape[-2], u.shape[-1], default=_BK), K)
    from ._dispatch import run_kernel_sharded

    # d2_col is a per-k damping column (K, 1, X+1) — NOT S-leading ->
    # replicated per device under a mesh
    return run_kernel_sharded(
        lambda a, c, d2, o: _run(a, c, d2, o, float(dt), config,
                                 corner_pos, bk, float(grid.da_min_c),
                                 interpret=interpret),
        (tuple(args), consts, d2_col, own),
        replicated=(2,),
    )
