"""Fused Pallas TPU kernel for the nonhydrostatic pressure gradient.

nh_p_grad is the hottest stage of the acoustic substep (measured 2.24 s of
an 8.9 s C192 step — 25%): four full a2b_ord4 interpolations (pk, gz, pp,
delp) plus the two contour-PGF pair evaluations, each streaming
field-sized intermediates through HBM. This kernel reads the seven input
planes once per layer block, performs ALL the interpolation and PGF math
in VMEM, and writes only the updated u, v — ~9 HBM passes total instead of
~40.

Numerics: the kernel computes the SAME arithmetic as ``a2b_ord4``
(ops/pgrad.py) — including the tile-edge edge_vect correction, one-sided
edge-adjacent stencils and quadratic cube-corner extrapolation — but
*strip-specialized*: the full-plane a2b applies its edge corrections as
plane-wide masked blends (the right shape for XLA fusion), which inside
the kernel measured ~25x the interior stencil's VPU work (the dense
corner path alone is ~140 plane ops for 4 points; the kernel ran at
78 GB/s-equivalent). Here the corrections are computed on the 6 affected
interface lines only and the corner extrapolations at the (static) corner
points only — identical values at every point, asserted to 1e-12 by
tests/main/test_pgrad_pallas.py. Tile-edge/corner local coordinates are
the SAME for every shard that has them (grid_data.py edge construction:
W/S at index h, E/N at index size-h), so the line positions are static
and per-shard presence is a scalar flag operand.

Block geometry: grid (S, K/BK); each block holds BK full (Y, X) planes of
every field (a C192 plane is ~158 KB — full spatial extent fits easily),
with the layer loop running as fori_loop over VMEM scratch to bound the
scoped stack.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .corners import _FOLDED, _QUADRANTS
from .d2a2c import A1, A2, centers_to_x_ifaces, centers_to_y_ifaces

#: layers per block
_BK = 8


@dataclasses.dataclass
class _A2BCtx:
    """Hoisted per-shard scalars/lines for the strip-specialized a2b."""

    h: int
    corner_pos: tuple  # ((kind, jj, ii), ...) static
    fw: jnp.ndarray  # scalar presence flags (0./1.)
    fe: jnp.ndarray
    fs: jnp.ndarray
    fn: jnp.ndarray
    own: tuple  # per-corner-entry scalar flags
    xw: jnp.ndarray  # (Y, 6): w0/wp/wm at W col, then E col
    yw: jnp.ndarray  # (6, X): w0/wp/wm at S row, then N row


def _a2b_fast(q, ctx: _A2BCtx):
    """a2b_ord4 with edge/corner work on the affected lines/points only.

    q: (..., Y, X) cell-center plane(s) -> ((..., Y+1, X+1) corner
    plane(s), corner patches). Leading batch dims are supported so the
    kernel's staging loop interpolates SEVERAL fields in one vectorized
    pass (4x fewer VPU op dispatches per layer — the per-field form
    measured 116 GB/s-equivalent). Arithmetic is op-for-op identical to
    ops.pgrad.a2b_ord4 (see module docstring).

    The cube-corner point fixes are returned as ``patches`` — a list of
    (jj, ii, value(..., 1, 1)) for the caller to apply via static-slice
    REF stores: with batch dims there is no rank-0 value for a where-
    splat, and a (..., 1, 1)->(..., Y, X) broadcast has no Mosaic
    lowering ("Broadcast in both sublanes and lanes").
    """
    Y, X = q.shape[-2:]
    h = ctx.h
    cw, ce = h, X - h
    rs, rn = h, Y - h

    qx = centers_to_x_ifaces(q)  # (..., Y, X+1)

    def col(c):
        return q[..., :, c : c + 1]  # (..., Y, 1)

    def qx_col(c):
        return qx[..., :, c : c + 1]

    # W/E tile-edge interface columns: geodesic 2-pt across the kink with
    # the ghost column interpolated along the edge (a2b edge_vect analog)
    ghost = col(cw - 1)
    gt = (
        ctx.xw[:, 0:1] * ghost
        + ctx.xw[:, 1:2] * jnp.roll(ghost, -1, axis=-2)
        + ctx.xw[:, 2:3] * jnp.roll(ghost, 1, axis=-2)
    )
    v_cw = qx_col(cw) + ctx.fw * (0.5 * (col(cw) + gt) - qx_col(cw))
    ghost = col(ce)
    gt = (
        ctx.xw[:, 3:4] * ghost
        + ctx.xw[:, 4:5] * jnp.roll(ghost, -1, axis=-2)
        + ctx.xw[:, 5:6] * jnp.roll(ghost, 1, axis=-2)
    )
    v_ce = qx_col(ce) + ctx.fe * (0.5 * (col(ce - 1) + gt) - qx_col(ce))
    # first interior interface next to each edge: one-sided cubic from the
    # 4 inside centers
    c1, c2 = cw + 1, ce - 1
    os_r = (
        0.3125 * col(c1 - 1)
        + 0.9375 * col(c1)
        - 0.3125 * col(c1 + 1)
        + 0.0625 * col(c1 + 2)
    )
    v_c1 = qx_col(c1) + ctx.fw * (os_r - qx_col(c1))
    os_l = (
        0.3125 * col(c2)
        + 0.9375 * col(c2 - 1)
        - 0.3125 * col(c2 - 2)
        + 0.0625 * col(c2 - 3)
    )
    v_c2 = qx_col(c2) + ctx.fe * (os_l - qx_col(c2))

    colid = jax.lax.broadcasted_iota(jnp.int32, (Y, X + 1), 1)
    qx = jnp.where(colid == cw, v_cw, qx)
    qx = jnp.where(colid == c1, v_c1, qx)
    qx = jnp.where(colid == c2, v_c2, qx)
    qx = jnp.where(colid == ce, v_ce, qx)

    out = centers_to_y_ifaces(qx)  # (..., Y+1, X+1)

    # S/N tile-edge interface rows: same treatment on q rows, then the
    # 4th-order interp ALONG the (smooth) edge replaces the separable
    # value on those two rows. (The one-sided rows rs+1/rn-1 of the full
    # qy are never consumed by the final blend — ey is zero there.)
    def corrected_row(r, is_s):
        q_m1, q_0 = q[..., r - 1 : r, :], q[..., r : r + 1, :]
        base = A1 * (q_m1 + q_0) + A2 * (
            q[..., r - 2 : r - 1, :] + q[..., r + 1 : r + 2, :]
        )
        ghost = q_m1 if is_s else q_0
        inside = q_0 if is_s else q_m1
        o = 0 if is_s else 3
        gt = (
            ctx.yw[o : o + 1, :] * ghost
            + ctx.yw[o + 1 : o + 2, :] * jnp.roll(ghost, -1, axis=-1)
            + ctx.yw[o + 2 : o + 3, :] * jnp.roll(ghost, 1, axis=-1)
        )
        f = ctx.fs if is_s else ctx.fn
        qy_r = base + f * (0.5 * (inside + gt) - base)  # (..., 1, X)
        out_y = centers_to_x_ifaces(qy_r)  # (..., 1, X+1)
        cur = out[..., r : r + 1, :]
        return cur + f * (out_y - cur)

    v_rs = corrected_row(rs, True)
    v_rn = corrected_row(rn, False)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (Y + 1, X + 1), 0)
    out = jnp.where(rowid == rs, v_rs, out)
    out = jnp.where(rowid == rn, v_rn, out)

    # cube-corner points: mean of the 3 one-sided diagonal quadratic
    # extrapolations, at the static corner positions only — emitted as
    # patches (see docstring)
    def cell(jj, ii, a, b):
        # mirrors corners._cell_read: roll-wrap indices, 0 past the pad
        if jj >= Y or ii >= X:
            return jnp.zeros_like(q[..., :1, :1])
        return q[
            ..., (jj + a) % Y : (jj + a) % Y + 1,
            (ii + b) % X : (ii + b) % X + 1,
        ]

    patches = []
    for idx, (kind, jj, ii) in enumerate(ctx.corner_pos):
        folded = _FOLDED[kind]
        acc = None
        for (a, b) in _QUADRANTS:
            if (a, b) == folded:
                continue
            a2 = a + (1 if a >= 0 else -1)
            b2 = b + (1 if b >= 0 else -1)
            a3 = a + (2 if a >= 0 else -2)
            b3 = b + (2 if b >= 0 else -2)
            ext = (
                1.875 * cell(jj, ii, a, b)
                - 1.25 * cell(jj, ii, a2, b2)
                + 0.375 * cell(jj, ii, a3, b3)
            )
            acc = ext if acc is None else acc + ext
        d = out[..., jj : jj + 1, ii : ii + 1]
        own = ctx.own[idx]
        patches.append((jj, ii, own * (acc / 3.0) + (1.0 - own) * d))
    return out, patches


def _kernel(pk_ref, pk_last, gz_ref, gz_last, pp_ref, pp_last, delp_ref,
            u_ref, v_ref, rdx_ref, rdy_ref, flags_ref, xw_ref, yw_ref,
            u_out, v_out, s_all, *, dt: float, bk: int,
            h: int, corner_pos: tuple):
    flags = flags_ref[0, 0]  # (4 + n_corners,)
    ctx = _A2BCtx(
        h=h,
        corner_pos=corner_pos,
        fw=flags[0],
        fe=flags[1],
        fs=flags[2],
        fn=flags[3],
        own=tuple(flags[4 + i] for i in range(len(corner_pos))),
        xw=xw_ref[0],
        yw=yw_ref[0],
    )
    rdx = rdx_ref[0]
    rdy = rdy_ref[0]

    # stage 1: interpolate each INTERFACE once (BK+1 per block, the block's
    # last interface coming from the single-plane operands). All four
    # fields ride ONE batched _a2b_fast call per layer — 4x fewer VPU op
    # dispatches than the per-field loops (which measured 116
    # GB/s-equivalent); the scratch is (bk+1, 4, Y+1, X+1) with k LEADING
    # so the dynamic-k stores/loads stay on the lead axis. Corner-point
    # fixes arrive as value patches and are applied as static-slice ref
    # stores (see _a2b_fast docstring).
    def stage(k, _):
        q4 = jnp.stack(
            [pk_ref[0, k], gz_ref[0, k], pp_ref[0, k], delp_ref[0, k]]
        )
        out4, patches = _a2b_fast(q4, ctx)
        s_all[k] = out4
        for jj, ii, val in patches:
            s_all[k, :, jj : jj + 1, ii : ii + 1] = val
        return 0

    jax.lax.fori_loop(0, bk, stage, 0)
    # block-final interface for the three (K+1)-registered fields (delp is
    # layer-registered — its bk-th slot is unused)
    q3 = jnp.stack([pk_last[0, 0], gz_last[0, 0], pp_last[0, 0]])
    out3, patches3 = _a2b_fast(q3, ctx)
    s_all[bk, :3] = out3
    for jj, ii, val in patches3:
        s_all[bk, :3, jj : jj + 1, ii : ii + 1] = val

    def layer(k, _):
        pk1, pk2 = s_all[k, 0], s_all[k + 1, 0]
        gz1, gz2 = s_all[k, 1], s_all[k + 1, 1]
        pp1, pp2 = s_all[k, 2], s_all[k + 1, 2]
        dpb = s_all[k, 3]

        def pgf(al, ar, dl_):
            """Contour-PGF increment between two corner columns.
            al/ar: (pk_k, pk_k1, gz_k, gz_k1, pp_k, pp_k1, dp) tuples."""
            p1k, p1kp, g1k, g1kp, q1k, q1kp, dp1 = al
            p2k, p2kp, g2k, g2kp, q2k, q2kp, dp2 = ar
            wk1 = p1kp - p1k
            wk2 = p2kp - p2k
            term_h = (g1kp - g2k) * (p2kp - p1k) + (g1k - g2kp) * (p1kp - p2k)
            d_h = dt * dl_ * term_h / (wk1 + wk2)
            term_p = (g1kp - g2k) * (q2kp - q1k) + (g1k - g2kp) * (q1kp - q2k)
            d_p = dt * dl_ * term_p / (dp1 + dp2)
            return d_h + d_p

        def cols(f, s):
            return f[:, :-1] if s == 0 else f[:, 1:]

        def rows(f, s):
            return f[:-1, :] if s == 0 else f[1:, :]

        planes = (pk1, pk2, gz1, gz2, pp1, pp2, dpb)
        du = pgf(
            tuple(cols(f, 0) for f in planes),
            tuple(cols(f, 1) for f in planes),
            rdx,
        )
        dv = pgf(
            tuple(rows(f, 0) for f in planes),
            tuple(rows(f, 1) for f in planes),
            rdy,
        )
        u_out[0, k] = u_ref[0, k] + du
        v_out[0, k] = v_ref[0, k] + dv
        return 0

    jax.lax.fori_loop(0, bk, layer, 0)


@functools.partial(
    jax.jit, static_argnames=("dt", "bk", "h", "corner_pos", "interpret")
)
def _run(pk, gz, pp, delp, u, v, rdx, rdy, flags, xw, yw, dt: float,
         bk: int, h: int, corner_pos: tuple, interpret: bool = False):
    S, K1, Y, X = pk.shape
    K = K1 - 1
    nk = pl.cdiv(K, bk)

    def fld(k_extent, y, x):
        return pl.BlockSpec(
            (1, bk, y, x), lambda s, kb: (s, kb, 0, 0)
        )

    def cst(shape):
        # (S, ...) constant: one shard slice per block, constant over kb
        zeros = (0,) * len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda s, kb, _z=zeros: (s,) + _z
        )

    def last_plane():
        # single (Y, X) plane at the block's LAST interface, read from the
        # SAME (K+1)-plane operand buffer as the bulk block (no lo/hi HBM
        # duplication). The final k-block's index kb*BK+BK may exceed the
        # last interface by the cdiv padding — clamp explicitly (the plane
        # then only feeds padded output layers, which are dropped; an
        # unclamped out-of-bounds block index aborts on real TPUs).
        return pl.BlockSpec(
            (1, 1, Y, X),
            lambda s, kb: (s, jnp.minimum(kb * bk + bk, K1 - 1), 0, 0),
        )

    in_specs = (
        [fld(K, Y, X), last_plane()] * 3    # pk/gz/pp: bulk + last interface
        + [fld(K, Y, X)]            # delp
        + [fld(K, Y + 1, X), fld(K, Y, X + 1)]  # u, v
        + [cst((Y + 1, X)), cst((Y, X + 1))]    # rdx, rdy
        + [cst(flags.shape[1:]), cst(xw.shape[1:]), cst(yw.shape[1:])]
    )
    out_specs = [fld(K, Y + 1, X), fld(K, Y, X + 1)]
    kern = functools.partial(
        _kernel, dt=dt, bk=bk, h=h, corner_pos=corner_pos
    )
    from jax.experimental.pallas import tpu as pltpu

    u2, v2 = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(u.shape, u.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        grid=(S, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bk + 1, 4, Y + 1, X + 1), u.dtype)
        ],
        # Mosaic sums the staging loops' live sets into one scoped stack
        # (~42MB at C192) instead of reusing across sequential loops; raise
        # the per-kernel VMEM budget (v5e/v5p have 128MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        **({} if interpret else __import__(
            "pace_tpu.ops._dispatch", fromlist=["pallas_cost"]
        ).pallas_cost((pk, gz, pp, delp, u, v), (u, v),
                      flops_per_point=60)),
    )(
        pk, pk, gz, gz, pp, pp,
        delp, u, v, rdx, rdy, flags, xw, yw,
    )
    return u2, v2


def nh_p_grad_pallas(u, v, pk, gz, pp, delp, grid, dt: float,
                     interpret: bool = False):
    """Drop-in for ops.nonhydro.nh_p_grad (same numerics, fused on-chip)."""
    import numpy as np

    from ._dispatch import fit_block_k

    S, _, Y, X = delp.shape
    h = int(grid.n_halo)
    if X - 2 * h < 5 or Y - 2 * h < 5:
        raise ValueError(
            "pgrad kernel strip specialization needs interior >= 5 cells"
        )
    cw, ce, rs, rn = h, X - h, h, Y - h
    table = tuple(grid.corner_table)
    corner_pos = tuple((kind, jj, ii) for kind, jj, ii, _own in table)
    own = np.array(
        [[1.0 if e[3][s] else 0.0 for e in table] for s in range(S)],
        dtype=np.float32,
    ).reshape(S, len(table))
    flags = jnp.concatenate(
        [
            grid.edge_w_iface[:, 0, cw : cw + 1],
            grid.edge_e_iface[:, 0, ce : ce + 1],
            grid.edge_s_iface[:, rs, 0:1],
            grid.edge_n_iface[:, rn, 0:1],
            jnp.asarray(own, dtype=u.dtype),
        ],
        axis=-1,
    ).astype(u.dtype)[:, None, :]  # (S, 1, 4 + n_corners)
    xw = jnp.stack(
        [
            grid.a2b_x_w0[:, :, cw], grid.a2b_x_wp[:, :, cw],
            grid.a2b_x_wm[:, :, cw],
            grid.a2b_x_w0[:, :, ce], grid.a2b_x_wp[:, :, ce],
            grid.a2b_x_wm[:, :, ce],
        ],
        axis=-1,
    ).astype(u.dtype)  # (S, Y, 6)
    yw = jnp.stack(
        [
            grid.a2b_y_w0[:, rs, :], grid.a2b_y_wp[:, rs, :],
            grid.a2b_y_wm[:, rs, :],
            grid.a2b_y_w0[:, rn, :], grid.a2b_y_wp[:, rn, :],
            grid.a2b_y_wm[:, rn, :],
        ],
        axis=-2,
    ).astype(u.dtype)  # (S, 6, X)
    bk = min(fit_block_k(Y, X, default=_BK), delp.shape[-3])
    from ._dispatch import run_kernel_sharded

    return run_kernel_sharded(
        lambda *a: _run(*a, float(dt), bk=bk, h=h, corner_pos=corner_pos,
                        interpret=interpret),
        (pk, gz, pp, delp, u, v, grid.rdx, grid.rdy, flags, xw, yw),
    )
