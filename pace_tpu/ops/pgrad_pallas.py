"""Fused Pallas TPU kernel for the nonhydrostatic pressure gradient.

nh_p_grad is the hottest stage of the acoustic substep (measured 2.24 s of
an 8.9 s C192 step — 25%): four full a2b_ord4 interpolations (pk, gz, pp,
delp) plus the two contour-PGF pair evaluations, each streaming
field-sized intermediates through HBM. This kernel reads the seven input
planes once per layer block, performs ALL the interpolation and PGF math
in VMEM, and writes only the updated u, v — ~9 HBM passes total instead of
~40.

Numerics: the kernel calls the SAME ``a2b_ord4`` (ops/pgrad.py) the XLA
path uses — including the tile-edge edge_vect correction, one-sided
edge-adjacent stencils and quadratic cube-corner extrapolation — on
per-shard 2-D planes, with the grid constants delivered as block inputs
through a lightweight view object. The dense-mask corner path is taken
in-kernel (the static point table is a host-side optimization).

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

from .pgrad import a2b_ord4

#: layers per block
_BK = 8


@dataclasses.dataclass
class _GridView:
    """Per-shard 2-D grid constants in the shapes a2b_ord4 expects.
    ``corner_table`` is intentionally absent -> dense-mask corner path."""

    a2b_x_w0: jnp.ndarray
    a2b_x_wp: jnp.ndarray
    a2b_x_wm: jnp.ndarray
    a2b_ghost_left_x: jnp.ndarray
    a2b_y_w0: jnp.ndarray
    a2b_y_wp: jnp.ndarray
    a2b_y_wm: jnp.ndarray
    a2b_ghost_south_y: jnp.ndarray
    edge_w_iface: jnp.ndarray
    edge_e_iface: jnp.ndarray
    edge_s_iface: jnp.ndarray
    edge_n_iface: jnp.ndarray
    corner_sw: jnp.ndarray
    corner_se: jnp.ndarray
    corner_nw: jnp.ndarray
    corner_ne: jnp.ndarray


_CONST_NAMES = tuple(f.name for f in dataclasses.fields(_GridView))


def _kernel(pk_ref, pk_last, gz_ref, gz_last, pp_ref, pp_last, delp_ref,
            u_ref, v_ref, rdx_ref, rdy_ref, *consts_outs_scratch, dt: float,
            bk: int):
    nc = len(_CONST_NAMES)
    consts = consts_outs_scratch[:nc]
    u_out, v_out = consts_outs_scratch[nc : nc + 2]
    scr = consts_outs_scratch[nc + 2 :]  # pk/gz/pp (BK+1,..), delp (BK,..)
    gv = _GridView(**{
        name: ref[0] for name, ref in zip(_CONST_NAMES, consts)
    })
    rdx = rdx_ref[0]
    rdy = rdy_ref[0]

    # stage 1: interpolate each INTERFACE once (BK+1 per block, the block's
    # last interface coming from the single-plane operand) — the previous
    # lo/hi formulation interpolated every interior interface twice and
    # DMA'd each interface field twice. One field per loop so the live
    # temporary set (the a2b internals) stays ~one call — a single fused
    # per-layer body blew the 16MB scoped-vmem stack at C192.
    s_pk, s_gz, s_pp, s_dpb = scr
    for f_ref, l_ref, s_ref in (
        (pk_ref, pk_last, s_pk),
        (gz_ref, gz_last, s_gz),
        (pp_ref, pp_last, s_pp),
    ):
        def stage(k, _, f_ref=f_ref, s_ref=s_ref):
            s_ref[k] = a2b_ord4(f_ref[0, k], gv)
            return 0

        jax.lax.fori_loop(0, bk, stage, 0)
        s_ref[bk] = a2b_ord4(l_ref[0, 0], gv)

    def stage_dp(k, _):
        s_dpb[k] = a2b_ord4(delp_ref[0, k], gv)
        return 0

    jax.lax.fori_loop(0, bk, stage_dp, 0)

    def layer(k, _):
        pk1, pk2 = s_pk[k], s_pk[k + 1]
        gz1, gz2 = s_gz[k], s_gz[k + 1]
        pp1, pp2 = s_pp[k], s_pp[k + 1]
        dpb = s_dpb[k]

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
    jax.jit, static_argnames=("dt", "bk", "interpret")
)
def _run(pk, gz, pp, delp, u, v, rdx, rdy, consts, dt: float,
         bk: int = _BK, interpret: bool = False):
    S, K1, Y, X = pk.shape
    K = K1 - 1
    nk = pl.cdiv(K, bk)

    def fld(k_extent, y, x):
        return pl.BlockSpec(
            (1, bk, y, x), lambda s, kb: (s, kb, 0, 0)
        )

    def cst(shape):
        # (S, a, b) constant: one shard slice per block, constant over kb
        return pl.BlockSpec(
            (1,) + shape, lambda s, kb: (s, 0, 0)
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
        + [cst(c.shape[1:]) for c in consts]
    )
    out_specs = [fld(K, Y + 1, X), fld(K, Y, X + 1)]
    kern = functools.partial(_kernel, dt=dt, bk=bk)
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
            pltpu.VMEM((bk + 1, Y + 1, X + 1), u.dtype) for _ in range(3)
        ] + [pltpu.VMEM((bk, Y + 1, X + 1), u.dtype)],
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
                      flops_per_point=80)),
    )(
        pk, pk, gz, gz, pp, pp,
        delp, u, v, rdx, rdy, *consts,
    )
    return u2, v2


def nh_p_grad_pallas(u, v, pk, gz, pp, delp, grid, dt: float,
                     interpret: bool = False):
    """Drop-in for ops.nonhydro.nh_p_grad (same numerics, fused on-chip)."""
    from ._dispatch import fit_block_k

    consts = tuple(getattr(grid, n) for n in _CONST_NAMES)
    bk = min(fit_block_k(u.shape[-2], u.shape[-1], default=_BK),
             delp.shape[-3])
    return _run(pk, gz, pp, delp, u, v, grid.rdx, grid.rdy, consts,
                float(dt), bk=bk, interpret=interpret)
