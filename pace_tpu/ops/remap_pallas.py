"""Pallas TPU kernel for the vertical Lagrangian->Eulerian remap.

The remap is column-local and k-sequential — exactly the shape SURVEY.md §7
flags for Pallas column kernels: (Y, X) on sublanes/lanes, K resident in VMEM.
The XLA formulation streams ~70 field-sized intermediates through HBM
(~0.5 s per call at C192 npz=79); this kernel reads q/pe1/pe2 once, does the
PPM reconstruction, column integral, interval location and evaluation
entirely on-chip, and writes the result once — ~4 HBM passes total.

Numerics match pace_tpu.ops.remapping.remap_field (same reconstruction,
same cumulative-integral evaluation and the same kord scheme family via
remapping.vertical_reconstruction), exact
conservation, interval location by comparison counting with the bounded-
offset evaluation window. Dynamic k-indexing goes through VMEM scratch refs
(Pallas TPU has no value-level dynamic_slice/cumsum lowerings).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .remapping import _coerce_kord, vertical_reconstruction

#: max vertical displacement (cells) between source and target interfaces
D_OFFSET = 5


def _remap_kernel(
    pe1_ref, pe2_ref, q_ref, out_ref,
    al_s, da_s, a6_s, dp1_s, pe1t_s, q1_s, qdp_s,
    *, kord: int,
):
    pe1 = pe1_ref[0]  # (K1, BY, BX)
    q = q_ref[0]  # (K, BY, BX)
    K = q.shape[0]
    K2 = pe2_ref.shape[1]
    dp1 = pe1[1:] - pe1[:-1]

    def shift(a, n):
        return jnp.roll(a, -n, axis=0)

    # the SAME kord scheme family as the XLA path (remapping.py); the block's
    # k axis is axis 0 == axis -3 of (K, BY, BX)
    bl, br = vertical_reconstruction(q, kord, shift)

    # stash the per-cell reconstruction in scratch refs so the j-loop can
    # read them at dynamic k
    al_s[...] = q + bl
    da_s[...] = br - bl
    a6_s[...] = -3.0 * (bl + br)
    dp1_s[...] = dp1
    pe1t_s[...] = pe1  # ALL source interfaces (cell k: top pe1[k], bot pe1[k+1])

    # cumulative column integral Q1 at source-cell TOPS: Q1[k] = sum_{m<k}.
    # q*dp goes through a scratch ref — value-level dynamic indexing has no
    # Pallas TPU lowering
    qdp_s[...] = q * dp1

    def cum_body(k, acc):
        q1_s[pl.ds(k, 1)] = acc[None]
        return acc + qdp_s[k]

    final = jax.lax.fori_loop(
        0, K, cum_body, jnp.zeros(q.shape[1:], q.dtype)
    )
    del final

    def interface_integral(j):
        """Q(pe2[j]) — cumulative integral at target interface j.

        Interval location by LOCAL comparison counting: since the candidate
        window is clipped to ±D_OFFSET anyway, the bracketing-cell offset
        clip(m - base, ±D) is computable from the 2D+1 candidate bottoms
        alone — with pe1_bot monotone in k,
            clip(m-base, -D, D) = clip(sum_{o<0} [bot(base+o)<=p, valid]-1
                                       + sum_{o>=0} [bot(base+o)<=p, valid],
                                       -D, D)
        (out-of-range candidates contribute 0). This replaces the previous
        O(K) full-column count (79 compares/interface at npz=79) with 11.
        """
        p = pe2_ref[0, j]  # (BY, BX)
        base = jnp.clip(j - 1, 0, K - 1)
        m_loc = jnp.zeros_like(p, dtype=jnp.int32)
        for o in range(-D_OFFSET, D_OFFSET + 1):
            kk = jnp.clip(base + o, 0, K - 1)
            bot = pe1t_s[jnp.clip(kk + 1, 1, K)]  # bottom of cell kk
            cmp_o = (bot <= p).astype(jnp.int32)
            lo_valid = base + o >= 0
            hi_valid = base + o <= K - 1
            if o < 0:
                term = jnp.where(lo_valid, cmp_o - 1, 0)
            else:
                term = jnp.where(hi_valid, cmp_o, 0)
            m_loc = m_loc + term
        off = jnp.clip(m_loc, -D_OFFSET, D_OFFSET)
        # select the bracketing cell's 6 coefficient planes FIRST (one
        # cheap where per plane per candidate), then evaluate the cubic
        # ONCE — the previous form ran the full t-polynomial for all 11
        # candidates (~2x the VPU work of this one)
        coefs = None
        for o in range(-D_OFFSET, D_OFFSET + 1):
            kk = jnp.clip(base + o, 0, K - 1)
            cand = (
                pe1t_s[kk], dp1_s[kk], al_s[kk], da_s[kk], a6_s[kk],
                q1_s[kk],
            )
            if coefs is None:
                coefs = cand
            else:
                sel = off == o
                coefs = tuple(
                    jnp.where(sel, c_new, c_old)
                    for c_new, c_old in zip(cand, coefs)
                )
        pe1_m, dp1_m, al_m, da_m, a6_m, q1_m = coefs
        t = jnp.clip((p - pe1_m) / dp1_m, 0.0, 1.0)
        f = al_m * t + 0.5 * da_m * t**2 + a6_m * (
            0.5 * t**2 - t**3 / 3.0
        )
        return q1_m + dp1_m * f

    def body(j, q_prev):
        q_here = interface_integral(j + 1)
        dp2 = pe2_ref[0, j + 1] - pe2_ref[0, j]
        out_ref[0, j] = (q_here - q_prev) / dp2
        return q_here

    q_top = jnp.zeros(q.shape[1:], q.dtype)
    jax.lax.fori_loop(0, K2 - 1, body, q_top)


def remap_field_pallas(q, pe1, pe2, kord=4, interpret: bool = False):
    """Drop-in for remap_field on TPU: q (..., K, Y, X), pe1/pe2
    (..., K+1, Y, X) -> (..., K2-1, Y, X). Mesh-aware dispatch (see
    _dispatch.run_kernel_sharded)."""
    from ._dispatch import run_kernel_sharded

    return run_kernel_sharded(
        lambda qq, p1, p2: _remap_field_jit(
            qq, p1, p2, kord=kord, interpret=interpret
        ),
        (q, pe1, pe2),
    )


@functools.partial(jax.jit, static_argnames=("kord", "interpret"))
def _remap_field_jit(q, pe1, pe2, kord=4,
                     interpret: bool = False):
    lead = q.shape[:-3]
    K = q.shape[-3]
    K1 = pe1.shape[-3]
    K2 = pe2.shape[-3]
    Y, X = q.shape[-2:]
    L = 1
    for d in lead:
        L *= d
    qf = q.reshape((L, K, Y, X))

    # do NOT materialize pe broadcasts across the lead dims (the 9-tracer
    # call at C384 would hold 2 x nq extra (K+1)-field copies in HBM —
    # measured 3.8 GB over capacity): keep each pe at its own true lead
    # size and fold the repeat factor into the block index map
    def pe_flat(pe):
        pl_lead = pe.shape[:-3]
        lp = 1
        for d in pl_lead:
            lp *= d
        # the l//rep index map is only valid when the flattened pe lead is a
        # PREFIX of q's flattened lead (pe broadcast on trailing lead axes):
        # require pe.shape[:-3] to equal the leading dims of q.shape[:-3]
        # (padded with 1s) and lp to divide L; anything else would silently
        # read wrong pressure columns.
        if lp == 0 or L % lp != 0:
            raise ValueError(
                f"pe lead {pl_lead} does not evenly divide q lead {lead}"
            )
        pl_full = (1,) * (len(lead) - len(pl_lead)) + tuple(pl_lead)
        seen_bcast = False
        for qd, pd in zip(lead, pl_full):
            if pd == 1 and qd != 1:
                seen_bcast = True
            elif pd == qd:
                if seen_bcast and qd != 1:
                    raise ValueError(
                        f"pe lead {pl_lead} varies on a lead axis AFTER a"
                        f" broadcast axis of q lead {lead}; the l//rep block"
                        " map would read wrong pressure columns —"
                        " materialize the broadcast before calling"
                    )
            else:
                raise ValueError(
                    f"pe lead {pl_lead} not broadcastable to q lead {lead}"
                )
        rep = L // lp
        return pe.reshape((lp,) + pe.shape[-3:]), rep

    pe1f, rep1 = pe_flat(pe1)
    pe2f, rep2 = pe_flat(pe2)

    # (32, 256) = 4x2 native f32 tiles per k-plane: the column loops run
    # ~8x fewer Mosaic op dispatches per grid-step than the original
    # (8, 128) single-tile blocks (the kernel is dispatch/VPU-bound, 54
    # GB/s-equivalent measured at C192). The old 16MB scoped-vmem stack
    # ceiling that forced (8, 128) is lifted via vmem_limit_bytes below.
    BY, BX = 32, 256
    # small planes (tests, coarse shards): shrink to avoid padding waste
    while BY // 2 >= Y and BY > 8:
        BY //= 2
    while BX // 2 >= X and BX > 128:
        BX //= 2
    ny = pl.cdiv(Y, BY)
    nx = pl.cdiv(X, BX)

    from ._dispatch import pallas_cost

    _out_sds = jax.ShapeDtypeStruct((L, K2 - 1, Y, X), q.dtype)
    out = pl.pallas_call(
        functools.partial(_remap_kernel, kord=_coerce_kord(kord)),
        out_shape=_out_sds,
        grid=(L, ny, nx),
        in_specs=[
            pl.BlockSpec(
                (1, K1, BY, BX),
                lambda l, i, j, _r=rep1: (l // _r, 0, i, j),
            ),
            pl.BlockSpec(
                (1, K2, BY, BX),
                lambda l, i, j, _r=rep2: (l // _r, 0, i, j),
            ),
            pl.BlockSpec((1, K, BY, BX), lambda l, i, j: (l, 0, i, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, K2 - 1, BY, BX), lambda l, i, j: (l, 0, i, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((K, BY, BX), q.dtype),  # al
            pltpu.VMEM((K, BY, BX), q.dtype),  # da
            pltpu.VMEM((K, BY, BX), q.dtype),  # a6
            pltpu.VMEM((K, BY, BX), q.dtype),  # dp1
            pltpu.VMEM((K1, BY, BX), q.dtype),  # pe1 ALL interfaces
            pltpu.VMEM((K, BY, BX), q.dtype),  # Q1 at tops
            pltpu.VMEM((K, BY, BX), q.dtype),  # q*dp
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        **({} if interpret else pallas_cost((qf, pe1f, pe2f), (_out_sds,), flops_per_point=200)),
    )(pe1f, pe2f, qf)
    return out.reshape(lead + (K2 - 1, Y, X))
