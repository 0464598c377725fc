"""Pallas TPU kernel for the semi-implicit vertical solve (sim1).

The sim1 solve (reference ``pyFV3/stencils/sim1_solver.py`` role, SURVEY.md
§2.3) is column-local and k-sequential: a Thomas (tridiagonal) sweep down and
back up each column. The XLA ``lax.scan`` formulation launches 2*K serial
plane-wide steps, each streaming (Y, X) slabs through HBM (~15 ms/call at
C192 npz=79). This kernel holds the whole column in VMEM — coefficient
assembly, both Thomas sweeps, and the w/delz/pp updates happen on-chip with
~6 field reads + 3 writes of HBM traffic total.

Numerics match ops.nonhydro.sim1_solver exactly (same linearization,
mass-weighted interface interpolation, Dirichlet W_K = ws fold-in).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants

GAMMA = 1.0 / (1.0 - constants.KAPPA)  # cp/cv


def _sim1_kernel(
    w_ref, delz_ref, pt_ref, delp_ref, pkz_ref, ws_ref,
    wout_ref, dzout_ref, pp_ref,
    a_s, b_s, c_s, rhs_s, cp_s, dp_s, wi_s,
    *, dt: float, ptop: float, p_fac: float,
):
    w = w_ref[0]          # (K, BY, BX)
    delz = delz_ref[0]
    pt = pt_ref[0]
    delp = delp_ref[0]
    pkz = pkz_ref[0]
    ws = ws_ref[0, 0]     # (BY, BX)
    K = w.shape[0]

    dm = delp / constants.GRAV
    t_v = pt * pkz
    p_full = dm * constants.RDGAS * t_v / (-delz)

    # hydrostatic log-mean layer pressure: cumsum of delp down the column,
    # sequential in VMEM (p_hyd[k] = delp[k] / (ln pe_below - ln pe_above))
    def hyd_body(k, pe_above):
        # dynamic k-indexing must go through the ref (Pallas TPU has no
        # value-level dynamic_slice lowering)
        dp_k = delp_ref[0, k]
        pe_below = pe_above + dp_k
        ln_above = jnp.log(jnp.maximum(pe_above, 1e-10))
        ln_below = jnp.log(jnp.maximum(pe_below, 1e-10))
        # reuse rhs_s as p_hyd scratch until the rhs is assembled
        rhs_s[pl.ds(k, 1)] = (dp_k / (ln_below - ln_above))[None]
        return pe_below

    jax.lax.fori_loop(
        0, K, hyd_body, jnp.full(w.shape[1:], ptop, w.dtype)
    )
    p_hyd_layer = rhs_s[...]
    pprime = p_full - p_hyd_layer

    b_coef = -GAMMA * p_full * dt / delz  # > 0 (delz < 0)

    # interface masses / initial interface velocities (k = 0..K-1;
    # row k solves for interface W_k, W_K = ws is Dirichlet)
    dm_up, dm_dn = dm[:-1], dm[1:]
    dmh = jnp.concatenate([0.5 * dm[:1], 0.5 * (dm_up + dm_dn)], axis=0)
    w_int = (dm_dn * w[:-1] + dm_up * w[1:]) / (dm_up + dm_dn)
    w0 = jnp.concatenate([w[:1], w_int], axis=0)

    zrow = jnp.zeros_like(b_coef[:1])
    b_km1 = jnp.concatenate([zrow, b_coef[:-1]], axis=0)
    r = dt / dmh
    a_diag = -r * b_km1
    b_diag = 1.0 + r * (b_km1 + b_coef)
    c_diag = -r * b_coef
    pprime_km1 = jnp.concatenate([zrow, pprime[:-1]], axis=0)
    rhs = w0 + r * (pprime - pprime_km1)
    # fold the known W_K = ws into the last row
    kidx = jax.lax.broadcasted_iota(jnp.int32, rhs.shape, 0)
    last = kidx == K - 1
    rhs = jnp.where(last, rhs - c_diag * ws[None], rhs)
    c_diag = jnp.where(last, 0.0, c_diag)

    a_s[...] = a_diag
    b_s[...] = b_diag
    c_s[...] = c_diag
    rhs_s[...] = rhs

    # Thomas forward sweep
    zero = jnp.zeros(w.shape[1:], w.dtype)

    def fwd(k, carry):
        cpm, dpm = carry
        denom = b_s[k] - a_s[k] * cpm
        cp_k = c_s[k] / denom
        dp_k = (rhs_s[k] - a_s[k] * dpm) / denom
        cp_s[pl.ds(k, 1)] = cp_k[None]
        dp_s[pl.ds(k, 1)] = dp_k[None]
        return (cp_k, dp_k)

    jax.lax.fori_loop(0, K, fwd, (zero, zero))

    # backward substitution
    def bwd(i, x_kp1):
        k = K - 1 - i
        x_k = dp_s[k] - cp_s[k] * x_kp1
        wi_s[pl.ds(k, 1)] = x_k[None]
        return x_k

    jax.lax.fori_loop(0, K, bwd, ws)

    w_iface = wi_s[...]  # (K, BY, BX), interfaces 0..K-1
    wi_full = jnp.concatenate([w_iface, ws[None]], axis=0)
    dwdz = wi_full[1:] - wi_full[:-1]
    dz_new = delz + dt * dwdz
    # p_fac pressure floor in-kernel (p_hyd_layer is already resident —
    # the external ops.nonhydro._p_fac_floor would redo the whole
    # cumsum/log pass through HBM): a layer may not expand past the
    # thickness where its gas-law pressure drops below p_fac * hydrostatic
    if p_fac > 0.0:  # static: no-floor is an explicit skip, not x/0 -> inf
        dz_new = jnp.maximum(
            dz_new, -dm * constants.RDGAS * t_v / (p_fac * p_hyd_layer)
        )
    pprime_new = pprime + b_coef * dwdz

    pp_int = (dm_dn * pprime_new[:-1] + dm_up * pprime_new[1:]) / (
        dm_up + dm_dn
    )
    pp_bot = 1.5 * pprime_new[-1:] - 0.5 * pprime_new[-2:-1]
    pp = jnp.concatenate([jnp.zeros_like(pp_int[:1]), pp_int, pp_bot], axis=0)

    w_new = w + (dt / dm) * (pp[1:] - pp[:-1])

    wout_ref[0] = w_new
    dzout_ref[0] = dz_new
    pp_ref[0] = pp


def sim1_solver_pallas(w, delz, pt, delp, pkz, ws, dt: float,
                       ptop: float = 0.0, p_fac: float = 0.0,
                       interpret: bool = False):
    """Drop-in for ops.nonhydro.sim1_solver on TPU float32.

    w/delz/pt/delp/pkz: (..., K, Y, X); ws: (..., Y, X).
    Returns (w_new, delz_new, pp) with pp (..., K+1, Y, X). Mesh-aware
    dispatch (see _dispatch.run_kernel_sharded)."""
    from ._dispatch import run_kernel_sharded

    return run_kernel_sharded(
        lambda *a: _sim1_jit(*a, dt, ptop, p_fac, interpret),
        (w, delz, pt, delp, pkz, ws),
    )


@functools.partial(
    jax.jit, static_argnames=("dt", "ptop", "p_fac", "interpret")
)
def _sim1_jit(w, delz, pt, delp, pkz, ws, dt: float,
              ptop: float = 0.0, p_fac: float = 0.0,
              interpret: bool = False):
    lead = w.shape[:-3]
    K = w.shape[-3]
    Y, X = w.shape[-2:]
    L = 1
    for d in lead:
        L *= d
    flat = lambda a: a.reshape((L, K, Y, X))
    ws_f = jnp.broadcast_to(ws, lead + (Y, X)).reshape((L, 1, Y, X))

    BY, BX = 8, 128
    ny = pl.cdiv(Y, BY)
    nx = pl.cdiv(X, BX)
    col = lambda l, i, j: (l, 0, i, j)

    scratch = pltpu.VMEM((K, BY, BX), w.dtype)
    w_new, dz_new, pp = pl.pallas_call(
        functools.partial(_sim1_kernel, dt=dt, ptop=ptop, p_fac=p_fac),
        out_shape=(
            jax.ShapeDtypeStruct((L, K, Y, X), w.dtype),
            jax.ShapeDtypeStruct((L, K, Y, X), w.dtype),
            jax.ShapeDtypeStruct((L, K + 1, Y, X), w.dtype),
        ),
        grid=(L, ny, nx),
        in_specs=[pl.BlockSpec((1, K, BY, BX), col)] * 5
        + [pl.BlockSpec((1, 1, BY, BX), col)],
        out_specs=(
            pl.BlockSpec((1, K, BY, BX), col),
            pl.BlockSpec((1, K, BY, BX), col),
            pl.BlockSpec((1, K + 1, BY, BX), col),
        ),
        scratch_shapes=[scratch] * 7,
        interpret=interpret,
        **({} if interpret else __import__(
            "pace_tpu.ops._dispatch", fromlist=["pallas_cost"]
        ).pallas_cost(
            (w, delz, pt, delp, pkz, ws),
            (w, delz, jax.ShapeDtypeStruct((L, K + 1, Y, X), w.dtype)),
            flops_per_point=60, transcendentals_per_point=2,
        )),
    )(flat(w), flat(delz), flat(pt), flat(delp), flat(pkz), ws_f)
    return (
        w_new.reshape(lead + (K, Y, X)),
        dz_new.reshape(lead + (K, Y, X)),
        pp.reshape(lead + (K + 1, Y, X)),
    )
