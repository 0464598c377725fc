"""Pallas TPU column kernel for the hydrostatic interface chain.

``hydrostatic_interfaces`` (ops/pgrad.py) is called 2x per acoustic
substep plus per remap stage; its XLA form materializes pe, peln, pk,
pkz, gz AND the cumsum intermediates — ~8 K-sized field passes per call,
~400 GB/step of DynCore-residual traffic at C192. The chain is purely
column-local (cumssums over k, pointwise transcendentals), the exact
shape for a (K, BY, BX)-blocked column kernel: read delp/pt/phis once,
run both cumulative integrals in VMEM, write only the outputs the call
site consumes (static ``need`` selection — the provisional C-grid solve
needs just pkz; the D-grid PGF needs pk and pkz).

Numerics: identical formulas and identical summation ORDER to the XLA
path (ascending k for pe, descending for gz — matching jnp.cumsum and
the reversed cumsum respectively); interpret-mode equality asserted by
tests/main/test_hydro_pallas.py. On-device the pow/log lowerings may
differ from XLA by ulps, as with every kernel twin in this package.

Reference analog: the pe/pk/peln recomputations inside dyn_core
(pyFV3 pe_halo/pk3_halo + the hydrostatic gz integral; SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants

_ALL = ("pe", "peln", "pk", "pkz", "gz")


def _kernel(delp_ref, pt_ref, phis_ref, *outs_scratch, ptop, need, K):
    outs = outs_scratch[: len(need)]
    pe_s = outs_scratch[len(need)]
    c_s = outs_scratch[len(need) + 1]
    out = dict(zip(need, outs))

    # ascending cumsum: pe[0] = ptop, pe[k+1] = ptop + sum_{m<=k} delp[m].
    # Dynamic k-indexing must go through REFS (delp_ref[0, k]), never
    # through values — value-level dynamic_slice has no Mosaic TC lowering
    # (it passes interpret mode and fails only on hardware).
    shp = delp_ref.shape[2:]
    dtype = delp_ref.dtype
    pe_s[0] = jnp.full(shp, ptop, dtype)

    def fwd(k, acc):
        acc = acc + delp_ref[0, k]
        pe_s[k + 1] = acc + ptop
        return acc

    jax.lax.fori_loop(0, K, fwd, jnp.zeros(shp, dtype))

    pe = pe_s[...]
    if "pe" in out:
        out["pe"][0] = pe
    peln = jnp.log(pe)
    if "peln" in out:
        out["peln"][0] = peln
    kap = constants.KAPPA
    pk = (pe / constants.P_REF) ** kap
    if "pk" in out:
        out["pk"][0] = pk
    dpk = pk[1:] - pk[:-1]
    if "pkz" in out:
        out["pkz"][0] = dpk / (kap * (peln[1:] - peln[:-1]))
    if "gz" in out:
        pt = pt_ref[0]
        phis = phis_ref[0]
        # stage the per-layer contribution in scratch so the descending
        # loop reads it at dynamic k through a ref (see fwd-loop note)
        c_s[...] = constants.CP_AIR * pt * dpk
        gz_ref = out["gz"]
        gz_ref[0, K] = phis

        def bwd(i, acc):
            k = K - 1 - i
            acc = acc + c_s[k]
            gz_ref[0, k] = phis + acc
            return acc

        jax.lax.fori_loop(0, K, bwd, jnp.zeros(shp, dtype))


@functools.partial(
    jax.jit, static_argnames=("ptop", "need", "interpret")
)
def _run(delp, pt, phis, ptop, need, interpret=False):
    S, K, Y, X = delp.shape
    BY, BX = 32, 256
    while BY // 2 >= Y and BY > 8:
        BY //= 2
    while BX // 2 >= X and BX > 128:
        BX //= 2
    ny, nx = pl.cdiv(Y, BY), pl.cdiv(X, BX)

    def fld(kk):
        return pl.BlockSpec(
            (1, kk, BY, BX), lambda s, i, j: (s, 0, i, j)
        )

    phis_spec = pl.BlockSpec((1, BY, BX), lambda s, i, j: (s, i, j))
    out_shape = []
    out_specs = []
    for name in need:
        kk = K if name == "pkz" else K + 1
        out_shape.append(jax.ShapeDtypeStruct((S, kk, Y, X), delp.dtype))
        out_specs.append(fld(kk))
    kern = functools.partial(
        _kernel, ptop=float(ptop), need=need, K=K
    )
    from ._dispatch import pallas_cost

    res = pl.pallas_call(
        kern,
        grid=(S, ny, nx),
        in_specs=[fld(K), fld(K), phis_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((K + 1, BY, BX), delp.dtype),  # pe
            pltpu.VMEM((K, BY, BX), delp.dtype),  # gz layer contribution
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        **({} if interpret else pallas_cost(
            (delp, pt, phis), out_shape, flops_per_point=8,
            transcendentals_per_point=2,
        )),
    )(delp, pt, phis)
    return dict(zip(need, res))


def hydrostatic_interfaces_pallas(delp, pt, phis, ptop: float,
                                  need=("pk", "pkz", "gz"),
                                  interpret: bool = False):
    """Column-kernel variant of :func:`pace_tpu.ops.pgrad.
    hydrostatic_interfaces` computing only the ``need`` outputs.
    Returns the 5-tuple (pe, peln, pk, pkz, gz) with None for outputs
    not requested."""
    need = tuple(n for n in _ALL if n in need)
    if phis.ndim < delp.ndim - 1:
        raise ValueError("phis must be (S, Y, X)")
    from ._dispatch import run_kernel_sharded

    res = run_kernel_sharded(
        lambda d, t, p: _run(d, t, p, float(ptop), need,
                             interpret=interpret),
        (delp, pt, phis),
    )
    return tuple(res.get(n) for n in _ALL)


def hydrostatic_interfaces_best(delp, pt, phis, ptop: float, need):
    """Backend-dispatched hydrostatic interface chain: the Pallas column
    kernel on TPU float32 (``need``-pruned outputs), the XLA formulation
    elsewhere. Returns (pe, peln, pk, pkz, gz); entries outside ``need``
    may be None on the kernel path."""
    from ._dispatch import use_pallas
    from .pgrad import hydrostatic_interfaces

    if use_pallas("hydro") and delp.dtype == jnp.float32:
        return hydrostatic_interfaces_pallas(delp, pt, phis, ptop, need)
    return hydrostatic_interfaces(delp, pt, phis, ptop)
