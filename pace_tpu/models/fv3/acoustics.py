"""Acoustic-timestep loop (hydrostatic path): c_sw -> p_grad_c -> d_sw ->
hydrostatic PGF, n_split times.

TPU-native analog of ``pyFV3.stencils.dyn_core.AcousticDynamics`` (reference
role per SURVEY.md §2.3: n_split acoustic substep loop: halo updates, C-grid
then D-grid solve, pressure gradient; timer name ``DynCore``). The
nonhydrostatic branch (riem_solver_c/riem_solver3/updatedz/nh_p_grad) is added
in pace_tpu.models.fv3.nonhydro.

Corner-fold protocol (see pace_tpu.parallel.topology): every sweep direction
gets ghost data folded for that direction — u is y-swept (use fold="y"), v is
x-swept (fold="x"), each transported scalar gets both folds, and the a2b input
for the pressure gradient uses fold="x" (its x-stage is applied first).
"""

from __future__ import annotations

import dataclasses

import jax

import jax.numpy as jnp

from ...ops.c_sw import c_sw
from ...ops.d_sw import DSWConfig, DSWResult, d_sw
from ...ops.pgrad import hydrostatic_interfaces, one_grad_p, p_grad_c


@dataclasses.dataclass(frozen=True)
class AcousticConfig:
    """Acoustic-loop parameters (subset of the reference AcousticDynamicsConfig,
    name parity with reference tests/main/fv3core/test_config.py:11-17)."""

    n_split: int = 1
    hydrostatic: bool = True
    d_sw: DSWConfig = dataclasses.field(default_factory=DSWConfig)
    # nonhydrostatic params (used by models.fv3.nonhydro)
    a_imp: float = 1.0
    p_fac: float = 0.05
    beta: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AcousticResult:
    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray | None
    delp: jnp.ndarray
    pt: jnp.ndarray
    # accumulated over the n_split substeps, for tracer transport
    mfxd: jnp.ndarray
    mfyd: jnp.ndarray
    cxd: jnp.ndarray
    cyd: jnp.ndarray
    xfxd: jnp.ndarray
    yfxd: jnp.ndarray


def acoustic_loop(
    u,
    v,
    w,
    delp,
    pt,
    phis,
    grid,
    halo,
    config: AcousticConfig,
    dt_atmos_k: float,
) -> AcousticResult:
    """Run ``n_split`` acoustic substeps of length dt_atmos_k / n_split.

    Inputs are raw stacked arrays (S, [K,] Y, X); ``pt`` is virtual potential
    temperature, ``phis`` surface geopotential (S, Y, X).
    """
    if not config.hydrostatic:
        raise NotImplementedError("nonhydrostatic path lives in models.fv3.nonhydro")
    dt = dt_atmos_k / config.n_split
    dt2 = 0.5 * dt
    ptop = grid.ptop

    def substep(carry, _):
        u, v, w, delp, pt, acc = carry
        res = _one_substep(u, v, w, delp, pt, phis, grid, halo, config, dt, dt2, ptop)
        acc_new = tuple(a + b for a, b in zip(acc, res[5:]))
        return (res[0], res[1], res[2], res[3], res[4], acc_new), None

    # zero accumulators shaped like one substep's transport quantities
    S = u.shape[0]
    K = u.shape[1] if u.ndim == 4 else 1
    zx = jnp.zeros_like(v)  # (S, K, Y, X+1) x-interface shaped
    zy = jnp.zeros_like(u)  # (S, K, Y+1, X)
    acc0 = (zx, zy, zx, zy, zx, zy)  # mfx, mfy, cx, cy, xfx, yfx
    del S, K

    if config.n_split == 1:
        (u, v, w, delp, pt, acc), _ = substep((u, v, w, delp, pt, acc0), None)
    else:
        (u, v, w, delp, pt, acc), _ = jax.lax.scan(
            substep, (u, v, w, delp, pt, acc0), None, length=config.n_split
        )
    mfxd, mfyd, cxd, cyd, xfxd, yfxd = acc

    return AcousticResult(
        u=u,
        v=v,
        w=w,
        delp=delp,
        pt=pt,
        mfxd=mfxd,
        mfyd=mfyd,
        cxd=cxd,
        cyd=cyd,
        xfxd=xfxd,
        yfxd=yfxd,
    )


def _one_substep(u, v, w, delp, pt, phis, grid, halo, config, dt, dt2, ptop):
    """One acoustic substep; returns (u, v, w, delp, pt, mfx, mfy, cx, cy,
    xfx, yfx)."""
    if True:  # noqa: keep original indentation of the substep body
        u_x, v_x = halo.update_vector(u, v, kind="dgrid", fold="x")
        u_y, v_y = halo.update_vector(u, v, kind="dgrid", fold="y")
        delp_x = halo.update_scalar(delp, fold="x")
        delp_y = halo.update_scalar(delp, fold="y")
        pt_x = halo.update_scalar(pt, fold="x")
        pt_y = halo.update_scalar(pt, fold="y")
        w_x = w_y = None
        if w is not None:
            w_x = halo.update_scalar(w, fold="x")
            w_y = halo.update_scalar(w, fold="y")

        # --- C-grid half step + its pressure gradient
        cg = c_sw(u_y, v_x, delp_x, pt_x, grid, halo, dt2)
        _pe, _peln, pkc, _pkz, gz_c = hydrostatic_interfaces(
            cg.delpc, cg.ptc, phis, ptop
        )
        uc, vc = p_grad_c(cg.uc, cg.vc, pkc, gz_c, grid, dt2)
        uc, vc = halo.sync_vector_interfaces(uc, vc, kind="cgrid")
        uc_x, vc_x = halo.update_vector(uc, vc, kind="cgrid", fold="x")
        uc_y, vc_y = halo.update_vector(uc, vc, kind="cgrid", fold="y")

        # --- D-grid full step
        ds: DSWResult = d_sw(
            u_y,
            v_x,
            w_x,
            delp_x,
            delp_y,
            pt_x,
            pt_y,
            w_x,
            w_y,
            uc_x,
            vc_x,
            uc_y,
            vc_y,
            cg.divg_d,
            grid,
            halo,
            dt,
            config.d_sw,
        )
        u, v, delp, pt = ds.u, ds.v, ds.delp, ds.pt
        if w is not None:
            w = ds.w

        # --- hydrostatic pressure-gradient (forward-backward: new delp/pt)
        delp_h = halo.update_scalar(delp, fold="x")
        pt_h = halo.update_scalar(pt, fold="x")
        _pe, _peln, pk, _pkz, gz = hydrostatic_interfaces(delp_h, pt_h, phis, ptop)
        u, v = one_grad_p(u, v, pk, gz, grid, dt)
        u, v = halo.sync_vector_interfaces(u, v, kind="dgrid")
        delp, pt = delp_h, pt_h

    return (u, v, w, delp, pt, ds.mfx, ds.mfy, ds.crx, ds.cry, ds.xfx, ds.yfx)
