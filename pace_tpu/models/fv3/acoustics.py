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

from ... import constants
from ...ops.c_sw import c_sw
from ...ops.d_sw import DSWConfig, DSWResult, d_sw
from ...ops.hydro_pallas import hydrostatic_interfaces_best
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
    #: cap on the per-substep dissipation-heating temperature increment,
    #: |dT| <= delt_max * dt [K] (reference temperature_adjust delt_max)
    delt_max: float = 0.002
    #: rf_fast: apply Rayleigh damping per acoustic substep (reference
    #: ray_fast inside dyn_core); off -> once per k_split step in the tail
    rf_fast: bool = False
    rf_cutoff: float = 750.0
    tau: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AcousticResult:
    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray | None
    delp: jnp.ndarray
    pt: jnp.ndarray
    delz: jnp.ndarray | None
    # accumulated over the n_split substeps, for tracer transport
    mfxd: jnp.ndarray
    mfyd: jnp.ndarray
    cxd: jnp.ndarray
    cyd: jnp.ndarray
    xfxd: jnp.ndarray
    yfxd: jnp.ndarray
    #: damping-dissipated KE accumulated over the substeps [J/kg]
    #: (reference diss_est/diss_estd diagnostic)
    diss_est: jnp.ndarray | None = None


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
    delz=None,
    checkpointer=None,
) -> AcousticResult:
    """Run ``n_split`` acoustic substeps of length dt_atmos_k / n_split.

    Inputs are raw stacked arrays (S, [K,] Y, X); ``pt`` is virtual potential
    temperature, ``phis`` surface geopotential (S, Y, X). Nonhydrostatic mode
    additionally carries ``w`` and ``delz``.
    """
    if not config.hydrostatic and (w is None or delz is None):
        raise ValueError("nonhydrostatic mode requires w and delz")
    use_beta = config.beta != 0.0
    dt = dt_atmos_k / config.n_split
    dt2 = 0.5 * dt
    ptop = grid.ptop

    track_heat = config.d_sw.d_con > 0.0 or config.d_sw.vtdm4 > 0.0

    # phis is constant over the substeps: exchange its halo once here
    phis_folds = halo.update_scalar_folds(phis)

    # beta off-centering (reference dyn_core split PGF, the `beta` namelist
    # the c192 perf config sets): each substep applies
    # (1-beta)*PGF(new state) + beta*PGF carried from the previous substep.
    # The carried increment is seeded with the PGF of the INITIAL state
    # (one extra evaluation, only when beta != 0 — matching the reference's
    # beta>0 loop-entry one_grad_p).
    # Nonhydrostatic beta: the off-centered PGF needs the previous substep's
    # nonhydrostatic pressure increment, which has no analog in the initial
    # state (pp comes out of the Riemann solve) — so the FIRST substep
    # applies the full PGF and blending starts at substep 2 (run outside
    # the scan; see below).
    dugf0 = None
    if use_beta and config.hydrostatic:
        delp_h0, pt_h0 = halo.update_scalars([delp, pt], fold="x")
        _pe0, _pl0, pk0, _pz0, gz0 = hydrostatic_interfaces(
            delp_h0, pt_h0, phis, ptop
        )
        u0p, v0p = one_grad_p(u, v, pk0, gz0, grid, dt)
        dugf0 = (u0p - u, v0p - v)

    def substep(carry, _):
        u, v, w, delp, pt, delz, acc, dugf = carry
        res = _one_substep(
            u, v, w, delp, pt, delz, phis, grid, halo, config, dt, dt2, ptop,
            checkpointer=checkpointer, phis_folds=phis_folds, dugf_prev=dugf,
        )
        n_acc = 7 if track_heat else 6
        acc_new = tuple(a + b for a, b in zip(acc, res[6 : 6 + n_acc]))
        dugf_new = res[6 + n_acc] if use_beta else None
        return (
            res[0], res[1], res[2], res[3], res[4], res[5], acc_new, dugf_new,
        ), None

    # zero accumulators shaped like one substep's transport quantities
    zx = jnp.zeros_like(v)  # (S, K, Y, X+1) x-interface shaped
    zy = jnp.zeros_like(u)  # (S, K, Y+1, X)
    acc0 = (zx, zy, zx, zy, zx, zy)  # mfx, mfy, cx, cy, xfx, yfx
    if track_heat:
        acc0 = acc0 + (jnp.zeros_like(delp),)

    carry0 = (u, v, w, delp, pt, delz, acc0, dugf0)
    if config.n_split == 1:
        (u, v, w, delp, pt, delz, acc, _dugf), _ = substep(carry0, None)
    elif use_beta and dugf0 is None:
        # nonhydro beta: full-PGF first substep outside the scan seeds the
        # carried increment; the remaining n_split-1 substeps blend
        carry1, _ = substep(carry0, None)
        (u, v, w, delp, pt, delz, acc, _dugf), _ = jax.lax.scan(
            substep, carry1, None, length=config.n_split - 1
        )
    else:
        (u, v, w, delp, pt, delz, acc, _dugf), _ = jax.lax.scan(
            substep, carry0, None, length=config.n_split
        )
    mfxd, mfyd, cxd, cyd, xfxd, yfxd = acc[:6]
    diss = acc[6] if track_heat else None

    return AcousticResult(
        u=u,
        v=v,
        w=w,
        delp=delp,
        pt=pt,
        delz=delz,
        mfxd=mfxd,
        mfyd=mfyd,
        cxd=cxd,
        cyd=cyd,
        xfxd=xfxd,
        yfxd=yfxd,
        diss_est=diss,
    )


def _one_substep(u, v, w, delp, pt, delz, phis, grid, halo, config, dt, dt2,
                 ptop, checkpointer=None, phis_folds=None, dugf_prev=None):
    """One acoustic substep; returns (u, v, w, delp, pt, delz, mfx, mfy, cx,
    cy, xfx, yfx[, heat][, (du_pgf, dv_pgf)]). ``dugf_prev``: the previous
    substep's D-grid pressure-gradient increments when beta off-centering
    is active (hydrostatic only)."""
    hydro = config.hydrostatic
    from ...ops.folds import CornerPatch

    # ---- async scalar exchange (reference start_halo_update(...).wait(),
    # VERDICT r2 #3): the scalar-batch collectives are ISSUED here; the
    # D-grid vector exchange + its slab assembly run while they are in
    # flight (no data dependence — asserted by tests/main/test_halo_overlap).
    # delp/pt/w y-folds are consumed only by fvtp2d kernels, which accept
    # the fold as (x-fold + corner pack) — the full y-fold arrays are never
    # materialized in HBM (round-5 halo-bytes attack). delz needs real full
    # folds (its y-fold feeds the updatedz height cumsum).
    fields = [delp, pt]
    if w is not None:
        fields.append(w)
    scalar_hdl = halo.start_update_scalars_fold_patches(fields)
    # only the consumed folds: u is y-swept, v x-swept (module header) —
    # u_x/v_y have no consumer, so they are never materialized
    u_y, v_x = halo.update_vector_fold_pair(u, v, kind="dgrid")
    w_x = w_y = None
    delz_y = None
    if delz is not None:
        if w is not None:
            delz, delz_y = halo.update_scalar_folds(delz)
        else:
            delz = halo.update_scalar(delz, fold="x")
    if w is not None:
        (delp_x, delp_p), (pt_x, pt_p), (w_x, w_p) = scalar_hdl.wait()
        w_y = CornerPatch(w_p)
    else:
        (delp_x, delp_p), (pt_x, pt_p) = scalar_hdl.wait()
    delp_y = CornerPatch(delp_p)
    pt_y = CornerPatch(pt_p)

    # --- C-grid half step + its pressure gradient
    if checkpointer is not None:
        checkpointer("C_SW-In", u=u, v=v, delp=delp, pt=pt)
    with jax.named_scope("C_SW"):
        cg = c_sw(u_y, v_x, delp_x, pt_x, grid, halo, dt2)
    if checkpointer is not None:
        checkpointer("C_SW-Out", uc=cg.uc, vc=cg.vc, delpc=cg.delpc, ptc=cg.ptc)
    if hydro:
        _pe, _peln, pkc, pkz_c, gz_c = hydrostatic_interfaces_best(
            cg.delpc, cg.ptc, phis, ptop, need=("pk", "pkz", "gz")
        )
        uc, vc = p_grad_c(cg.uc, cg.vc, pkc, gz_c, grid, dt2)
    else:
        from ...ops.nonhydro import (
            heights_from_delz, riem_solver_c, updatedz_c,
        )

        _pe, _peln, _pk, pkz_c, _gz = hydrostatic_interfaces_best(
            cg.delpc, cg.ptc, phis, ptop, need=("pkz",)
        )
        pkz_h = pkz_c
        # --- updatedzc (reference update_dz_c; VERDICT r2 #7): advect the
        # interface heights with the C-grid contravariant winds so the
        # provisional Riemann solve sees heights consistent with the
        # advected delpc/ptc, and the terrain-following ws they imply
        if delz_y is None:
            delz_y = halo.update_scalar(delz, fold="y")
        if phis_folds is None:
            phis_folds = halo.update_scalar_folds(phis)
        phis_cx, phis_cy = phis_folds
        with jax.named_scope("UpdateDZ"):
            zh_cx = heights_from_delz(delz, phis_cx)
            zh_cy = heights_from_delz(delz_y, phis_cy)
            zh_c, ws_c = updatedz_c(zh_cx, zh_cy, cg.xfx, cg.yfx, grid, dt2)
        delz_c = zh_c[..., 1:, :, :] - zh_c[..., :-1, :, :]
        with jax.named_scope("RiemannC"):
            pe_full_c, delz_c_new = riem_solver_c(
                w_x, delz_c, cg.ptc, cg.delpc, pkz_h, ws_c, dt2, ptop,
                a_imp=config.a_imp, p_fac=config.p_fac,
            )
        # p_grad_c heights from the SOLVED provisional thicknesses
        # (reference recomputes gz from the updated dz after Riem_Solver_C)
        gz_c = heights_from_delz(delz_c_new, phis) * constants.GRAV
        # contour PGF with full pressure in Pa (reference p_grad_c nonhydro)
        uc, vc = p_grad_c(cg.uc, cg.vc, pe_full_c, gz_c, grid, dt2)
    uc, vc = halo.sync_vector_interfaces(uc, vc, kind="cgrid")
    (uc_x, vc_x), (uc_y, vc_y) = halo.update_vector_folds(uc, vc, kind="cgrid")

    # --- D-grid full step
    with jax.named_scope("D_SW"):
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
    if checkpointer is not None:
        checkpointer("D_SW-Out", u=u, v=v, delp=delp, pt=pt, w=w)
    heat = ds.heat
    if heat is not None and config.d_sw.d_con > 0.0:
        # dissipation heating (reference temperature_adjust, d_con fraction):
        # dT = d_con*heat/cv_air capped at +-delt_max*dt (the reference's
        # delt_max clamp against spurious hot spots at strong shear); pt is
        # potential temperature so divide by the mid-substep Exner function
        d_t = (config.d_sw.d_con / constants.CV_AIR) * heat
        cap = config.delt_max * abs(dt)
        pt = pt + jnp.clip(d_t, -cap, cap) / pkz_c

    delp_h, pt_h = halo.update_scalars([delp, pt], fold="x")
    dugf_new = None
    if hydro:
        # --- hydrostatic pressure-gradient (forward-backward: new delp/pt)
        _pe, _peln, pk, _pkz, gz = hydrostatic_interfaces_best(
            delp_h, pt_h, phis, ptop, need=("pk", "gz")
        )
        with jax.named_scope("PGradD"):
            if dugf_prev is not None:
                # beta off-centering: (1-beta)*PGF(new) + beta*PGF(previous)
                beta = config.beta
                u2, v2 = one_grad_p(u, v, pk, gz, grid, dt)
                du, dv = u2 - u, v2 - v
                u = u + (1.0 - beta) * du + beta * dugf_prev[0]
                v = v + (1.0 - beta) * dv + beta * dugf_prev[1]
                dugf_new = (du, dv)
            else:
                u, v = one_grad_p(u, v, pk, gz, grid, dt)
    else:
        from ...ops.nonhydro import (
            heights_from_delz,
            nh_p_grad,
            riem_solver3,
            updatedz_d,
        )

        # advect interface heights with the substep fluxes, derive the
        # terrain-following surface w, then the implicit vertical solve
        # (phis exchanged per fold so corner-slot surface heights match the
        # fold of each sweep; its halo is refreshed once per acoustic call —
        # phis is constant over the substeps)
        # interface heights already built for updatedz_c from the SAME delz
        # and phis folds — reuse (saves two reverse-cumsum passes/substep)
        phis_x, _phis_y = phis_folds
        zh, zh_y = zh_cx, zh_cy
        with jax.named_scope("UpdateDZ"):
            zh_adv = updatedz_d(
                zh, zh_y, ds.crx, ds.cry, ds.xfx, ds.yfx, grid, dt
            )
        zs = zh[..., -1:, :, :]
        ws = (zh_adv[..., -1:, :, :] - zs)[..., 0, :, :] / dt
        zh_adv = jnp.concatenate([zh_adv[..., :-1, :, :], zs], axis=-3)
        delz = zh_adv[..., 1:, :, :] - zh_adv[..., :-1, :, :]

        _pe, _peln, pk_h, pkz_h, _gz = hydrostatic_interfaces_best(
            delp_h, pt_h, phis, ptop, need=("pk", "pkz")
        )
        with jax.named_scope("Riemann3"):
            w, delz, pp = riem_solver3(
                w, delz, pt_h, delp_h, pkz_h, ws, dt, ptop,
                a_imp=config.a_imp, p_fac=config.p_fac,
            )
        # the solver's halo columns used garbage ws (fluxes are only valid on
        # the domain); refresh ghosts with owner values before the a2b reads
        w, delz = halo.update_scalars([w, delz], fold="x")
        pp = halo.update_scalar(pp, fold="x")
        gz_if = heights_from_delz(delz, phis_x) * constants.GRAV
        with jax.named_scope("PGradD"):
            from ...ops._dispatch import use_pallas

            if use_pallas("pgrad") and u.dtype == jnp.float32:
                # fused kernel: all four a2b interpolations + both contour
                # PGF evaluations in VMEM (~9 HBM passes instead of ~40;
                # measured 25% of the C192 step in the XLA form)
                from ...ops.pgrad_pallas import nh_p_grad_pallas

                u2, v2 = nh_p_grad_pallas(
                    u, v, pk_h, gz_if, pp, delp_h, grid, dt
                )
            else:
                u2, v2 = nh_p_grad(u, v, pk_h, gz_if, pp, delp_h, grid, dt)
            if config.beta != 0.0:
                # beta off-centering for the nonhydro PGF: same blend as
                # the hydrostatic branch, seeded by the full-PGF first
                # substep (see acoustic_loop)
                du, dv = u2 - u, v2 - v
                if dugf_prev is not None:
                    beta = config.beta
                    u = u + (1.0 - beta) * du + beta * dugf_prev[0]
                    v = v + (1.0 - beta) * dv + beta * dugf_prev[1]
                else:
                    u, v = u2, v2
                dugf_new = (du, dv)
            else:
                u, v = u2, v2
    if config.rf_fast and config.tau > 0.0:
        # rf_fast: Rayleigh damping INSIDE the acoustic substep (reference
        # ray_fast runs per-substep in dyn_core when rf_fast=.true.; the
        # slow path applies it once per k_split step in fv_dynamics' tail).
        # Like the reference, the damping profile uses the STATIC reference
        # pressure (ak/bk at p_ref) — a (K,) vector, so the extra per-substep
        # work is just two broadcasted multiplies, no evolving-pressure
        # cumsum in the hot loop
        from ...ops.dycore_extras import ray_fast

        pe_ref = grid.ak + grid.bk * constants.P_REF  # (K+1,)
        pmid_ref = 0.5 * (pe_ref[1:] + pe_ref[:-1])
        # broadcast lazily to the layer shape (XLA fuses it into the damp
        # multiplies — no materialized array)
        pe_mid = jnp.broadcast_to(pmid_ref[:, None, None], delp_h.shape[-3:])
        u, v, w = ray_fast(
            u, v, w, pe_mid, dt, ptop, config.rf_cutoff, config.tau
        )
    u, v = halo.sync_vector_interfaces(u, v, kind="dgrid")
    delp, pt = delp_h, pt_h

    out = (
        u, v, w, delp, pt, delz,
        ds.mfx, ds.mfy, ds.crx, ds.cry, ds.xfx, ds.yfx,
    )
    if heat is not None:
        out = out + (heat,)
    if dugf_new is not None:
        out = out + (dugf_new,)
    return out

