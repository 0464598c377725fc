"""DynamicalCore: k_split loop of acoustic dynamics + tracer transport +
vertical remapping.

TPU-native analog of ``pyFV3.DynamicalCore`` / ``step_dynamics`` (reference
construction at driver/pace/driver/driver.py:494-504, stepping at :641-644;
internal structure per SURVEY.md §2.3/§3.2: for each of k_split outer steps —
AcousticDynamics ("DynCore"), TracerAdvection, LagrangianToEulerian
("Remapping")). The whole step is a pure function of (state, grid constants),
jitted once; halo exchanges are XLA gathers baked from static tables.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants
from ...ops.d_sw import DSWConfig
from ...ops.remapping import pe_at_u_points, pe_at_v_points, remap_field
from ...ops.tracer_advection import advect_tracers
from .acoustics import AcousticConfig, acoustic_loop
from .state import DycoreState


@dataclasses.dataclass(frozen=True)
class DynamicalCoreConfig:
    """Subset of the reference ~45-parameter DynamicalCoreConfig namelist
    (reference tests/main/fv3core/test_dycore_call.py:29-73 and
    driver/examples/configs/baroclinic_c12.yaml:41-92 for the full list;
    unimplemented parameters are accepted by the driver config layer and
    validated there)."""

    npz: int = 79
    k_split: int = 1
    n_split: int = 1
    hydrostatic: bool = True
    hord_mt: int = 6
    hord_vt: int = 6
    hord_tm: int = 6
    hord_dp: int = 6
    hord_tr: int = 8
    kord_mt: int = 9
    kord_tm: int = -9
    kord_tr: int = 9
    kord_wz: int = 9
    nord: int = 1
    d2_bg: float = 0.0
    d2_bg_k1: float = 0.0
    d2_bg_k2: float = 0.0
    d4_bg: float = 0.16
    dddmp: float = 0.0
    d_con: float = 0.0
    do_vort_damp: bool = False
    vtdm4: float = 0.0
    damp_w: float = 0.0
    ke_bg: float = 0.0
    delt_max: float = 0.002
    do_qa: bool = False
    fv_sg_adj: int = 0
    n_sponge: int = 0
    d_ext: float = 0.0
    rf_cutoff: float = 7.5e2
    rf_fast: bool = False
    tau: float = 0.0
    consv_te: float = 0.0
    z_tracer: bool = True
    fill: bool = False
    do_sat_adj: bool = False
    nwat: int = 6
    n_split_tracer: int = 1
    a_imp: float = 1.0
    p_fac: float = 0.05
    beta: float = 0.0

    def acoustic(self) -> AcousticConfig:
        return AcousticConfig(
            n_split=self.n_split,
            hydrostatic=self.hydrostatic,
            d_sw=DSWConfig(
                hord_mt=self.hord_mt,
                hord_vt=self.hord_vt,
                hord_tm=self.hord_tm,
                hord_dp=self.hord_dp,
                nord=self.nord,
                d2_bg=self.d2_bg,
                d2_bg_k1=self.d2_bg_k1,
                d2_bg_k2=self.d2_bg_k2,
                d4_bg=self.d4_bg,
                dddmp=self.dddmp,
                damp_w=self.damp_w,
                do_vort_damp=self.do_vort_damp,
                vtdm4=self.vtdm4,
                d_con=self.d_con,
            ),
            a_imp=self.a_imp,
            p_fac=self.p_fac,
            beta=self.beta,
        )


class DynamicalCore:
    """Builds a jittable step function over the stacked-shard state.

    Usage::

        core = DynamicalCore(grid_data, halo, config, dt_atmos)
        state = core.step_dynamics(state)   # jit-compiled on first call
    """

    def __init__(self, grid, halo, config: DynamicalCoreConfig, timestep: float):
        self.grid = grid
        self.halo = halo
        self.config = config
        self.timestep = float(timestep)
        self._step = jax.jit(self._step_impl)

    def step_dynamics(self, state: DycoreState) -> DycoreState:
        return self._step(state)

    # ------------------------------------------------------------------
    def _step_impl(self, state: DycoreState) -> DycoreState:
        cfg = self.config
        grid = self.grid
        halo = self.halo
        dt_k = self.timestep / cfg.k_split
        acfg = cfg.acoustic()

        u, v, w = state.u, state.v, state.w
        delp, pt, q = state.delp, state.pt, state.q
        delz = state.delz
        phis = state.phis
        if cfg.hydrostatic:
            w = None
            delz = None

        diss_acc = None
        for _ in range(cfg.k_split):
            delp0 = delp
            res = acoustic_loop(
                u, v, w, delp, pt, phis, grid, halo, acfg, dt_k, delz=delz
            )
            u, v, w, delz = res.u, res.v, res.w, res.delz
            if res.diss_est is not None:
                diss_acc = (
                    res.diss_est if diss_acc is None else diss_acc + res.diss_est
                )

            # --- tracer transport through the accumulated mass fluxes
            q, dp_traced = advect_tracers(
                q,
                delp0,
                res.cxd,
                res.cyd,
                res.xfxd,
                res.yfxd,
                res.mfxd,
                res.mfyd,
                halo,
                grid,
                hord=cfg.hord_tr,
                n_split=cfg.n_split_tracer,
            )
            delp, pt = res.delp, res.pt

            # --- vertical remap back to the hybrid reference coordinate
            u, v, w, delz, delp, pt, q, pe, peln, pk, pkz, ps = self._remap(
                u, v, w, delz, delp, pt, q
            )

            # --- auxiliary damping/adjustment (reference fv_dynamics tail:
            # del2cubed sponge, ray_fast, neg_adj3; SURVEY.md §2.3)
            from ...ops.dycore_extras import apply_sponge, neg_adj3, ray_fast

            if cfg.n_sponge > 0 and cfg.d_ext > 0.0:
                pt = apply_sponge(pt, None, grid, cfg.n_sponge, cfg.d_ext, dt_k)
            if cfg.tau > 0.0:
                pe_mid = 0.5 * (pe[..., 1:, :, :] + pe[..., :-1, :, :])
                u, v, w = ray_fast(
                    u, v, w, pe_mid, dt_k, grid.ptop, cfg.rf_cutoff, cfg.tau
                )
            if cfg.fill:
                q = neg_adj3(q, delp)

        # --- A/C-grid wind diagnostics from the post-remap D-grid winds
        # (reference keeps ua/va/uc/vc in DycoreState for physics coupling and
        # diagnostics; driver/pace/driver/state.py:119-151)
        from ...ops.d2a2c import d2a2c_vect

        u_y, _ = halo.update_vector(u, v, kind="dgrid", fold="y")
        _, v_x = halo.update_vector(u, v, kind="dgrid", fold="x")
        ua, va, uc, vc, _, _ = d2a2c_vect(u_y, v_x, grid)

        return dataclasses.replace(
            state,
            u=u,
            v=v,
            ua=ua,
            va=va,
            uc=uc,
            vc=vc,
            w=w,
            delz=delz,
            delp=delp,
            pt=pt,
            q=q,
            pe=pe,
            peln=peln,
            pk=pk,
            pkz=pkz,
            ps=ps,
            mfxd=res.mfxd,
            mfyd=res.mfyd,
            cxd=res.cxd,
            cyd=res.cyd,
            diss_estd=diss_acc,
        )

    def _remap(self, u, v, w, delz, delp, pt, q):
        """Lagrangian -> Eulerian remap of all state (reference ``Remapping``
        stage; LagrangianToEulerian per SURVEY.md §2.3)."""
        grid = self.grid
        ak = grid.ak
        bk = grid.bk
        ptop = grid.ptop

        pe1_below = ptop + jnp.cumsum(delp, axis=-3)
        top = jnp.full_like(pe1_below[..., :1, :, :], ptop)
        pe1 = jnp.concatenate([top, pe1_below], axis=-3)
        ps = pe1[..., -1, :, :]
        pe2 = ak[None, :, None, None] + bk[None, :, None, None] * ps[:, None]

        monotone = True
        pt = remap_field(pt, pe1, pe2, monotone)
        if w is not None:
            w = remap_field(w, pe1, pe2, monotone)
        if delz is not None:
            # remap the specific volume (delz per unit mass) conservatively,
            # then rebuild the extensive thickness on the new layers
            dp1 = pe1[..., 1:, :, :] - pe1[..., :-1, :, :]
            sv = remap_field(delz / dp1, pe1, pe2, monotone)
            dp2_l = pe2[..., 1:, :, :] - pe2[..., :-1, :, :]
            delz = sv * dp2_l
        q = remap_field(q, pe1[:, None], pe2[:, None], monotone)

        # winds: remap on interface-averaged pressure columns
        pe1_u = pe_at_u_points(pe1)
        pe2_u = pe_at_u_points(pe2)
        u = remap_field(u, pe1_u, pe2_u, monotone)
        pe1_v = pe_at_v_points(pe1)
        pe2_v = pe_at_v_points(pe2)
        v = remap_field(v, pe1_v, pe2_v, monotone)

        delp = pe2[..., 1:, :, :] - pe2[..., :-1, :, :]
        peln = jnp.log(pe2)
        pk = (pe2 / constants.P_REF) ** constants.KAPPA
        if delz is None:
            pkz = (pk[..., 1:, :, :] - pk[..., :-1, :, :]) / (
                constants.KAPPA * (peln[..., 1:, :, :] - peln[..., :-1, :, :])
            )
        else:
            # nonhydrostatic: layer-mean Exner from the gas law
            # p^(1-kappa) = Rd * dm * g * theta_v * P_REF^-kappa / (-delz)
            x = (
                constants.RDGAS
                * (delp / constants.GRAV)
                * pt
                / (constants.P_REF**constants.KAPPA * (-delz))
            )
            p_full = x ** (1.0 / (1.0 - constants.KAPPA))
            pkz = (p_full / constants.P_REF) ** constants.KAPPA
        return u, v, w, delz, delp, pt, q, pe2, peln, pk, pkz, ps
