"""Physics driver + dycore coupling.

TPU-native analog of ``pySHiELD.Physics`` (reference construction at
driver/pace/driver/driver.py:509-514, call at :653) together with
``pySHiELD.update.update_atmos_state.{DycoreToPhysics, UpdateAtmosphereState}``
(driver.py:519-537, 646-661): copy/transform dycore state to physics
variables, run the scheme(s), apply tendencies back. The reference registry
key "GFS_microphysics" is preserved (reference PHYSICS_PACKAGES,
translate_driver.py:13,48).

Coupling math: the dycore's prognostic pt is virtual potential temperature;
physics operates on temperature T = pt * pkz / (1 + zvir qv). Moisture and
temperature updates are applied back preserving that relation. Wind
tendencies (future PBL schemes) flow through ``apply_wind_tendencies`` which
projects A-grid Cartesian tendency vectors onto the D-grid covariant points.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import constants
from ..fv3.state import DycoreState, TRACER_NAMES
from .microphysics import MicrophysicsConfig, microphysics_step

PHYSICS_PACKAGES = (
    "GFS_microphysics", "GFS_PBL", "GFS_shallow_convection",
    "GFS_deep_convection", "held_suarez", "gray_radiation",
    "band_radiation", "RJ_simple_physics",
)

_IQ = {name: i for i, name in enumerate(TRACER_NAMES)}


@dataclasses.dataclass
class PhysicsState:
    """Physics-side state container (reference pySHiELD.PhysicsState analog,
    docs/physics/state.rst): dycore-copied fields on the A grid."""

    qvapor: jnp.ndarray
    qliquid: jnp.ndarray
    qice: jnp.ndarray
    qrain: jnp.ndarray
    qsnow: jnp.ndarray
    qgraupel: jnp.ndarray
    pt: jnp.ndarray  # temperature [K]
    delp: jnp.ndarray
    p_mid: jnp.ndarray
    precip: jnp.ndarray | None = None


def dycore_to_physics(state: DycoreState) -> PhysicsState:
    """Reference DycoreToPhysics analog: copy/transform dycore -> physics."""
    qv = state.q[:, _IQ["qvapor"]]
    pkz = state.pkz
    t = state.pt * pkz / (1.0 + constants.ZVIR * qv)
    p_mid = 0.5 * (state.pe[..., 1:, :, :] + state.pe[..., :-1, :, :])
    return PhysicsState(
        qvapor=qv,
        qliquid=state.q[:, _IQ["qliquid"]],
        qice=state.q[:, _IQ["qice"]],
        qrain=state.q[:, _IQ["qrain"]],
        qsnow=state.q[:, _IQ["qsnow"]],
        qgraupel=state.q[:, _IQ["qgraupel"]],
        pt=t,
        delp=state.delp,
        p_mid=p_mid,
    )


def update_atmosphere_state(state: DycoreState, phy: PhysicsState) -> DycoreState:
    """Reference UpdateAtmosphereState analog: apply physics updates back to
    the dycore state (moisture + temperature -> theta_v)."""
    q = state.q
    for name, arr in (
        ("qvapor", phy.qvapor),
        ("qliquid", phy.qliquid),
        ("qice", phy.qice),
        ("qrain", phy.qrain),
        ("qsnow", phy.qsnow),
        ("qgraupel", phy.qgraupel),
    ):
        q = q.at[:, _IQ[name]].set(arr)
    pt_new = phy.pt * (1.0 + constants.ZVIR * phy.qvapor) / state.pkz
    return dataclasses.replace(state, q=q, pt=pt_new)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TendencyState:
    """Physics wind/temperature tendencies on the A grid (reference
    ``TendencyState`` with u_dt/v_dt/pt_dt, driver/pace/driver/state.py:52-61)."""

    u_dt: jnp.ndarray
    v_dt: jnp.ndarray
    pt_dt: jnp.ndarray

    @classmethod
    def init_zeros(cls, like) -> "TendencyState":
        z = jnp.zeros_like(like)
        return cls(u_dt=z, v_dt=z, pt_dt=z)


def dry_convective_adjustment(pt, q, delp, dt: float, tau: float,
                              n_sweeps: int = 2):
    """fv_sg_adj: relax statically unstable columns toward a mixed state
    (reference DycoreToPhysics do_dry_convective_adjust, driven by the
    fv_sg_adj namelist timescale; reference fv_subgrid_z mixes T/q/winds —
    winds are left untouched here and noted as a difference).

    ``pt`` is virtual potential temperature (S, K, Y, X) with k increasing
    DOWNWARD; instability = theta_v increasing with k. Red-black pairwise
    mass-weighted mixing of adjacent layers, ``n_sweeps`` passes, relaxed
    with factor min(1, dt/tau).
    """
    relax = min(1.0, dt / max(tau, 1e-30))
    pt0, q0 = pt, q

    def mix_pair(pt, q, k0):
        up = pt[..., k0:-1:2, :, :]
        lo = pt[..., k0 + 1 :: 2, :, :]
        n = min(up.shape[-3], lo.shape[-3])
        up, lo = up[..., :n, :, :], lo[..., :n, :, :]
        m_u = delp[..., k0 : k0 + 2 * n : 2, :, :][..., :n, :, :]
        m_l = delp[..., k0 + 1 : k0 + 1 + 2 * n : 2, :, :][..., :n, :, :]
        unstable = up < lo  # theta_v growing downward = unstable
        mixed = (up * m_u + lo * m_l) / (m_u + m_l)
        new_up = jnp.where(unstable, mixed, up)
        new_lo = jnp.where(unstable, mixed, lo)
        pt = pt.at[..., k0 : k0 + 2 * n : 2, :, :].set(new_up)
        pt = pt.at[..., k0 + 1 : k0 + 1 + 2 * n : 2, :, :].set(new_lo)
        # mix the tracer block with the same mass weights where unstable
        qu = q[..., k0 : k0 + 2 * n : 2, :, :][..., :n, :, :]
        ql_ = q[..., k0 + 1 : k0 + 1 + 2 * n : 2, :, :][..., :n, :, :]
        mu = m_u[:, None] if q.ndim == pt.ndim + 1 else m_u
        ml = m_l[:, None] if q.ndim == pt.ndim + 1 else m_l
        uns_q = unstable[:, None] if q.ndim == pt.ndim + 1 else unstable
        qmix = (qu * mu + ql_ * ml) / (mu + ml)
        q = q.at[..., k0 : k0 + 2 * n : 2, :, :].set(
            jnp.where(uns_q, qmix, qu)
        )
        q = q.at[..., k0 + 1 : k0 + 1 + 2 * n : 2, :, :].set(
            jnp.where(uns_q, qmix, ql_)
        )
        return pt, q

    for _ in range(n_sweeps):
        pt, q = mix_pair(pt, q, 0)
        pt, q = mix_pair(pt, q, 1)
    pt = pt0 + relax * (pt - pt0)
    q = q0 + relax * (q - q0)
    return pt, q


class Physics:
    """Reference ``pySHiELD.Physics`` analog. Integrated schemes:
    GFS_microphysics (the reference's only integrated scheme,
    docs/physics/index.rst:5-8) and GFS_PBL (the K-profile/implicit-diffusion
    boundary layer the reference ports standalone — see pbl.py)."""

    def __init__(self, grid, schemes, timestep: float, config=None,
                 fv_sg_adj: float = 0.0, pbl_config=None,
                 radiation_config=None, sas_config=None,
                 deep_config=None, surface_config=None, halo=None,
                 checkpointer=None, held_suarez_config=None,
                 band_radiation_config=None):
        for s in schemes:
            if s not in PHYSICS_PACKAGES:
                raise ValueError(
                    f"unknown physics scheme {s!r}; available: {PHYSICS_PACKAGES}"
                )
        self.schemes = tuple(schemes)
        self.timestep = float(timestep)
        self.config = config or MicrophysicsConfig()
        if pbl_config is None:
            from .pbl import PBLConfig

            pbl_config = PBLConfig()
        self.pbl_config = pbl_config
        if radiation_config is None:
            from .radiation import GrayRadiationConfig

            radiation_config = GrayRadiationConfig()
        self.radiation_config = radiation_config
        if sas_config is None:
            from .sas import ShallowConvectionConfig

            sas_config = ShallowConvectionConfig()
        self.sas_config = sas_config
        if deep_config is None:
            from .sas import DeepConvectionConfig

            deep_config = DeepConvectionConfig()
        self.deep_config = deep_config
        if held_suarez_config is None:
            from .held_suarez import HeldSuarezConfig

            held_suarez_config = HeldSuarezConfig()
        self.held_suarez_config = held_suarez_config
        if band_radiation_config is None:
            from .band_radiation import BandRadiationConfig

            band_radiation_config = BandRadiationConfig()
        self.band_radiation_config = band_radiation_config
        from .simple_physics import SimplePhysicsConfig

        self.simple_physics_config = SimplePhysicsConfig()
        self.halo = halo  # for the tendency halo update (None = zero halos)
        #: optional stage checkpointer (pace_tpu.testing.checkpointer) fired
        #: at Physics-In/Physics-Out — the reference's physics savepoint
        #: analog; like the dycore's, checkpointed calls run EAGERLY
        self.checkpointer = checkpointer
        self.grid = grid
        self.fv_sg_adj = float(fv_sg_adj)
        # interactive lower boundary (surface.py): LSM or sea ice carried as
        # Physics-held state, threaded functionally through the jitted step
        from .surface import SurfaceConfig, build_surface

        if surface_config is None:
            surface_config = SurfaceConfig()
        self.surface_config = surface_config
        self._surface = build_surface(surface_config, grid=lambda: self.grid)
        self.surface_state = None
        self._call = jax.jit(self._call_impl)

    def __call__(self, state: DycoreState,
                 time_seconds: float = 0.0) -> DycoreState:
        t = jnp.asarray(time_seconds, dtype=jnp.float32)
        call = self._call_impl if self.checkpointer is not None else self._call
        if self._surface is not None:
            if self.surface_state is None:
                _, init, _, _ = self._surface
                self.surface_state = init(
                    state.ps.shape, state.ps.dtype
                )
            state, self.surface_state = call(state, self.surface_state, t)
            return state
        state, _ = call(state, None, t)
        return state

    def _a_grid_winds(self, state: DycoreState):
        """Contravariant A-grid winds from the D-grid state (d2a2c center leg)."""
        from ...ops.d2a2c import cartesian_wind_centers
        from ...ops.stencil_utils import bcast_k

        grid = self.grid
        vcart = cartesian_wind_centers(state.u, state.v, grid)
        u_cov = jnp.sum(vcart * bcast_k(grid.ec1, vcart), axis=-3)
        v_cov = jnp.sum(vcart * bcast_k(grid.ec2, vcart), axis=-3)
        rsin2 = bcast_k(grid.rsin2, u_cov)
        cosa_s = bcast_k(grid.cosa_s, u_cov)
        ua = (u_cov - v_cov * cosa_s) * rsin2
        va = (v_cov - u_cov * cosa_s) * rsin2
        return ua, va

    def _pbl(self, state: DycoreState, shf=None, lhf=None) -> DycoreState:
        from .pbl import pbl_step

        grid = self.grid
        ua, va = self._a_grid_winds(state)

        qv = state.q[:, _IQ["qvapor"]]
        pkz = state.pkz
        t = state.pt * pkz / (1.0 + constants.ZVIR * qv)
        p_mid = 0.5 * (state.pe[..., 1:, :, :] + state.pe[..., :-1, :, :])
        u_dt, v_dt, t_new, qv_new, _h = pbl_step(
            ua, va, t, qv, state.pe, p_mid, state.delp, state.phis,
            self.timestep, self.pbl_config,
            sensible_heat_flux=shf, latent_heat_flux=lhf,
        )
        u_new, v_new = apply_wind_tendencies(
            state.u, state.v, u_dt, v_dt, grid, self.timestep,
            halo=self.halo,
        )
        pt_new = t_new * (1.0 + constants.ZVIR * qv_new) / pkz
        q_new = state.q.at[:, _IQ["qvapor"]].set(qv_new)
        return dataclasses.replace(
            state, u=u_new, v=v_new, pt=pt_new, q=q_new
        )

    def _sas(self, state: DycoreState, cfg, shf=None, lhf=None):
        """Run one SAS mass-flux pass (shallow or deep per ``cfg.mode``);
        returns (state, precip_rate)."""
        from .sas import sas_step

        ua, va = self._a_grid_winds(state)
        qv = state.q[:, _IQ["qvapor"]]
        ql = state.q[:, _IQ["qliquid"]]
        pkz = state.pkz
        t = state.pt * pkz / (1.0 + constants.ZVIR * qv)
        p_mid = 0.5 * (state.pe[..., 1:, :, :] + state.pe[..., :-1, :, :])
        u_dt, v_dt, t_new, qv_new, ql_new, precip = sas_step(
            ua, va, t, qv, ql, state.pe, p_mid, state.delp, self.timestep,
            cfg, sensible_heat_flux=shf, latent_heat_flux=lhf,
        )
        u_new, v_new = apply_wind_tendencies(
            state.u, state.v, u_dt, v_dt, self.grid, self.timestep,
            halo=self.halo,
        )
        pt_new = t_new * (1.0 + constants.ZVIR * qv_new) / pkz
        q_new = state.q.at[:, _IQ["qvapor"]].set(qv_new)
        q_new = q_new.at[:, _IQ["qliquid"]].set(ql_new)
        return dataclasses.replace(
            state, u=u_new, v=v_new, pt=pt_new, q=q_new
        ), precip

    def _surface_forcing(self, state: DycoreState, sw_dn, lw_dn, sfc):
        """Assemble the lowest-model-level forcing dict lsm_step/seaice_step
        take; prescribed-constant radiation when gray_radiation is off."""
        qv1 = state.q[:, _IQ["qvapor"], -1, :, :]
        t1 = (
            state.pt[..., -1, :, :] * state.pkz[..., -1, :, :]
            / (1.0 + constants.ZVIR * qv1)
        )
        ua, va = self._a_grid_winds(state)
        wind1 = jnp.sqrt(
            ua[..., -1, :, :] ** 2 + va[..., -1, :, :] ** 2
        )
        pe_b = state.pe[..., -1, :, :]
        pe_a = state.pe[..., -2, :, :]
        tv1 = t1 * (1.0 + constants.ZVIR * qv1)
        z1 = 0.5 * constants.RDGAS * tv1 / constants.GRAV \
            * jnp.log(pe_b / pe_a)
        cfg = self.surface_config
        if sw_dn is None:
            sw_dn = jnp.full_like(t1, cfg.sw_dn)
        if lw_dn is None:
            lw_dn = jnp.full_like(t1, cfg.lw_dn)
        return dict(
            t1=t1, qv1=qv1, wind1=wind1, z1=z1, p_sfc=pe_b,
            sw_dn=sw_dn, lw_dn=lw_dn, precip=sfc.precip,
        )

    def _call_impl(self, state: DycoreState, sfc, time_seconds=0.0):
        ckpt = self.checkpointer
        if ckpt is not None:
            ckpt("Physics-In", u=state.u, v=state.v, pt=state.pt,
                 delp=state.delp, q=state.q)
        if self.fv_sg_adj > 0.0:
            pt_adj, q_adj = dry_convective_adjustment(
                state.pt, state.q, state.delp, self.timestep, self.fv_sg_adj
            )
            state = dataclasses.replace(state, pt=pt_adj, q=q_adj)
        if "RJ_simple_physics" in self.schemes:
            # Reed-Jablonowski 2012 simple physics (simple_physics.py): the
            # idealized-TC companion suite — condensation + bulk wind-
            # dependent ocean fluxes + PBL diffusion in one package
            from .simple_physics import simple_physics_step

            with jax.named_scope("SimplePhysics"):
                ua, va = self._a_grid_winds(state)
                qv = state.q[:, _IQ["qvapor"]]
                pkz = state.pkz
                t = state.pt * pkz / (1.0 + constants.ZVIR * qv)
                p_mid = 0.5 * (
                    state.pe[..., 1:, :, :] + state.pe[..., :-1, :, :]
                )
                u_dt, v_dt, t_new, qv_new, precip = simple_physics_step(
                    ua, va, t, qv, state.pe, p_mid, state.delp,
                    state.phis, self.timestep, self.simple_physics_config,
                )
                u_new, v_new = apply_wind_tendencies(
                    state.u, state.v, u_dt, v_dt, self.grid,
                    self.timestep, halo=self.halo,
                )
                pt_new = t_new * (1.0 + constants.ZVIR * qv_new) / pkz
                q_new = state.q.at[:, _IQ["qvapor"]].set(qv_new)
                state = dataclasses.replace(
                    state, u=u_new, v=v_new, pt=pt_new, q=q_new
                )
        if "held_suarez" in self.schemes:
            from .held_suarez import held_suarez_step

            p_mid = 0.5 * (state.pe[..., 1:, :, :] + state.pe[..., :-1, :, :])
            u_new, v_new, pt_new = held_suarez_step(
                state.u, state.v, state.pt, state.pkz, p_mid, state.ps,
                self.grid.f0, self.timestep, self.held_suarez_config,
            )
            state = dataclasses.replace(state, u=u_new, v=v_new, pt=pt_new)
        # --- radiation (also supplies the surface's downward fluxes)
        lw_dn_sfc = None
        sw_dn_sfc = None
        if "gray_radiation" in self.schemes:
            from .radiation import (
                gray_radiation_step_fluxes, sw_down_surface,
            )

            with jax.named_scope("Radiation"):
                sinlat = jnp.clip(
                    self.grid.f0 / (2.0 * constants.OMEGA), -1.0, 1.0
                )
                t_surf = None
                if sfc is not None:
                    t_surf = self._surface[3](sfc)
                pt_new, lw_dn_sfc = gray_radiation_step_fluxes(
                    state.pt, state.pkz, state.pe, state.ps,
                    sinlat * sinlat, self.timestep, self.radiation_config,
                    t_surf=t_surf, qv=state.q[:, _IQ["qvapor"]],
                )
                sw_dn_sfc = jnp.broadcast_to(
                    sw_down_surface(
                        sinlat * sinlat, self.radiation_config,
                        lat=self.grid.lat_agrid, lon=self.grid.lon_agrid,
                        time_seconds=time_seconds,
                    ),
                    state.ps.shape,
                )
                state = dataclasses.replace(state, pt=pt_new)
        if "band_radiation" in self.schemes:
            # RRTMG-class correlated-k multi-band scheme (band_radiation.py)
            from .band_radiation import band_radiation_step_fluxes

            with jax.named_scope("Radiation"):
                qv = state.q[:, _IQ["qvapor"]]
                qc = (
                    state.q[:, _IQ["qliquid"]] + state.q[:, _IQ["qice"]]
                )
                t_surf = None
                if sfc is not None:
                    t_surf = self._surface[3](sfc)
                pt_new, lw_dn_sfc, sw_dn_sfc = band_radiation_step_fluxes(
                    state.pt, state.pkz, state.pe, state.ps,
                    self.timestep, self.band_radiation_config,
                    qv=qv, qc=qc, t_surf=t_surf,
                )
                state = dataclasses.replace(state, pt=pt_new)
        # --- interactive lower boundary: LSM / sea ice produce the surface
        # fluxes that drive the PBL and shallow convection
        shf = lhf = None
        if sfc is not None:
            with jax.named_scope("Surface"):
                forcing = self._surface_forcing(
                    state, sw_dn_sfc, lw_dn_sfc, sfc
                )
                fluxes, sfc = self._surface[2](forcing, sfc, self.timestep)
                shf = fluxes["sensible_heat_flux"]
                lhf = fluxes["latent_heat_flux"]
        if "GFS_PBL" in self.schemes:
            with jax.named_scope("PBL"):
                state = self._pbl(state, shf, lhf)
        conv_precip = None
        if "GFS_deep_convection" in self.schemes:
            with jax.named_scope("DeepConvection"):
                state, conv_precip = self._sas(
                    state, self.deep_config, shf, lhf
                )
        if "GFS_shallow_convection" in self.schemes:
            with jax.named_scope("ShallowConvection"):
                state, _ = self._sas(state, self.sas_config, shf, lhf)
        if "GFS_microphysics" not in self.schemes:
            if sfc is not None and conv_precip is not None:
                sfc = dataclasses.replace(sfc, precip=conv_precip)
            return self._finish(state, sfc)
        phy = dycore_to_physics(state)
        with jax.named_scope("Microphysics"):
            qv, ql, qi, qr, qs, qg, t, precip = microphysics_step(
                phy.qvapor,
                phy.qliquid,
                phy.qice,
                phy.qrain,
                phy.qsnow,
                phy.qgraupel,
                phy.pt,
                phy.p_mid,
                phy.delp,
                self.timestep,
                self.config,
            )
        phy = dataclasses.replace(
            phy, qvapor=qv, qliquid=ql, qice=qi, qrain=qr, qsnow=qs,
            qgraupel=qg, pt=t, precip=precip,
        )
        if sfc is not None:
            # carry this step's precipitation rate (microphysics + deep
            # convection) to next step's surface
            rate = precip / self.timestep
            if conv_precip is not None:
                rate = rate + conv_precip
            sfc = dataclasses.replace(sfc, precip=rate)
        return self._finish(update_atmosphere_state(state, phy), sfc)

    def _finish(self, state, sfc):
        if self.checkpointer is not None:
            self.checkpointer("Physics-Out", u=state.u, v=state.v,
                              pt=state.pt, delp=state.delp, q=state.q)
        return state, sfc


def apply_wind_tendencies(u, v, u_dt, v_dt, grid, dt: float, halo=None):
    """Project A-grid Cartesian-vector wind tendencies onto the D-grid points
    (reference UpdateAtmosphereState A->D wind-tendency remap analog).

    u_dt/v_dt are CONTRAVARIANT A-grid tendencies; the Cartesian tendency
    vector is interpolated to each staggered point and projected on its basis.

    Physics is column-local: halo columns carry UNDEFINED values (stale, and
    possibly inf/NaN from schemes dividing by garbage pressures there), but
    the staggered interpolation averages adjacent columns — without cleanup a
    single bad halo column poisons interior D-grid points (the deep-convection
    blowup of 2026-08-18). The reference does a halo update of the tendencies
    before the remap (SURVEY §2.4 UpdateAtmosphereState "needs communicator").
    With ``halo``: exchange the three Cartesian components (rotation-invariant
    scalars, one pass) so compute-boundary D points see real neighbor
    tendencies. Without it: zero the halo columns via `where` (NaN/inf-safe).
    """
    from ...ops.d2a2c import centers_to_x_ifaces, centers_to_y_ifaces
    from ...ops.stencil_utils import bcast_k

    du = jnp.expand_dims(u_dt, -3)
    dv = jnp.expand_dims(v_dt, -3)
    vcart = du * bcast_k(grid.ec1, du) + dv * bcast_k(grid.ec2, dv)
    if halo is not None:
        vcart = halo.update_scalar(vcart, stagger="center")
    else:
        h = grid.n_halo
        ny, nx = vcart.shape[-2], vcart.shape[-1]
        iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        interior = ((iy >= h) & (iy < ny - h) & (ix >= h) & (ix < nx - h))
        vcart = jnp.where(interior, vcart, 0.0)
    cy = centers_to_y_ifaces(vcart)  # (.., 3, Y+1, X)
    tend_u = jnp.sum(cy * bcast_k(grid.es1, cy), axis=-3)
    cx = centers_to_x_ifaces(vcart)  # (.., 3, Y, X+1)
    tend_v = jnp.sum(cx * bcast_k(grid.ew2, cx), axis=-3)
    return u + dt * tend_u, v + dt * tend_v
