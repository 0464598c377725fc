"""Interactive lower boundary: couples the LSM / sea-ice schemes into the
physics loop.

The reference leaves NOAH LSM and sea ice standalone (docs/physics/index.rst:
5-8); here they can additionally run *coupled*: the surface scheme consumes
the gray-radiation surface fluxes and the lowest-model-level state, produces
kinematic sensible/latent heat fluxes, and those drive the EDMF PBL and the
SAS shallow convection — closing the surface-flux loop that idealized runs
otherwise prescribe as constants. Precipitation from the previous step's
microphysics is carried in the surface state (one-step lag, the standard
physics-coupling pattern).

All surface fields live on dense (S, Y, X) planes (halo columns compute
harmlessly and are never read back into the dycore's compute domain), so the
coupling adds no communication and stays inside the one jitted physics step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SurfaceConfig:
    """Lower-boundary selection.

    ``type``: ``none`` (prescribed constant fluxes from the PBL/SAS configs —
    the default, matching the reference's uncoupled physics), ``land``
    (NOAH-style LSM everywhere), ``seaice`` (Semtner slab everywhere), or
    ``mixed`` (land equatorward of ``land_lat_max``, sea ice/ocean poleward —
    both schemes run dense on every column and the fluxes blend by the static
    mask, the SPMD-friendly formulation).
    """

    type: str = "none"
    lsm: Optional[dict] = None      #: LSMConfig field overrides
    seaice: Optional[dict] = None   #: SeaIceConfig field overrides
    #: for type "mixed": land where |lat| <= land_lat_max [deg], sea
    #: ice/ocean poleward of it (an analytic earthlike mask — no external
    #: land-sea dataset in this environment)
    land_lat_max: float = 55.0
    t_init: float = 288.0           #: initial skin/soil temperature [K]
    smc_init: float = 0.25          #: initial soil moisture [m^3/m^3]
    h_ice_init: float = 1.0         #: initial ice thickness [m]
    #: downward radiation used when gray_radiation is NOT in the scheme list:
    sw_dn: float = 340.0            #: [W/m^2]
    lw_dn: float = 330.0            #: [W/m^2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SurfaceState:
    """Carried surface state: exactly one of ``lsm``/``ice`` is populated
    (which one is static per Physics instance). ``precip`` is the previous
    step's surface precipitation rate [kg/m^2/s]."""

    precip: jnp.ndarray
    lsm: Optional[object] = None
    ice: Optional[object] = None


@dataclasses.dataclass(frozen=True)
class SurfaceScheme:
    """Resolved surface scheme: construction, stepping and readout hooks.

    Indexable like the former (cfg, init, step, tskin) tuple for backward
    compatibility; ``diagnostics(sfc)`` returns the per-point diagnostic dict
    (mask-aware for the mixed type: the inactive scheme's state is NaN-filled
    so plots/outputs don't show meaningless values)."""

    cfg: object
    init: object      #: (shape, dtype) -> SurfaceState
    step: object      #: (forcing, SurfaceState, dt) -> (fluxes, SurfaceState)
    tskin: object     #: SurfaceState -> (.., Y, X) radiative skin temperature
    diagnostics: object  #: SurfaceState -> dict of (.., Y, X) fields

    def __iter__(self):
        return iter((self.cfg, self.init, self.step, self.tskin))

    def __getitem__(self, i):
        return (self.cfg, self.init, self.step, self.tskin)[i]


def build_surface(cfg: SurfaceConfig, grid=None):
    """Resolve the SurfaceScheme for the configured type; returns None for
    type 'none'. ``grid`` supplies the latitude (via the Coriolis parameter)
    for the 'mixed' land mask."""
    if cfg.type == "none":
        return None
    if cfg.type == "mixed":
        return _build_mixed(cfg, grid)
    if cfg.type == "land":
        from ...utils.registry import from_dict
        from .lsm import LSMConfig, LSMState, lsm_step

        scheme_cfg = from_dict(LSMConfig, cfg.lsm or {})

        def init(shape, dtype):
            return SurfaceState(
                precip=jnp.zeros(shape, dtype=dtype),
                lsm=LSMState.init(
                    shape, t0=cfg.t_init, smc0=cfg.smc_init, dtype=dtype
                ),
            )

        def step(forcing, sfc: SurfaceState, dt):
            fluxes, new = lsm_step(
                **forcing, state=sfc.lsm, dt=dt, cfg=scheme_cfg
            )
            return fluxes, dataclasses.replace(sfc, lsm=new)

        def tskin(sfc: SurfaceState):
            return sfc.lsm.tskin

        def diagnostics(sfc: SurfaceState):
            return {
                "tskin": sfc.lsm.tskin,
                "snow_water_equivalent": sfc.lsm.sneqv,
                "soil_moisture": sfc.lsm.smc[..., 0, :, :],
            }

        return SurfaceScheme(scheme_cfg, init, step, tskin, diagnostics)
    if cfg.type == "seaice":
        from ...utils.registry import from_dict
        from .seaice import SeaIceConfig, SeaIceState, seaice_step

        scheme_cfg = from_dict(SeaIceConfig, cfg.seaice or {})

        def init(shape, dtype):
            return SurfaceState(
                precip=jnp.zeros(shape, dtype=dtype),
                ice=SeaIceState.init(
                    shape, h0=cfg.h_ice_init, t0=cfg.t_init, dtype=dtype
                ),
            )

        def step(forcing, sfc: SurfaceState, dt):
            fluxes, new = seaice_step(
                **forcing, state=sfc.ice, dt=dt, cfg=scheme_cfg
            )
            return fluxes, dataclasses.replace(sfc, ice=new)

        def tskin(sfc: SurfaceState):
            return sfc.ice.tsfc

        def diagnostics(sfc: SurfaceState):
            return {
                "tskin": sfc.ice.tsfc,
                "h_ice": sfc.ice.h_ice,
                "sst": sfc.ice.sst,
            }

        return SurfaceScheme(scheme_cfg, init, step, tskin, diagnostics)
    raise ValueError(
        f"unknown surface type {cfg.type!r}; expected none|land|seaice|mixed"
    )


def _build_mixed(cfg: SurfaceConfig, grid):
    """Earthlike blend: LSM on the land mask, Semtner ice/ocean elsewhere.
    Both schemes run on every column (one SPMD program, no per-point
    branches); fluxes and the radiative skin blend by the static mask."""
    import numpy as np

    from ... import constants
    from ...utils.registry import from_dict
    from .lsm import LSMConfig, LSMState, lsm_step
    from .seaice import SeaIceConfig, SeaIceState, seaice_step

    if grid is None:
        raise ValueError("surface type 'mixed' needs the grid (latitude mask)")
    lsm_cfg = from_dict(LSMConfig, cfg.lsm or {})
    ice_cfg = from_dict(SeaIceConfig, cfg.seaice or {})
    sin_max = float(np.sin(np.radians(cfg.land_lat_max)))

    def land_mask(like):
        # derived from the CURRENT grid at trace time (grid may be a callable
        # so that callers who reassign physics.grid — e.g. replicating it over
        # a device mesh — get the updated latitudes, not a stale closure)
        g = grid() if callable(grid) else grid
        sinlat = jnp.clip(g.f0 / (2.0 * constants.OMEGA), -1.0, 1.0)
        return jnp.broadcast_to(jnp.abs(sinlat) <= sin_max, like.shape)

    def init(shape, dtype):
        return SurfaceState(
            precip=jnp.zeros(shape, dtype=dtype),
            lsm=LSMState.init(
                shape, t0=cfg.t_init, smc0=cfg.smc_init, dtype=dtype
            ),
            ice=SeaIceState.init(
                shape, h0=cfg.h_ice_init,
                t0=min(cfg.t_init, 271.0), dtype=dtype,
            ),
        )

    def step(forcing, sfc: SurfaceState, dt):
        fx_l, lsm_new = lsm_step(**forcing, state=sfc.lsm, dt=dt, cfg=lsm_cfg)
        fx_i, ice_new = seaice_step(
            **forcing, state=sfc.ice, dt=dt, cfg=ice_cfg
        )
        mask = land_mask(sfc.lsm.tskin)
        fluxes = {
            k: jnp.where(mask, fx_l[k], fx_i[k])
            for k in fx_l if k in fx_i
        }
        return fluxes, dataclasses.replace(sfc, lsm=lsm_new, ice=ice_new)

    def tskin(sfc: SurfaceState):
        return jnp.where(
            land_mask(sfc.lsm.tskin), sfc.lsm.tskin, sfc.ice.tsfc
        )

    def diagnostics(sfc: SurfaceState):
        # the inactive scheme's state is meaningless at a point: NaN-fill it
        # so diagnostics show only where each scheme actually acts
        mask = land_mask(sfc.lsm.tskin)
        nan = jnp.nan

        def on_land(x):
            return jnp.where(mask, x, nan)

        def on_sea(x):
            return jnp.where(mask, nan, x)

        return {
            "tskin": tskin(sfc),
            "snow_water_equivalent": on_land(sfc.lsm.sneqv),
            "soil_moisture": on_land(sfc.lsm.smc[..., 0, :, :]),
            "h_ice": on_sea(sfc.ice.h_ice),
            "sst": on_sea(sfc.ice.sst),
        }

    return SurfaceScheme((lsm_cfg, ice_cfg), init, step, tskin, diagnostics)
