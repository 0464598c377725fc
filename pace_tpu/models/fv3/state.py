"""DycoreState: the prognostic/diagnostic state of the FV3 dynamical core.

TPU-native analog of ``pyFV3.DycoreState`` (reference field inventory at
driver/pace/driver/state.py:119-151 and tests/mpi_54rank/test_grid_init.py:
123-140: u, v, w, ua, va, uc, vc, delp, delz, pt, ps, pe, peln, pk, pkz,
phis, omga, q_con, mfxd, mfyd, cxd, cyd, diss_estd + 9 tracers).

One flat pytree dataclass of stacked raw arrays (S, [K,] Y, X); tracers are
one stacked block (S, nq, K, Y, X) indexed by TRACER_NAMES — on TPU this keeps
the transport and remap operators running over the whole block at once.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import constants

#: reference tracer registry (driver/pace/driver/state.py restart comment)
TRACER_NAMES = (
    "qvapor",
    "qliquid",
    "qice",
    "qrain",
    "qsnow",
    "qgraupel",
    "qo3mr",
    "qsgs_tke",
    "qcld",
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DycoreState:
    # prognostic
    u: jnp.ndarray  # (S, K, Y+1, X) D-grid covariant x-wind [m/s]
    v: jnp.ndarray  # (S, K, Y, X+1)
    delp: jnp.ndarray  # (S, K, Y, X) pressure thickness [Pa]
    pt: jnp.ndarray  # (S, K, Y, X) virtual potential temperature [K]
    q: jnp.ndarray  # (S, nq, K, Y, X) tracers [kg/kg]
    w: Optional[jnp.ndarray] = None  # (S, K, Y, X) vertical velocity [m/s]
    delz: Optional[jnp.ndarray] = None  # (S, K, Y, X) layer height [m], negative

    # surface / column diagnostics
    phis: Optional[jnp.ndarray] = None  # (S, Y, X) surface geopotential
    ps: Optional[jnp.ndarray] = None  # (S, Y, X) surface pressure
    pe: Optional[jnp.ndarray] = None  # (S, K+1, Y, X) interface pressure
    peln: Optional[jnp.ndarray] = None
    pk: Optional[jnp.ndarray] = None  # (pe/P_REF)^kappa at interfaces
    pkz: Optional[jnp.ndarray] = None  # layer-mean pk
    omga: Optional[jnp.ndarray] = None  # dp/dt [Pa/s]

    # A/C-grid wind diagnostics (filled by the dycore step)
    ua: Optional[jnp.ndarray] = None
    va: Optional[jnp.ndarray] = None
    uc: Optional[jnp.ndarray] = None
    vc: Optional[jnp.ndarray] = None

    # accumulated fluxes (for physics/diagnostics; reference mfxd etc.)
    mfxd: Optional[jnp.ndarray] = None
    mfyd: Optional[jnp.ndarray] = None
    cxd: Optional[jnp.ndarray] = None
    cyd: Optional[jnp.ndarray] = None
    diss_estd: Optional[jnp.ndarray] = None
    q_con: Optional[jnp.ndarray] = None

    @property
    def qvapor(self):
        return self.q[:, TRACER_NAMES.index("qvapor")]

    def tracer(self, name: str):
        return self.q[:, TRACER_NAMES.index(name)]

    @classmethod
    def init_zeros(cls, shapes, dtype=None) -> "DycoreState":
        """Allocate an all-zero state. ``shapes`` is a dict with S, K, Y, X."""
        if dtype is None:
            from ... import dtypes

            dtype = dtypes.Float
        S, K, Y, X = shapes["S"], shapes["K"], shapes["Y"], shapes["X"]
        z = lambda *sh: jnp.zeros(sh, dtype=dtype)  # noqa: E731
        return cls(
            u=z(S, K, Y + 1, X),
            v=z(S, K, Y, X + 1),
            delp=z(S, K, Y, X),
            pt=z(S, K, Y, X),
            q=z(S, len(TRACER_NAMES), K, Y, X),
            w=z(S, K, Y, X),
            delz=z(S, K, Y, X),
            phis=z(S, Y, X),
            ps=z(S, Y, X),
            pe=z(S, K + 1, Y, X),
            peln=z(S, K + 1, Y, X),
            pk=z(S, K + 1, Y, X),
            pkz=z(S, K, Y, X),
        )

    @classmethod
    def from_analytic_init(cls, mt, case: str = "baroclinic",
                           perturbation: bool = True, dtype=None) -> "DycoreState":
        """Build from an analytic test case (reference
        ``pyFV3.initialization.analytic_init.init_analytic_state``; cases
        "baroclinic" and "tropicalcyclone",
        driver/pace/driver/initialization.py:116-124)."""
        if case == "baroclinic":
            return cls.from_baroclinic_init(
                mt, perturbation=perturbation, dtype=dtype
            )
        if case == "tropicalcyclone":
            from .init_tropical_cyclone import init_tropical_cyclone_state

            return cls._from_init_dict(
                mt, init_tropical_cyclone_state(mt), dtype
            )
        raise ValueError(f"unknown analytic init case {case!r}")

    @classmethod
    def from_baroclinic_init(cls, mt, perturbation: bool = True, moist: bool = False,
                             dtype=None) -> "DycoreState":
        """Build from the JW06 analytic state (see init_baroclinic)."""
        from .init_baroclinic import init_baroclinic_state

        st = init_baroclinic_state(mt, perturbation=perturbation)
        return cls._from_init_dict(mt, st, dtype)

    @classmethod
    def _from_init_dict(cls, mt, st, dtype=None) -> "DycoreState":
        """Assemble a full DycoreState from an analytic-init dict with keys
        u, v, delp, pt, phis, ps (+ optional qvapor)."""
        if dtype is None:
            from ... import dtypes

            dtype = dtypes.Float
        S, K = st["delp"].shape[:2]
        Y, X = st["delp"].shape[2:]
        q = np.zeros((S, len(TRACER_NAMES), K, Y, X))
        if "qvapor" in st:
            q[:, TRACER_NAMES.index("qvapor")] = st["qvapor"]
        pe = mt.ak[None, :, None, None] + mt.bk[None, :, None, None] * st["ps"][:, None]
        peln = np.log(np.maximum(pe, 1e-8))
        pk = (pe / constants.P_REF) ** constants.KAPPA
        pkz = (pk[:, 1:] - pk[:, :-1]) / (
            constants.KAPPA * (peln[:, 1:] - peln[:, :-1])
        )
        # nonhydrostatic fields: hydrostatically-balanced layer depths, w=0
        t_v = st["pt"] * pkz
        delz = (
            -constants.RDGAS / constants.GRAV * t_v * (peln[:, 1:] - peln[:, :-1])
        )
        j = lambda a: jnp.asarray(a, dtype=dtype)  # noqa: E731
        # fill every optional diagnostic field with zeros so the state's
        # pytree structure is already the one step_dynamics produces — a
        # structure change between calls would force a second jit compile
        zc = np.zeros_like(st["delp"])
        zu = np.zeros_like(st["u"])
        zv = np.zeros_like(st["v"])
        return cls(
            u=j(st["u"]),
            v=j(st["v"]),
            delp=j(st["delp"]),
            pt=j(st["pt"]),
            q=j(q),
            w=j(zc),
            delz=j(delz),
            phis=j(st["phis"]),
            ps=j(st["ps"]),
            pe=j(pe),
            peln=j(peln),
            pk=j(pk),
            pkz=j(pkz),
            ua=j(zc),
            va=j(zc),
            uc=j(np.zeros_like(st["v"])),
            vc=j(np.zeros_like(st["u"])),
            mfxd=j(zv),
            mfyd=j(zu),
            cxd=j(zv),
            cyd=j(zu),
            diss_estd=j(zc),
            omga=j(zc),
        )


# dims (beyond the leading shard axis S) and units for each field — drives the
# dataset export below (reference DycoreState fields list, fv3core state.py:119-151)
FIELD_METADATA = {
    "u": (("z", "y_interface", "x"), "m/s"),
    "v": (("z", "y", "x_interface"), "m/s"),
    "delp": (("z", "y", "x"), "Pa"),
    "pt": (("z", "y", "x"), "degK"),
    "w": (("z", "y", "x"), "m/s"),
    "delz": (("z", "y", "x"), "m"),
    "phis": (("y", "x"), "m^2 s^-2"),
    "ps": (("y", "x"), "Pa"),
    "pe": (("z_interface", "y", "x"), "Pa"),
    "peln": (("z_interface", "y", "x"), "ln(Pa)"),
    "pk": (("z_interface", "y", "x"), "(Pa)**kappa"),
    "pkz": (("z", "y", "x"), "(Pa)**kappa"),
    "omga": (("z", "y", "x"), "Pa/s"),
    "ua": (("z", "y", "x"), "m/s"),
    "va": (("z", "y", "x"), "m/s"),
    "uc": (("z", "y", "x_interface"), "m/s"),
    "vc": (("z", "y_interface", "x"), "m/s"),
    "mfxd": (("z", "y", "x_interface"), "Pa m^2"),
    "mfyd": (("z", "y_interface", "x"), "Pa m^2"),
    "cxd": (("z", "y", "x_interface"), ""),
    "cyd": (("z", "y_interface", "x"), ""),
    "diss_estd": (("z", "y", "x"), ""),
    "q_con": (("z", "y", "x"), "kg/kg"),
}


def _dataset_items(state: "DycoreState"):
    for name, (dims, units) in FIELD_METADATA.items():
        arr = getattr(state, name)
        if arr is not None:
            yield name, ("shard",) + dims, units, np.asarray(arr)
    q = getattr(state, "q", None)
    if q is not None:
        for i, tname in enumerate(TRACER_NAMES):
            yield tname, ("shard", "z", "y", "x"), "kg/kg", np.asarray(q[:, i])


def as_dataset(state: "DycoreState"):
    """Name -> (dims, units, numpy array) for every populated field, tracers
    unstacked by name — the structural analog of the reference's
    ``DycoreState.xr_dataset`` (fv3core state.py: sympl-style dataset export)
    without an xarray dependency (not in the image)."""
    return {
        name: {"dims": dims, "units": units, "data": arr}
        for name, dims, units, arr in _dataset_items(state)
    }


def to_netcdf(state: "DycoreState", path: str) -> None:
    """Write every populated field to one classic-NetCDF-3 file with shared
    named dimensions (the reference's ``xr_dataset.to_netcdf`` save path,
    driver/pace/driver/state.py:114-126)."""
    from ...utils import netcdf3

    dims: dict = {}
    variables: dict = {}
    for name, dnames, units, arr in _dataset_items(state):
        full = []
        for d, sz in zip(dnames, arr.shape):
            # interface dims differ in length from their center dims
            key = d
            if key in dims and dims[key] != int(sz):
                key = f"{d}{sz}"
            dims.setdefault(key, int(sz))
            full.append(key)
        variables[name] = netcdf3.Variable(
            dims=tuple(full), data=arr, attrs={"units": units}
        )
    netcdf3.write(path, netcdf3.NetCDF3File(dims=dims, variables=variables, attrs={}))
