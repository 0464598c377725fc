"""Diagnostics: variable selection, derived quantities, monitor output.

TPU-native analog of the reference DiagnosticsConfig/MonitorDiagnostics/
ZSelect (driver/pace/driver/diagnostics.py:25-249) and ndsl.monitor
(ZarrMonitor/NetCDFMonitor, SURVEY.md §2.2). This environment ships neither
zarr nor netCDF4, so the Monitor writes HDF5 (h5py) with the same layout
semantics as the reference's time-chunked store: one dataset per variable,
extended along a leading time axis; grid lat/lon written once as constants.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class ZSelect:
    """Output one vertical level of a 3D field (reference diagnostics.py:39-63)."""

    level: int
    names: List[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class DiagnosticsConfig:
    """Reference field parity: diagnostics.py:66-139."""

    path: str = "output"
    names: List[str] = dataclasses.field(default_factory=list)
    derived_names: List[str] = dataclasses.field(default_factory=list)
    z_select: List[ZSelect] = dataclasses.field(default_factory=list)
    output_format: str = "hdf5"
    output_frequency: int = 1
    output_initial_state: bool = False

    def diagnostics_factory(self, mt, n_halo: int):
        if not self.names and not self.derived_names and not self.z_select:
            return NullDiagnostics()
        return MonitorDiagnostics(self, mt, n_halo)


class NullDiagnostics:
    """Reference NullDiagnostics analog."""

    def store(self, time_seconds: float, state):
        pass

    def store_grid(self, mt):
        pass

    def cleanup(self):
        pass


class MonitorDiagnostics:
    def __init__(self, config: DiagnosticsConfig, mt, n_halo: int):
        import h5py

        self.config = config
        self.h = n_halo
        os.makedirs(config.path, exist_ok=True)
        self.file = h5py.File(os.path.join(config.path, "diagnostics.h5"), "w")
        self.times: List[float] = []
        del h5py
        del mt

    def _interior(self, arr) -> np.ndarray:
        h = self.h
        a = np.asarray(arr)
        return a[..., h:-h, h:-h]

    def _derive(self, name: str, state):
        """Derived variables (reference column_integrated_<tracer>,
        diagnostics.py:178-191,226-249)."""
        from .. import constants
        from ..models.fv3.state import TRACER_NAMES

        if name.startswith("column_integrated_"):
            tname = name[len("column_integrated_") :]
            q = np.asarray(state.q)[:, TRACER_NAMES.index(tname)]
            dp = np.asarray(state.delp)
            return (q * dp).sum(axis=-3) / constants.GRAV
        raise KeyError(f"unknown derived diagnostic {name!r}")

    def store(self, time_seconds: float, state):
        self.times.append(time_seconds)
        it = len(self.times) - 1
        for name in self.config.names:
            field = getattr(state, name)
            if field is None:
                raise ValueError(
                    f"diagnostic {name!r} requested but not filled by the "
                    "model (None in state)"
                )
            arr = self._interior(field)
            self._append(name, it, arr)
        for name in self.config.derived_names:
            arr = self._interior(self._derive(name, state))
            self._append(name, it, arr)
        for zs in self.config.z_select:
            for name in zs.names:
                full = np.asarray(getattr(state, name))
                lvl = full[..., zs.level, :, :]
                self._append(
                    f"{name}_z{zs.level}", it, lvl[..., self.h : -self.h, self.h : -self.h]
                )
        self.file.flush()

    def _append(self, name: str, it: int, arr: np.ndarray):
        if name not in self.file:
            self.file.create_dataset(
                name,
                shape=(0,) + arr.shape,
                maxshape=(None,) + arr.shape,
                dtype="f4",
                chunks=(1,) + arr.shape,
            )
        ds = self.file[name]
        ds.resize(it + 1, axis=0)
        ds[it] = arr

    def store_grid(self, mt):
        """Grid lat/lon as constants (reference diagnostics.py:199-207)."""
        h = self.h
        self.file.create_dataset("lat", data=mt.lat_agrid[:, h:-h, h:-h])
        self.file.create_dataset("lon", data=mt.lon_agrid[:, h:-h, h:-h])

    def cleanup(self):
        if self.times:
            self.file.create_dataset("time", data=np.asarray(self.times))
        self.file.close()
