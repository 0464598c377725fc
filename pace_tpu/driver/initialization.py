"""Pluggable initial conditions (reference InitializerSelector analog,
driver/pace/driver/initialization.py:28-369: AnalyticInit with
"baroclinic"/"tropicalcyclone" cases, RestartInit, PredefinedStateInit)."""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..models.fv3.state import DycoreState


@dataclasses.dataclass(frozen=True)
class AnalyticInitConfig:
    case: str = "baroclinic"
    perturbation: bool = True
    moist: bool = False


@dataclasses.dataclass(frozen=True)
class RestartInitConfig:
    path: str = "RESTART"
    start_time_seconds: float = 0.0


@dataclasses.dataclass
class InitializationConfig:
    type: str = "baroclinic"
    config: Optional[dict] = None

    def get_dycore_state(self, mt, dtype) -> DycoreState:
        from ..utils.registry import from_dict

        if self.type in ("baroclinic", "analytic", "tropicalcyclone"):
            cfg = from_dict(AnalyticInitConfig, self.config or {})
            case = cfg.case if self.type == "analytic" else (
                "baroclinic" if self.type == "baroclinic" else "tropicalcyclone"
            )
            return DycoreState.from_analytic_init(
                mt, case=case, perturbation=cfg.perturbation, dtype=dtype
            )
        elif self.type == "restart":
            cfg = from_dict(RestartInitConfig, self.config or {})
            from .fortran_restart import is_fortran_restart, load_fortran_restart

            # the reference auto-detects Fortran-format restarts by the
            # presence of fv_core.res.nc (driver/pace/driver/state.py:190-196)
            if is_fortran_restart(cfg.path):
                return load_fortran_restart(cfg.path, mt, dtype)
            from .restart import load_restart

            return load_restart(cfg.path, mt, dtype)
        elif self.type == "fortran_restart":
            cfg = from_dict(RestartInitConfig, self.config or {})
            from .fortran_restart import load_fortran_restart

            return load_fortran_restart(cfg.path, mt, dtype)
        elif self.type == "predefined":
            # reference PredefinedStateInit (initialization.py:341-369): the
            # caller hands a ready-made state via the Python API (not yaml)
            if not isinstance(self.config, dict) or "dycore_state" not in self.config:
                raise ValueError(
                    "predefined initialization requires config={'dycore_state': "
                    "DycoreState} (Python API only, like the reference)"
                )
            return self.config["dycore_state"]
        elif self.type == "savepoint":
            # reference SerialboxInit (initialization.py:244-339) reads
            # Fortran-serialized savepoint data; here the translate framework's
            # netCDF ingestion plays that role (testing/translate.py)
            from ..testing.translate import TranslateFVDynamics

            cfg = dict(self.config or {})
            if "path" not in cfg:
                raise ValueError(
                    "savepoint initialization requires config={'path': "
                    "<savepoint .nc/.h5>, 'data_halo': <halo cells in the "
                    "serialized slabs, default 0>}"
                )
            tr = TranslateFVDynamics(
                mt, data_halo=int(cfg.get("data_halo", 0)), dtype=dtype
            )
            return tr.state_from_inputs(tr.collect_input_data(cfg["path"]))
        raise NotImplementedError(f"initialization type {self.type!r}")
