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

        if self.type in ("baroclinic", "analytic"):
            cfg = from_dict(AnalyticInitConfig, self.config or {})
            if cfg.case == "baroclinic":
                return DycoreState.from_baroclinic_init(
                    mt, perturbation=cfg.perturbation, dtype=dtype
                )
            raise NotImplementedError(f"analytic case {cfg.case!r}")
        elif self.type == "restart":
            cfg = from_dict(RestartInitConfig, self.config or {})
            from .restart import load_restart

            return load_restart(cfg.path, mt, dtype)
        raise NotImplementedError(f"initialization type {self.type!r}")
