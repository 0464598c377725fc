"""Runtime bounds + NaN checks on state variables (reference SafetyChecker
analog, driver/pace/driver/safety_checks.py:21-105; registered variables at
driver.py:556-561)."""

from __future__ import annotations

from typing import List

import numpy as np


class SafetyChecker:
    def __init__(self):
        self.checks: List = []

    def register_variable(
        self,
        name: str,
        minimum_value=None,
        maximum_value=None,
        compute_domain_only: bool = True,
    ):
        self.checks.append((name, minimum_value, maximum_value, compute_domain_only))

    def check_state(self, state, n_halo: int = 3):
        """Raises RuntimeError on violation (reference behavior)."""
        failures = []
        for name, lo, hi, interior in self.checks:
            arr = getattr(state, name, None)
            if arr is None:
                continue
            a = np.asarray(arr)
            if interior and a.ndim >= 2:
                a = a[..., n_halo:-n_halo, n_halo:-n_halo]
            if np.isnan(a).any():
                failures.append(f"{name}: NaN detected")
                continue
            if lo is not None and a.min() < lo:
                failures.append(f"{name}: min {a.min()} < {lo}")
            if hi is not None and a.max() > hi:
                failures.append(f"{name}: max {a.max()} > {hi}")
        if failures:
            raise RuntimeError("safety check failed: " + "; ".join(failures))
