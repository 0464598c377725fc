"""Driver layer: YAML config -> model orchestration (pace.driver analog).

Mirrors the reference driver package structure (reference driver/pace/driver/:
run.py, driver.py, initialization.py, grid.py, diagnostics.py, state.py,
safety_checks.py, registry.py; SURVEY.md §2.1)."""

from .config import DriverConfig  # noqa: F401
from .driver import Driver  # noqa: F401
