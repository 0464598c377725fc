"""Validation/testing machinery: stage checkpointers, threshold calibration,
round-off perturbation (reference ndsl.checkpointer + ndsl.testing analogs)."""

from .checkpointer import (  # noqa: F401
    SavepointThresholds,
    SnapshotCheckpointer,
    Threshold,
    ThresholdCalibrationCheckpointer,
    ValidationCheckpointer,
    ValidationError,
)
from .perturb import perturb  # noqa: F401
from .sanitizer import SanitizerCheckpointer, SanitizerError  # noqa: F401
from .validation import (  # noqa: F401
    SelectiveValidationCheckpointer,
    ValidationRegion,
    get_region,
)
