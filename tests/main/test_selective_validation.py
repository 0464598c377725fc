"""Selective validation (testing/validation.py): NaN-masked regions never
fail a comparison; in-region differences still do. Mirrors the reference's
tests/main/fv3core/test_selective_validation.py intent."""

import numpy as np
import pytest

from pace_tpu.testing import (
    SelectiveValidationCheckpointer,
    SnapshotCheckpointer,
    Threshold,
    ValidationCheckpointer,
    ValidationRegion,
    get_region,
)
from pace_tpu.testing.checkpointer import SavepointThresholds, ValidationError


def test_region_masks_halo_only():
    arr = np.ones((2, 4, 10, 10))
    masked = ValidationRegion(halo=3).mask(arr)
    assert np.isnan(masked[..., :3, :]).all()
    assert np.isnan(masked[..., -3:, :]).all()
    assert np.isnan(masked[..., :, :3]).all()
    assert np.isnan(masked[..., :, -3:]).all()
    assert np.isfinite(masked[..., 3:-3, 3:-3]).all()


def test_interface_regions_keep_extra_line():
    arr = np.ones((1, 11, 10))
    m = get_region("u", halo=3).mask(arr)  # y-interface: one extra row valid
    assert np.isfinite(m[:, 3:9, 3:7]).all()
    assert np.isnan(m[:, 9:, :]).all()
    arr = np.ones((1, 10, 11))
    m = get_region("v", halo=3).mask(arr)
    assert np.isfinite(m[:, 3:7, 3:9]).all()
    assert np.isnan(m[:, :, 9:]).all()


def test_halo_differences_ignored_interior_caught():
    ref = SnapshotCheckpointer()
    base = np.zeros((1, 10, 10), dtype=np.float32)
    thresholds = SavepointThresholds(
        {"Stage": {"q": Threshold(absolute=1e-6, relative=1e-6)}}
    )
    sel_ref = SelectiveValidationCheckpointer(ref)
    sel_ref("Stage", q=base)

    # halo-only difference: passes under selective validation
    val = ValidationCheckpointer(ref, thresholds)
    sel = SelectiveValidationCheckpointer(val)
    halo_diff = base.copy()
    halo_diff[:, 0, 0] = 99.0
    with sel.trial():
        sel("Stage", q=halo_diff)

    # interior difference: still caught
    val2 = ValidationCheckpointer(ref, thresholds)
    sel2 = SelectiveValidationCheckpointer(val2)
    interior_diff = base.copy()
    interior_diff[:, 5, 5] = 99.0
    with pytest.raises(ValidationError):
        with sel2.trial():
            sel2("Stage", q=interior_diff)
