"""Checkpointer / threshold-calibration tests (reference
tests/savepoint/test_checkpoints.py:67-195 workflow: record reference data,
calibrate thresholds from round-off-perturbed trials, validate within the
calibrated thresholds)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState
from pace_tpu.testing import (
    SavepointThresholds,
    SnapshotCheckpointer,
    Threshold,
    ThresholdCalibrationCheckpointer,
    ValidationCheckpointer,
    ValidationError,
    perturb,
)


@pytest.fixture(scope="module")
def setup():
    spec = GridSpec(n_tile=12, npz=6, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(
        npz=6, k_split=1, n_split=2, hydrostatic=True, nord=1, d4_bg=0.12
    )
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float64)
    return mt, grid, cfg, state


@pytest.mark.slow
def test_record_calibrate_validate(setup, tmp_path):
    mt, grid, cfg, state = setup

    # 1. record reference data from the unperturbed run
    snap = SnapshotCheckpointer()
    core = DynamicalCore(grid, mt.halo, cfg, 300.0, checkpointer=snap)
    core.step_dynamics(state)
    # all reference stages fired, including the in-acoustics ones
    for stage in (
        "FVDynamics-In", "C_SW-In", "C_SW-Out", "D_SW-Out",
        "Tracer2D1L-In", "Tracer2D1L-Out", "Remapping-In", "Remapping-Out",
        "FVDynamics-Out",
    ):
        assert stage in snap.data, stage
    assert len(snap.data["C_SW-In"]) == cfg.n_split  # one per substep

    # snapshot save/load round-trip
    path = str(tmp_path / "ref.npz")
    snap.save(path)
    snap2 = SnapshotCheckpointer.load(path)
    assert np.array_equal(
        snap2.data["FVDynamics-Out"][0]["u"], snap.data["FVDynamics-Out"][0]["u"]
    )

    # 2. calibrate thresholds from perturbed trials (reference factor 10)
    calib = ThresholdCalibrationCheckpointer(snap, factor=10.0)
    core_c = DynamicalCore(grid, mt.halo, cfg, 300.0, checkpointer=calib)
    for trial in range(3):
        with calib.trial():
            core_c.step_dynamics(perturb(state, 1e-13, seed=trial + 1))
    thresholds = calib.thresholds()
    assert thresholds.savepoints["FVDynamics-Out"]["u"].absolute > 0.0

    # thresholds yaml round-trip (reference thresholds/fv_dynamics.yaml shape)
    ypath = str(tmp_path / "thresholds.yaml")
    thresholds.to_yaml(ypath)
    th2 = SavepointThresholds.from_yaml(ypath)
    assert (
        th2.savepoints["FVDynamics-Out"]["u"].absolute
        == thresholds.savepoints["FVDynamics-Out"]["u"].absolute
    )

    # 3. a perturbed run validates within the calibrated thresholds
    val = ValidationCheckpointer(snap, thresholds)
    core_v = DynamicalCore(grid, mt.halo, cfg, 300.0, checkpointer=val)
    with val.trial():
        core_v.step_dynamics(perturb(state, 1e-13, seed=99))

    # 4. a corrupted run fails validation
    bad = dataclasses.replace(state, u=state.u * 1.001)
    with pytest.raises(ValidationError):
        with val.trial():
            core_v.step_dynamics(bad)


def test_threshold_check_semantics():
    t = Threshold(absolute=1e-3, relative=0.0)
    a = np.array([1.0, 2.0])
    assert t.check("x", a, a + 5e-4) is None
    msg = t.check("x", a, a + 5e-3)
    assert msg is not None and "x" in msg
    # relative alone
    t2 = Threshold(absolute=0.0, relative=1e-2)
    assert t2.check("y", np.array([100.0]), np.array([100.5])) is None
    assert t2.check("y", np.array([100.0]), np.array([105.0])) is not None


def test_physics_savepoints_record_calibrate_validate(setup, tmp_path):
    """Physics-In/Physics-Out checkpoints: the reference's physics savepoint
    suite analog (make physics_savepoint_tests) run through the same
    record -> calibrate -> validate machinery as the dycore stages."""
    from pace_tpu.models.shield.physics import Physics

    mt, grid, cfg, state = setup
    schemes = ("gray_radiation", "GFS_PBL", "GFS_microphysics")

    snap = SnapshotCheckpointer()
    phys = Physics(grid, schemes, 300.0, checkpointer=snap)
    phys(state)
    assert "Physics-In" in snap.data and "Physics-Out" in snap.data
    assert "pt" in snap.data["Physics-Out"][0]

    calib = ThresholdCalibrationCheckpointer(snap, factor=10.0)
    phys_c = Physics(grid, schemes, 300.0, checkpointer=calib)
    for trial in range(3):
        with calib.trial():
            phys_c(perturb(state, 1e-13, seed=trial + 1))
    thresholds = calib.thresholds()

    val = ValidationCheckpointer(snap, thresholds)
    phys_v = Physics(grid, schemes, 300.0, checkpointer=val)
    with val.trial():
        phys_v(perturb(state, 1e-13, seed=7))

    bad = dataclasses.replace(state, pt=state.pt * 1.001)
    with pytest.raises(ValidationError):
        with val.trial():
            phys_v(bad)
