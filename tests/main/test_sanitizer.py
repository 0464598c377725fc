"""Per-stage sanitizer tests (reference PACE_DACE_DEBUG passes,
doc_primer_orchestration.md:48-57)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState
from pace_tpu.testing import SanitizerCheckpointer, SanitizerError


@pytest.fixture(scope="module")
def model():
    spec = GridSpec(n_tile=12, npz=4, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(
        npz=4, k_split=1, n_split=1, hydrostatic=True, nord=1, d4_bg=0.12
    )
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float64)
    return mt, grid, cfg, state


@pytest.mark.slow
def test_clean_run_passes(model):
    mt, grid, cfg, state = model
    san = SanitizerCheckpointer(progress=False)
    core = DynamicalCore(grid, mt.halo, cfg, 300.0, checkpointer=san)
    core.step_dynamics(state)
    assert san._hit > 0  # stages actually fired


def test_nan_input_caught_at_first_stage(model):
    mt, grid, cfg, state = model
    u = np.asarray(state.u).copy()
    u[0, 0, 8, 8] = np.nan
    bad = dataclasses.replace(state, u=jnp.asarray(u))
    san = SanitizerCheckpointer()
    core = DynamicalCore(grid, mt.halo, cfg, 300.0, checkpointer=san)
    with pytest.raises(SanitizerError, match="non-finite"):
        core.step_dynamics(bad)


def test_negative_delp_and_tracer_checks():
    san = SanitizerCheckpointer(collect=True)
    q = np.zeros((1, 2, 2))
    q[0, 0, 0] = -1.0e-3
    delp = np.ones((1, 2, 2))
    delp[0, 1, 1] = -5.0
    san("D_SW-Out", delp=delp, q=q)
    assert any("non-positive layer" in f for f in san.failures)
    assert any("below" in f for f in san.failures)
    # tiny negatives above the floor are tolerated (neg_adj3 territory)
    san2 = SanitizerCheckpointer(collect=True)
    san2("X", q=np.full((2, 2), -1.0e-12))
    assert san2.failures == []
