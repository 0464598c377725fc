"""Full DynamicalCore integration tests on the baroclinic test case:
stability, exact dry-mass and tracer-mass conservation, determinism.

Mirrors the reference's dycore call tests (reference
tests/main/fv3core/test_dycore_call.py: determinism/statelessness) and the
JW06 validation strategy.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState, TRACER_NAMES


@pytest.fixture(scope="module")
def model():
    spec = GridSpec(n_tile=24, npz=10, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(
        npz=10, k_split=1, n_split=4, hydrostatic=True, nord=1, d4_bg=0.12,
        # static: these tests pin determinism/no-retrace/conservation, not
        # CFL adaptivity (covered by test_advection); the while-loop form
        # compiles ~30s slower on CPU
        tracer_dynamic_subcycle=False,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=900.0)
    state = DycoreState.from_baroclinic_init(mt, perturbation=True, dtype=jnp.float64)
    # seed a tracer blob (vapor-like) for conservation testing
    q = np.asarray(state.q).copy()
    c0 = np.array([1.0, 1.0, 0.5])
    c0 /= np.linalg.norm(c0)
    d2 = np.sum((mt.xyz_center - c0) ** 2, axis=-1)
    q[:, 0] = np.exp(-d2 / 0.3**2)[:, None]
    state = dataclasses.replace(state, q=jnp.asarray(q))
    return spec, mt, grid, core, state


def _mass(state, mt, h):
    area = mt.area[:, h:-h, h:-h]
    dp = np.asarray(state.delp)[:, :, h:-h, h:-h]
    return float((dp.sum(axis=1) * area).sum())


def _tracer_mass(state, mt, h, iq=0):
    area = mt.area[:, h:-h, h:-h]
    dp = np.asarray(state.delp)[:, :, h:-h, h:-h]
    q = np.asarray(state.q)[:, iq, :, h:-h, h:-h]
    return float(((q * dp).sum(axis=1) * area).sum())


@pytest.mark.slow  # full tier: fast-tier gate kept elsewhere (docs/testing.md re-tier, VERDICT r2 #9)
def test_dycore_stable_and_conservative(model):
    spec, mt, grid, core, state = model
    h = spec.n_halo
    m0 = _mass(state, mt, h)
    t0 = _tracer_mass(state, mt, h)
    s = state
    for _ in range(6):
        s = core.step_dynamics(s)
    assert not bool(jnp.isnan(s.u).any() | jnp.isnan(s.delp).any())
    dp = np.asarray(s.delp)[:, :, h:-h, h:-h]
    assert dp.min() > 0.0
    u_int = np.asarray(s.u)[:, :, h:-h, h:-h]
    assert np.abs(u_int).max() < 120.0
    m1 = _mass(s, mt, h)
    assert abs(m1 - m0) / m0 < 1e-12, "dry mass not conserved"
    t1 = _tracer_mass(s, mt, h)
    assert abs(t1 - t0) / t0 < 1e-11, "tracer mass not conserved"
    # moisture stays monotone-bounded
    q0 = np.asarray(s.q)[:, 0, :, h:-h, h:-h]
    assert q0.min() > -1e-10 and q0.max() < 1.0 + 1e-10


def test_dycore_deterministic(model):
    """Identical inputs produce bitwise-identical outputs (reference
    determinism test analog)."""
    spec, mt, grid, core, state = model
    s1 = core.step_dynamics(state)
    s2 = core.step_dynamics(state)
    assert np.array_equal(np.asarray(s1.u), np.asarray(s2.u))
    assert np.array_equal(np.asarray(s1.delp), np.asarray(s2.delp))
    assert np.array_equal(np.asarray(s1.q), np.asarray(s2.q))


def test_dycore_no_retrace_in_step(model):
    """Repeated stepping must hit the jit cache — no re-tracing and no
    re-compilation (the reference enforces no storage allocation and no
    stencil definition inside the step by monkeypatching gt4py to raise,
    reference tests/main/fv3core/test_dycore_call.py:150-220; the XLA
    analog is jit cache stability)."""
    spec, mt, grid, core, state = model
    s1 = core.step_dynamics(state)  # warm (output structure = steady state)
    n0 = core._step._cache_size()
    s2 = core.step_dynamics(s1)
    s3 = core.step_dynamics(s2)
    assert core._step._cache_size() == n0, "step re-traced on repeat calls"
    assert np.isfinite(np.asarray(s3.delp)[:, :, 3:-3, 3:-3]).all()
