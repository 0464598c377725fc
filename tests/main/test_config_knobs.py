"""Every accepted DynamicalCoreConfig knob changes the answer or is
rejected (VERDICT r1 item 5: no silently-ignored namelist parameters).

Rejection: ke_bg != 0, z_tracer=false, nonhydrostatic beta != 0 raise at
config construction. Wired: each parametrized field produces a different
one-step result than the base config on the same initial state.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState, TRACER_NAMES


def test_ke_bg_rejected():
    with pytest.raises(ValueError, match="ke_bg"):
        DynamicalCoreConfig(ke_bg=0.1)


def test_z_tracer_false_rejected():
    with pytest.raises(ValueError, match="z_tracer"):
        DynamicalCoreConfig(z_tracer=False)


def test_nonhydro_beta_live():
    """beta off-centering acts on the nonhydrostatic PGF (round-4: the
    former rejection is replaced by the split blend, acoustics.py). With
    n_split=1 only the full-PGF seeding substep runs, so beta is inert;
    with n_split>=2 it must change the answer."""
    import jax.numpy as jnp
    import numpy as np

    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore
    from pace_tpu.models.fv3.state import DycoreState

    mt = MetricTerms.generate(GridSpec(n_tile=12, npz=8, layout=(1, 1)))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    state0 = DycoreState.from_baroclinic_init(
        mt, perturbation=True, dtype=jnp.float32
    )

    def step(beta, n_split):
        cfg = DynamicalCoreConfig(
            npz=8, k_split=1, n_split=n_split, hydrostatic=False,
            nord=1, d4_bg=0.12, beta=beta,
        )
        core = DynamicalCore(grid, mt.halo, cfg, timestep=300.0)
        return np.asarray(core.step_dynamics(state0).u)

    u_b0 = step(0.0, 2)
    u_b4 = step(0.4, 2)
    assert not np.allclose(u_b0, u_b4), "beta must change the nonhydro answer"
    np.testing.assert_array_equal(step(0.0, 1), step(0.4, 1))


BASE = dict(
    npz=8, k_split=1, n_split=2, hydrostatic=True, nord=1, d4_bg=0.12,
    do_sat_adj=True, fill=True,
)

# field -> override value; each must change the one-step answer vs BASE
KNOBS = {
    "beta": 0.4,
    "kord_mt": 4,
    "kord_tm": 4,
    "kord_tr": 4,
    "kord_wz": 4,
    "tau_v2l": 15.0,
    "ql_gen": 1.0e-6,
    "d_con": 1.0,
    "consv_te": 1.0,
    "n_sponge": 2,       # with d_ext via pairing below
    "rf_fast": True,     # with tau via pairing below
    "fv_sg_adj": 600.0,  # applied by the driver layer; here via dycore? no —
}
# knobs that need a companion setting to act
COMPANIONS = {
    "n_sponge": {"d_ext": 0.02},
    "rf_fast": {"tau": 5.0, "rf_cutoff": 50000.0},
    # kord_wz remaps w/delz — nonhydrostatic only
    "kord_wz": {"hydrostatic": False},
}
# knobs applied outside DynamicalCore (skip in the dycore-only sweep)
SKIP = {"fv_sg_adj"}


@pytest.fixture(scope="module")
def setup():
    mt = MetricTerms.generate(GridSpec(n_tile=12, npz=8, layout=(1, 1)))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    state = DycoreState.from_baroclinic_init(
        mt, perturbation=True, moist=True, dtype=jnp.float64
    )
    # moisten + plant a small negative tracer patch so sat_adj/fill have work
    q = np.array(state.q)
    iv = TRACER_NAMES.index("qvapor")
    il = TRACER_NAMES.index("qliquid")
    q[:, iv, -3:] = 0.02
    q[:, il, -2] = 1e-4
    q[:, il, -1, 5, 5] = -1e-5
    state = dataclasses.replace(state, q=jnp.asarray(q))
    return mt, grid, state


def _run(mt, grid, state, **overrides):
    cfg = DynamicalCoreConfig(**{**BASE, **overrides})
    core = DynamicalCore(grid, mt.halo, cfg, timestep=600.0)
    out = core.step_dynamics(state)
    return np.concatenate(
        [np.asarray(out.u).ravel(), np.asarray(out.pt).ravel(),
         np.asarray(out.q).ravel()]
    )


@pytest.mark.slow
@pytest.mark.parametrize("field", [k for k in KNOBS if k not in SKIP])
def test_knob_changes_answer(setup, field, base_result):
    mt, grid, state = setup
    companions = COMPANIONS.get(field, {})
    if companions:
        # compare against a base that has the SAME companion settings so
        # only the knob under test differs
        ref = _run(mt, grid, state, **companions)
    else:
        ref = base_result
    alt = _run(mt, grid, state, **{field: KNOBS[field]}, **companions)
    assert not np.allclose(alt, ref, rtol=1e-12, atol=1e-12), (
        f"DynamicalCoreConfig.{field}={KNOBS[field]!r} did not change the"
        " one-step result — dead knob"
    )


@pytest.fixture(scope="module")
def base_result(setup):
    mt, grid, state = setup
    return _run(mt, grid, state)
