"""Tropical cyclone (Reed & Jablonowski 2011) analytic init tests.

Reference parity: ``pyFV3.initialization.analytic_init`` case
"tropicalcyclone" paired with a Schmidt-stretched grid
(driver/examples/configs/tropicalcyclone_c128.yaml:1-30).
"""

import jax.numpy as jnp
import numpy as np

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.models.fv3 import init_tropical_cyclone as tc
from pace_tpu.models.fv3.state import DycoreState, TRACER_NAMES


def test_analytic_profiles():
    """Point checks of the analytic formulas."""
    # background surface pressure far from the vortex
    assert abs(float(tc.pressure(5.0e6, 0.0)) - tc.P00) < 1.0
    # central surface depression equals DELTA_P
    assert abs(float(tc.pressure(0.0, 0.0)) - (tc.P00 - tc.DELTA_P)) < 1.0
    # tangential wind: zero at center and far away, peaked in between
    z = 100.0
    vts = [
        float(tc.tangential_wind(r, z))
        for r in (1.0, 1.0e5, 2.5e5, 3.0e6)
    ]
    assert vts[0] < 1.0
    assert max(vts[1], vts[2]) > 15.0
    assert vts[3] < 5.0
    # humidity decays with height, nearly dry above the tropopause
    q = tc.specific_humidity(np.array([0.0, 5000.0, 16000.0]))
    assert q[0] > q[1] > q[2]
    assert q[2] < 1e-10


def test_state_on_stretched_grid():
    spec = GridSpec(
        n_tile=12,
        npz=8,
        layout=(1, 1),
        stretch_factor=3.0,
        lon_target=180.0,
        lat_target=10.0,
    )
    mt = MetricTerms.generate(spec)
    state = DycoreState.from_analytic_init(
        mt, case="tropicalcyclone", dtype=jnp.float64
    )
    h = 3
    ps = np.asarray(state.ps)[:, h:-h, h:-h]
    u = np.asarray(state.u)[:, :, h:-h, h:-h]
    qv = np.asarray(state.q)[:, TRACER_NAMES.index("qvapor"), :, h:-h, h:-h]
    assert np.isfinite(u).all() and np.isfinite(ps).all()
    # the stretched grid resolves part of the surface depression
    assert ps.min() < tc.P00 - 300.0
    assert ps.max() <= tc.P00 + 1.0
    # cyclonic winds present but bounded
    assert 5.0 < np.abs(u).max() < 60.0
    # moisture: boundary-layer values near q0, decreasing upward
    assert 0.01 < qv[:, -1].max() <= tc.Q0 + 1e-6
    assert qv[:, 0].max() < 1e-4
