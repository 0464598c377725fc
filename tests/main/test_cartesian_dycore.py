"""Dycore on the doubly-periodic Cartesian plane (grid_type=4): a resting
isothermal atmosphere with a warm bubble must stay finite, conserve mass
exactly, and develop a rising-bubble circulation — the reference's
cartesian-grid dycore test (reference tests/main/fv3core/
test_cartesian_grid.py:19-50 runs the dycore with
MetricTerms.from_tile_sizing grid_type=4)."""

import jax.numpy as jnp
import numpy as np

from pace_tpu import constants
from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState

H = 3


def _bubble_state(mt, npz, dtype):
    """Resting hydrostatic atmosphere + Gaussian warm bubble (pt is virtual
    potential temperature as everywhere in the model)."""
    S = 1
    ny = nx = mt.spec.n_tile
    Y = ny + 2 * H
    X = nx + 2 * H
    ps = np.full((S, Y, X), 1.0e5)
    pe = mt.ak[None, :, None, None] + mt.bk[None, :, None, None] * ps[:, None]
    peln = np.log(np.maximum(pe, 1e-8))
    pk = (pe / constants.P_REF) ** constants.KAPPA
    pkz = (pk[:, 1:] - pk[:, :-1]) / (
        constants.KAPPA * (peln[:, 1:] - peln[:, :-1])
    )
    t0 = 300.0
    pt = t0 / pkz  # isothermal T=300K
    # +2 K bubble at mid-levels, centered in the domain
    jj, ii = np.meshgrid(np.arange(Y), np.arange(X), indexing="ij")
    r2 = ((jj - Y / 2.0) ** 2 + (ii - X / 2.0) ** 2) / 3.0**2
    kk = np.arange(npz)
    kprof = np.exp(-((kk - npz / 2.0) ** 2) / 2.0**2)
    pt = pt + 2.0 * kprof[None, :, None, None] * np.exp(-r2)[None, None] / pkz
    st = {
        "u": np.zeros((S, npz, Y + 1, X)),
        "v": np.zeros((S, npz, Y, X + 1)),
        "delp": pe[:, 1:] - pe[:, :-1],
        "pt": pt,
        "phis": np.zeros((S, Y, X)),
        "ps": ps,
    }
    return DycoreState._from_init_dict(mt, st, dtype)


def test_cartesian_bubble_stable_and_conservative():
    npz = 10
    spec = GridSpec(
        n_tile=16, npz=npz, layout=(1, 1), grid_type=4, dx_const=1000.0,
        dy_const=1000.0,
    )
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    # acoustic CFL: c*dt_acoustic/dx = 340 * (dt/n_split) / 1000 must stay
    # well below 1 on a 1 km Cartesian grid -> dt=6 s with n_split=6
    cfg = DynamicalCoreConfig(
        npz=npz, k_split=1, n_split=6, hydrostatic=False,
        nord=1, d4_bg=0.12, p_fac=0.05,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=6.0)
    state = _bubble_state(mt, npz, jnp.float64)

    area = mt.area[:, H:-H, H:-H]
    mass0 = float(
        (np.asarray(state.delp)[:, :, H:-H, H:-H].sum(axis=1) * area).sum()
    )
    for _ in range(3):
        state = core.step_dynamics(state)

    interior = np.s_[:, :, H:-H, H:-H]
    w = np.asarray(state.w)[interior]
    assert np.isfinite(np.asarray(state.delp)[interior]).all()
    assert np.isfinite(w).all()
    # buoyancy must have produced vertical motion (ascent plus the acoustic
    # adjustment transient), bounded to physical magnitudes
    assert w.max() > 1e-3
    assert np.abs(w).max() < 10.0
    # exact dry-mass conservation (flux-form transport on a periodic plane)
    mass1 = float(
        (np.asarray(state.delp)[:, :, H:-H, H:-H].sum(axis=1) * area).sum()
    )
    np.testing.assert_allclose(mass1, mass0, rtol=1e-12)
    # winds stay physically bounded after 18 s of a 2 K bubble
    assert np.abs(np.asarray(state.u)[:, :, H:-H, H:-H]).max() < 10.0
