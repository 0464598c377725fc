"""Fortran FV3GFS restart ingestion tests against the reference's sample data
(reference tests/main/data/c12_restart/, exercised by the reference's
tests/main/driver/test_restart_fortran.py:21-80)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

DATA = "/root/reference/tests/main/data/c12_restart"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "fv_core.res.nc")),
    reason="reference c12_restart sample data not available",
)


def test_netcdf3_reads_reference_files():
    from pace_tpu.utils import netcdf3

    f = netcdf3.read(os.path.join(DATA, "fv_core.res.tile1.nc"))
    assert f.variables["u"].data.shape == (1, 63, 13, 12)
    assert f.variables["v"].data.shape == (1, 63, 12, 13)
    assert f.variables["delp"].data.shape == (1, 63, 12, 12)
    core = netcdf3.read(os.path.join(DATA, "fv_core.res.nc"))
    ak = np.asarray(core.variables["ak"].data).reshape(-1)
    bk = np.asarray(core.variables["bk"].data).reshape(-1)
    assert ak.shape == (64,) and bk.shape == (64,)
    assert bk[0] == 0.0 and abs(bk[-1] - 1.0) < 1e-12


def test_coupler_res_parse():
    from pace_tpu.driver.fortran_restart import read_coupler_res

    c = read_coupler_res(os.path.join(DATA, "coupler.res"))
    assert c.calendar == 2
    assert c.start_time == (2016, 8, 1, 0, 0, 0)
    assert c.current_time == (2016, 8, 1, 0, 30, 0)


@pytest.fixture(scope="module")
def restart_state():
    from pace_tpu.driver.fortran_restart import load_fortran_restart
    from pace_tpu.grid.generation import GridSpec, MetricTerms

    spec = GridSpec(n_tile=12, npz=63, layout=(1, 1))
    mt = MetricTerms.generate(
        spec, eta_file=os.path.join(DATA, "fv_core.res.nc")
    )
    state = load_fortran_restart(DATA, mt, dtype=jnp.float64)
    return mt, state


def test_state_values_physical(restart_state):
    mt, state = restart_state
    h = 3
    ps = np.asarray(state.ps)[:, h:-h, h:-h]
    pt = np.asarray(state.pt)[:, :, h:-h, h:-h]
    delp = np.asarray(state.delp)[:, :, h:-h, h:-h]
    qv = np.asarray(state.q)[:, 0, :, h:-h, h:-h]
    assert 4.0e4 < ps.min() and ps.max() < 1.1e5
    assert (delp > 0).all()
    # virtual potential temperature: bounded, increasing toward model top
    # (high model top: theta at ~2 Pa reaches several thousand K)
    assert 150.0 < pt.min() and pt.max() < 8000.0
    assert 0.0 <= qv.min() and qv.max() < 0.05
    # halo ghosts of delp were refreshed (interior-owner values, positive)
    delp_full = np.asarray(state.delp)
    assert (delp_full[:, :, h:-h, :] > 0).all()


@pytest.mark.slow
def test_restarted_state_steps(restart_state):
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig

    mt, state = restart_state
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(
        npz=63, k_split=1, n_split=2, hydrostatic=False, nord=2, d4_bg=0.12,
        dddmp=0.2, fill=True,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=225.0)
    out = core.step_dynamics(state)
    h = 3
    u = np.asarray(out.u)[:, :, h:-h, h:-h]
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 150.0
