"""Interactive lower boundary (surface.py): the LSM / sea-ice schemes coupled
through the Physics driver — surface state carries across steps, radiation
sees the interactive skin temperature, surface fluxes drive PBL/convection."""

import dataclasses

import pytest
import jax.numpy as jnp
import numpy as np

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.state import DycoreState, TRACER_NAMES
from pace_tpu.models.shield.physics import Physics
from pace_tpu.models.shield.surface import SurfaceConfig


def _setup(qv0=6e-3):
    spec = GridSpec(n_tile=12, npz=8, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float64)
    q = np.asarray(state.q).copy()
    q[:, TRACER_NAMES.index("qvapor")] = qv0
    state = dataclasses.replace(state, q=jnp.asarray(q))
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    return state, grid


def test_land_surface_full_loop():
    """radiation + land surface + EDMF PBL + shallow convection +
    microphysics, two steps: state stays physical, surface state evolves,
    precip carry threads through."""
    state, grid = _setup()
    phys = Physics(
        grid,
        ("gray_radiation", "GFS_PBL", "GFS_shallow_convection",
         "GFS_microphysics"),
        timestep=600.0,
        surface_config=SurfaceConfig(type="land", t_init=290.0),
    )
    assert phys.surface_state is None
    s1 = phys(state)
    sfc1 = phys.surface_state
    assert sfc1 is not None and sfc1.lsm is not None
    s2 = phys(s1)
    sfc2 = phys.surface_state
    # the surface is evolving (radiation-driven energy balance)
    assert float(jnp.max(jnp.abs(sfc2.lsm.tskin - sfc1.lsm.tskin))) > 0.0
    # physical atmosphere (compute domain: physics runs everywhere but the
    # dycore state's interior is what matters)
    for out in (s1, s2):
        assert not bool(jnp.isnan(out.pt).any())
        assert float(out.q.min()) > -1e-12
    # skin temperatures stay physical
    assert float(sfc2.lsm.tskin.min()) > 200.0
    assert float(sfc2.lsm.tskin.max()) < 350.0
    # precip carry has the right shape and sign
    assert sfc2.precip.shape == state.ps.shape
    assert float(sfc2.precip.min()) >= 0.0


@pytest.mark.slow  # full tier: fast-tier gate kept elsewhere (docs/testing.md re-tier, VERDICT r2 #9)
def test_seaice_surface_full_loop():
    state, grid = _setup(qv0=2e-3)
    phys = Physics(
        grid, ("gray_radiation", "GFS_PBL", "GFS_microphysics"),
        timestep=600.0,
        surface_config=SurfaceConfig(type="seaice", t_init=265.0,
                                     h_ice_init=1.0),
    )
    s1 = phys(state)
    s2 = phys(s1)
    sfc = phys.surface_state
    assert sfc.ice is not None
    assert not bool(jnp.isnan(s2.pt).any())
    assert float(sfc.ice.h_ice.min()) >= 0.0
    assert float(sfc.ice.tsfc.max()) <= 273.16 + 1e-6


@pytest.mark.slow  # full tier: fast-tier gate kept elsewhere (docs/testing.md re-tier, VERDICT r2 #9)
def test_surface_none_unchanged_behavior():
    """type 'none' (default) reproduces the uncoupled physics exactly."""
    state, grid = _setup()
    schemes = ("gray_radiation", "GFS_PBL", "GFS_microphysics")
    p_default = Physics(grid, schemes, timestep=600.0)
    p_none = Physics(grid, schemes, timestep=600.0,
                     surface_config=SurfaceConfig(type="none"))
    out_a = p_default(state)
    out_b = p_none(state)
    np.testing.assert_array_equal(np.asarray(out_a.pt), np.asarray(out_b.pt))
    assert p_none.surface_state is None


@pytest.mark.slow  # full tier: fast-tier gate kept elsewhere (docs/testing.md re-tier, VERDICT r2 #9)
def test_interactive_skin_feeds_radiation():
    """A hot land surface must radiate more LW up into the column than a cold
    one: lowest-layer heating differs between the two."""
    state, grid = _setup()
    schemes = ("gray_radiation", "GFS_microphysics")
    p_hot = Physics(grid, schemes, timestep=600.0,
                    surface_config=SurfaceConfig(type="land", t_init=310.0))
    p_cold = Physics(grid, schemes, timestep=600.0,
                     surface_config=SurfaceConfig(type="land", t_init=260.0))
    out_hot = p_hot(state)
    out_cold = p_cold(state)
    d = np.asarray(out_hot.pt - out_cold.pt)
    assert np.nanmax(np.abs(d)) > 0.0


def test_surface_restart_round_trip(tmp_path):
    """Coupled-surface restart is bit-exact: save after a step, reload into a
    fresh template, identical leaves."""
    import jax

    from pace_tpu.driver.restart import (
        has_surface_restart, load_surface_restart, save_surface_restart,
    )

    state, grid = _setup()
    phys = Physics(
        grid, ("gray_radiation", "GFS_PBL", "GFS_microphysics"),
        timestep=600.0,
        surface_config=SurfaceConfig(type="land", t_init=290.0),
    )
    phys(state)
    saved = phys.surface_state
    path = str(tmp_path / "RESTART")
    save_surface_restart(path, saved)
    assert has_surface_restart(path)
    _, make_init, _, _ = phys._surface
    template = make_init(state.ps.shape, state.ps.dtype)
    loaded = load_surface_restart(path, template)
    for (kp_a, a), (kp_b, b) in zip(
        jax.tree_util.tree_leaves_with_path(saved),
        jax.tree_util.tree_leaves_with_path(loaded),
    ):
        assert jax.tree_util.keystr(kp_a) == jax.tree_util.keystr(kp_b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_driver_level_surface_restart(tmp_path):
    """Driver with a coupled land surface writes restart_surface_state.h5 and
    a restarted Driver resumes with the saved surface state (not a fresh
    init)."""
    import os

    import jax
    from pace_tpu.driver.config import DriverConfig
    from pace_tpu.driver.driver import Driver

    base = {
        "nx_tile": 12,
        "nz": 8,
        "layout": [1, 1],
        "dt_atmos": 300.0,
        "minutes": 10,
        "dycore_config": {"k_split": 1, "n_split": 2, "hydrostatic": True},
        "physics_config": {
            "schemes": ["gray_radiation", "GFS_PBL", "GFS_microphysics"],
            "surface": {"type": "land", "t_init": 290.0},
        },
        "diagnostics_config": {
            "path": str(tmp_path / "out"),
            "output_frequency": 10,
            "names": ["ps"],
        },
        "performance_config": {"experiment_name": str(tmp_path / "exp")},
        "restart_config": {"save_restart": True,
                           "path": str(tmp_path / "RESTART")},
    }
    cfg = DriverConfig.from_dict(base)
    driver = Driver(cfg)
    driver.step_all()
    driver.cleanup()
    assert os.path.exists(tmp_path / "RESTART" / "restart_surface_state.h5")
    saved = driver.physics.surface_state

    resume_cfg = DriverConfig.from_dict(
        {**base,
         "initialization": {"type": "restart",
                            "config": {"path": str(tmp_path / "RESTART")}}}
    )
    resumed = Driver(resume_cfg)
    assert resumed.physics.surface_state is not None
    for (kp_a, a), (kp_b, b) in zip(
        jax.tree_util.tree_leaves_with_path(saved),
        jax.tree_util.tree_leaves_with_path(resumed.physics.surface_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # full tier: fast-tier gate kept elsewhere (docs/testing.md re-tier, VERDICT r2 #9)
def test_mixed_surface_blends_by_latitude():
    """Earthlike mixed surface: LSM skin on the land band, sea-ice skin
    poleward; the coupled loop runs and blends fluxes by the static mask."""
    import pace_tpu.constants as constants
    from pace_tpu.models.shield.surface import build_surface

    state, grid = _setup()
    phys = Physics(
        grid, ("gray_radiation", "GFS_PBL", "GFS_microphysics"),
        timestep=600.0,
        surface_config=SurfaceConfig(type="mixed", t_init=290.0,
                                     land_lat_max=45.0),
    )
    s1 = phys(state)
    sfc = phys.surface_state
    assert sfc.lsm is not None and sfc.ice is not None
    assert not bool(jnp.isnan(s1.pt).any())
    # the radiative skin follows the mask: polar points = ice temperature
    _, _, _, tskin = phys._surface
    ts = np.asarray(tskin(sfc))
    sinlat = np.clip(np.asarray(grid.f0) / (2 * constants.OMEGA), -1, 1)
    polar = np.abs(sinlat) > np.sin(np.radians(60.0))
    tropic = np.abs(sinlat) < np.sin(np.radians(20.0))
    # ice skin is capped at melting; land tropics run warm
    assert ts[polar].max() <= 273.16 + 1e-6
    assert ts[tropic].mean() > ts[polar].mean()


@pytest.mark.slow  # full tier: fast-tier gate kept elsewhere (docs/testing.md re-tier, VERDICT r2 #9)
def test_deep_convection_in_coupled_loop():
    """Full stack incl. deep convection: runs, physical, convective precip
    feeds the surface carry."""
    state, grid = _setup(qv0=1e-2)
    phys = Physics(
        grid,
        ("gray_radiation", "GFS_PBL", "GFS_deep_convection",
         "GFS_shallow_convection", "GFS_microphysics"),
        timestep=600.0,
        surface_config=SurfaceConfig(type="land", t_init=295.0),
    )
    s1 = phys(state)
    s2 = phys(s1)
    assert not bool(jnp.isnan(s2.pt).any())
    assert float(s2.q.min()) > -1e-12
    assert float(phys.surface_state.precip.min()) >= 0.0


@pytest.mark.slow
def test_physics_diagnostics_in_output(tmp_path):
    """`names: [precipitation, tskin, ...]` resolve from the physics/surface
    state through the driver diagnostics."""
    import h5py

    from pace_tpu.driver.config import DriverConfig
    from pace_tpu.driver.driver import Driver

    cfg = DriverConfig.from_dict({
        "nx_tile": 12,
        "nz": 8,
        "layout": [1, 1],
        "dt_atmos": 300.0,
        "minutes": 10,
        "dycore_config": {"k_split": 1, "n_split": 2, "hydrostatic": True},
        "physics_config": {
            "schemes": ["gray_radiation", "GFS_microphysics"],
            "surface": {"type": "land", "t_init": 290.0},
        },
        "diagnostics_config": {
            "path": str(tmp_path / "out"),
            "output_frequency": 1,
            "names": ["ps", "precipitation", "tskin", "soil_moisture",
                      "snow_water_equivalent"],
        },
        "performance_config": {"experiment_name": str(tmp_path / "exp")},
    })
    d = Driver(cfg)
    d.step_all()
    d.cleanup()
    with h5py.File(tmp_path / "out" / "diagnostics.h5") as f:
        for name in ("precipitation", "tskin", "soil_moisture",
                     "snow_water_equivalent"):
            assert name in f, name
            assert np.isfinite(np.asarray(f[name])).all(), name
        ts = np.asarray(f["tskin"])
        assert 200.0 < ts.min() and ts.max() < 350.0


@pytest.mark.slow
def test_output_initial_state_with_physics_diagnostics(tmp_path):
    """Step-0 diagnostics of physics/surface names must work (surface state
    is initialized eagerly by the driver)."""
    import h5py

    from pace_tpu.driver.config import DriverConfig
    from pace_tpu.driver.driver import Driver

    cfg = DriverConfig.from_dict({
        "nx_tile": 12, "nz": 8, "layout": [1, 1], "dt_atmos": 300.0,
        "minutes": 5,
        "dycore_config": {"k_split": 1, "n_split": 2, "hydrostatic": True},
        "physics_config": {
            "schemes": ["gray_radiation", "GFS_microphysics"],
            "surface": {"type": "mixed", "land_lat_max": 45.0},
        },
        "diagnostics_config": {
            "path": str(tmp_path / "out"), "output_frequency": 1,
            "output_initial_state": True,
            "names": ["ps", "precipitation", "tskin", "h_ice",
                      "soil_moisture"],
        },
        "performance_config": {"experiment_name": str(tmp_path / "e")},
    })
    d = Driver(cfg)
    d.step_all()
    d.cleanup()
    with h5py.File(tmp_path / "out" / "diagnostics.h5") as f:
        hi = np.asarray(f["h_ice"])
        sm = np.asarray(f["soil_moisture"])
        # mixed masking: tropics have NaN ice, poles have NaN soil — both
        # fields must contain some NaN (inactive scheme) and some data
        assert np.isnan(hi).any() and np.isfinite(hi).any()
        assert np.isnan(sm).any() and np.isfinite(sm).any()


@pytest.mark.slow  # full tier: fast-tier gate kept elsewhere (docs/testing.md re-tier, VERDICT r2 #9)
def test_restart_resumes_simulation_clock(tmp_path):
    from pace_tpu.driver.config import DriverConfig
    from pace_tpu.driver.driver import Driver

    base = {
        "nx_tile": 12, "nz": 8, "layout": [1, 1], "dt_atmos": 300.0,
        "minutes": 10,
        "dycore_config": {"k_split": 1, "n_split": 2, "hydrostatic": True},
        "diagnostics_config": {"path": str(tmp_path / "o"),
                               "output_frequency": 10, "names": ["ps"]},
        "performance_config": {"experiment_name": str(tmp_path / "e")},
        "restart_config": {"save_restart": True,
                           "path": str(tmp_path / "RESTART")},
    }
    d = Driver(DriverConfig.from_dict(base))
    d.step_all()
    d.cleanup()
    t_end = d.time_seconds
    assert t_end == 600.0
    resumed = Driver(DriverConfig.from_yaml(
        str(tmp_path / "RESTART" / "restart.yaml")
    ))
    assert resumed.time_seconds == t_end
