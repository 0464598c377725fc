"""Driver-layer tests: config round-trip, end-to-end short run, restart
round-trip bit-exactness, safety checker, SYPD computation.

Mirrors the reference's driver tests (reference tests/main/driver/
test_driver.py, test_example_configs.py, test_restart_serial.py)."""

import dataclasses
import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.driver.config import DriverConfig
from pace_tpu.driver.driver import Driver
from pace_tpu.driver.performance import get_sypd
from pace_tpu.driver.restart import load_restart, save_restart
from pace_tpu.driver.safety_checks import SafetyChecker
from pace_tpu.utils.registry import ConfigError

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "../../examples/configs")


def test_example_configs_parse():
    """Every shipped example yaml parses strictly (reference
    test_example_configs.py:14-47)."""
    paths = glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))
    assert paths, "no example configs found"
    for p in paths:
        cfg = DriverConfig.from_yaml(p)
        assert cfg.n_timesteps > 0


def test_forbidden_derived_keys():
    with pytest.raises(ConfigError):
        DriverConfig.from_dict({"dycore_config": {"npz": 10}})


def test_sypd():
    # 365 simulated days in one wall day: dt_atmos seconds per dt_atmos wall
    assert abs(get_sypd(225.0, 225.0) - 1.0 / 365.0) < 1e-12


def test_safety_checker_raises():
    class S:
        pt = np.full((1, 2, 8, 8), 500.0)

    checker = SafetyChecker()
    checker.register_variable("pt", 100.0, 380.0)
    with pytest.raises(RuntimeError):
        checker.check_state(S(), n_halo=2)


@pytest.fixture(scope="module")
def short_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("driver")
    cfg = DriverConfig.from_dict(
        {
            "nx_tile": 12,
            "nz": 8,
            "layout": [1, 1],
            "dt_atmos": 300.0,
            "minutes": 15,
            "dycore_config": {"k_split": 1, "n_split": 2, "hydrostatic": True},
            "diagnostics_config": {
                "path": str(tmp / "output"),
                "output_frequency": 1,
                "names": ["ps"],
                "derived_names": ["column_integrated_qvapor"],
            },
            "performance_config": {"experiment_name": str(tmp / "exp")},
            "restart_config": {"save_restart": True, "path": str(tmp / "RESTART")},
        }
    )
    driver = Driver(cfg)
    driver.step_all()
    driver.cleanup()
    return tmp, cfg, driver


def test_driver_runs_and_writes_outputs(short_run):
    tmp, cfg, driver = short_run
    assert driver._step_count == 3
    assert os.path.exists(tmp / "output" / "diagnostics.h5")
    assert os.path.exists(tmp / "RESTART" / "restart_dycore_state.h5")
    assert os.path.exists(tmp / "RESTART" / "restart.yaml")
    import h5py

    with h5py.File(tmp / "output" / "diagnostics.h5") as f:
        assert f["ps"].shape[0] == 3
        assert "column_integrated_qvapor" in f
        assert "lat" in f and "lon" in f


@pytest.mark.slow
def test_restart_roundtrip_bit_exact(short_run):
    """Run 2 steps, save, reload, run 1 more == run 3 steps straight
    (reference driver/tests/mpi/test_restart.py:36-52 analog)."""
    tmp, cfg, driver = short_run
    cfg3 = dataclasses.replace(cfg, minutes=10)  # 2 steps
    d2 = Driver(cfg3)
    d2.step_all()
    save_restart(str(tmp / "R2"), d2.state, d2.time_seconds)
    restored = load_restart(str(tmp / "R2"), d2.metric_terms, jnp.float32)
    s_resumed = d2.dycore.step_dynamics(restored)
    s_straight = d2.dycore.step_dynamics(d2.state)
    np.testing.assert_array_equal(np.asarray(s_resumed.u), np.asarray(s_straight.u))
    np.testing.assert_array_equal(
        np.asarray(s_resumed.delp), np.asarray(s_straight.delp)
    )
