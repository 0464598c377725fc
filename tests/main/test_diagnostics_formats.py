"""Monitor backend tests: zarr v2 / netcdf / hdf5 outputs round-trip
(reference ZarrMonitor + NetCDFMonitor parity, ndsl.monitor; reference
tests/main/driver/test_diagnostics.py checks zarr openability)."""

import os

import numpy as np
import pytest

from pace_tpu.driver.config import DriverConfig
from pace_tpu.driver.driver import Driver


def _run(tmp_path, fmt):
    out = str(tmp_path / f"out_{fmt}")
    cfg = DriverConfig.from_dict(
        dict(
            nx_tile=12,
            nz=4,
            layout=[1, 1],
            dt_atmos=60.0,
            minutes=2,
            dycore_config={"k_split": 1, "n_split": 1, "hydrostatic": True},
            diagnostics_config={
                "path": out,
                "output_frequency": 1,
                "names": ["ps"],
                "derived_names": ["column_integrated_qvapor"],
                "z_select": [{"level": 2, "names": ["pt"]}],
                "output_format": fmt,
            },
            safety_checks=[],
        )
    )
    d = Driver(cfg)
    d.step_all()
    d.cleanup()
    return out


def test_zarr_output(tmp_path):
    out = _run(tmp_path, "zarr")
    from pace_tpu.utils.zarr_v2 import read_array

    ps = read_array(os.path.join(out, "ps"))
    assert ps.shape == (2, 6, 12, 12)
    assert np.isfinite(ps).all() and 9e4 < ps.mean() < 1.1e5
    lat = read_array(os.path.join(out, "lat"))
    assert lat.shape == (6, 12, 12)
    ci = read_array(os.path.join(out, "column_integrated_qvapor"))
    assert ci.shape == (2, 6, 12, 12)
    ptz = read_array(os.path.join(out, "pt_z2"))
    assert ptz.shape == (2, 6, 12, 12)
    # metadata is valid zarr v2 json
    import json

    meta = json.load(open(os.path.join(out, "ps", ".zarray")))
    assert meta["zarr_format"] == 2 and meta["compressor"] is None


def test_netcdf_output(tmp_path):
    out = _run(tmp_path, "netcdf")
    from pace_tpu.utils import netcdf3

    f = netcdf3.read(os.path.join(out, "diagnostics.nc"))
    ps = np.asarray(f.variables["ps"].data)
    assert ps.shape == (2, 6, 12, 12)
    assert np.isfinite(ps).all()
    assert "time" in f.variables


def test_bad_format_raises(tmp_path):
    with pytest.raises(ValueError, match="output_format"):
        _run(tmp_path, "csv")
