"""SubtileGridSizer / QuantityFactory (reference ndsl.initialization sizer +
QuantityFactory, used at driver/pace/driver/driver.py:744-760) and the
DycoreState dataset export (reference DycoreState.xr_dataset / save_state,
driver/pace/driver/state.py:114-126)."""

import os

import numpy as np
import pytest

from pace_tpu.models.fv3.state import (
    TRACER_NAMES,
    DycoreState,
    as_dataset,
    to_netcdf,
)
from pace_tpu.quantity import QuantityFactory, SubtileGridSizer
from pace_tpu.utils import netcdf3


def test_sizer_shapes():
    s = SubtileGridSizer.from_tile_params(24, 24, 8, layout=(2, 2))
    assert (s.nx, s.ny, s.nz) == (12, 12, 8)
    assert s.get_shape(("tile", "z", "y", "x")) == (6, 8, 18, 18)
    assert s.get_shape(("z_interface", "y", "x_interface")) == (9, 18, 19)
    assert s.get_origin(("tile", "z", "y", "x")) == (0, 0, 3, 3)


def test_sizer_rejects_indivisible_layout():
    with pytest.raises(ValueError):
        SubtileGridSizer.from_tile_params(24, 24, 8, layout=(5, 1))


def test_factory_alloc_and_view():
    f = QuantityFactory.from_backend(
        SubtileGridSizer.from_tile_params(12, 12, 4)
    )
    q = f.zeros(("z", "y", "x_interface"), "m/s")
    assert q.shape == (4, 18, 19)
    assert q.view[:].shape == (4, 12, 13)
    assert q.units == "m/s"
    one = f.ones(("y", "x"), "1")
    assert float(np.asarray(one.data).sum()) == 18 * 18


def test_factory_from_array_shape_check():
    f = QuantityFactory.from_backend(
        SubtileGridSizer.from_tile_params(12, 12, 4)
    )
    good = f.from_array(np.zeros((18, 18)), ("y", "x"), "m")
    assert good.extent == (12, 12)
    with pytest.raises(ValueError):
        f.from_array(np.zeros((12, 12)), ("y", "x"), "m")


def test_state_dataset_roundtrip(tmp_path):
    st = DycoreState.init_zeros({"S": 6, "K": 4, "Y": 8, "X": 8})
    ds = as_dataset(st)
    assert ds["u"]["dims"] == ("shard", "z", "y_interface", "x")
    for t in TRACER_NAMES:
        assert t in ds
    path = os.path.join(tmp_path, "state.nc")
    to_netcdf(st, path)
    f = netcdf3.read(path)
    assert f.variables["v"].data.shape == (6, 4, 8, 9)
    assert f.variables["pe"].dims[1] == "z_interface"
    assert f.variables["qvapor"].attrs["units"] == "kg/kg"
