"""Translate framework: savepoint ingestion, name mapping, state round-trip.

Mirrors the reference's translate-test design (docs/testing.rst item 1;
pyFV3.testing.TranslateFVDynamics) without external savepoint data: the
savepoint dict is produced by the framework itself and round-tripped.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.models.fv3.state import DycoreState
from pace_tpu.testing.translate import (
    FORTRAN_NAME_MAP,
    TRACER_FORTRAN_NAMES,
    TranslateFVDynamics,
    dataset_to_dict,
)
from pace_tpu.utils import netcdf3


@pytest.fixture(scope="module")
def mt():
    return MetricTerms.generate(GridSpec(n_tile=12, npz=5, layout=(1, 1)))


@pytest.fixture(scope="module")
def state(mt):
    return DycoreState.from_baroclinic_init(
        mt, perturbation=True, dtype=jnp.float32
    )


def test_roundtrip_state_outputs_inputs(mt, state):
    tr = TranslateFVDynamics(mt)
    outs = tr.outputs_from_state(state)
    # every mapped field + every tracer is exported
    for name in FORTRAN_NAME_MAP:
        assert name in outs or getattr(state, FORTRAN_NAME_MAP[name]) is None
    for name in TRACER_FORTRAN_NAMES:
        assert name in outs
    st2 = tr.state_from_inputs(outs)
    h = mt.halo.n_halo
    ny, nx = mt.halo.nsy, mt.halo.nsx
    np.testing.assert_array_equal(
        np.asarray(st2.delp[..., h : h + ny, h : h + nx]),
        np.asarray(state.delp[..., h : h + ny, h : h + nx]),
    )
    np.testing.assert_array_equal(  # staggered field keeps its extra row
        np.asarray(st2.u[..., h : h + ny + 1, h : h + nx]),
        np.asarray(state.u[..., h : h + ny + 1, h : h + nx]),
    )
    np.testing.assert_array_equal(
        np.asarray(st2.q[:, 0, :, h : h + ny, h : h + nx]),
        np.asarray(state.q[:, 0, :, h : h + ny, h : h + nx]),
    )
    # halo region of the rebuilt state is zero (savepoints carry no halo)
    assert float(jnp.abs(st2.delp[..., :h, :]).max()) == 0.0


def test_dataset_to_dict_netcdf3(tmp_path, mt, state):
    tr = TranslateFVDynamics(mt)
    outs = tr.outputs_from_state(state)
    path = os.path.join(tmp_path, "savepoint.nc")
    netcdf3.write_simple(path, {k: np.asarray(v) for k, v in outs.items()})
    back = dataset_to_dict(path)
    assert set(back) == set(outs)
    np.testing.assert_array_equal(back["pt"], np.asarray(outs["pt"]))


def test_dataset_to_dict_hdf5(tmp_path, mt, state):
    import h5py

    tr = TranslateFVDynamics(mt)
    outs = tr.outputs_from_state(state)
    path = os.path.join(tmp_path, "savepoint.h5")
    with h5py.File(path, "w") as f:
        for k, v in outs.items():
            f.create_dataset(k, data=np.asarray(v))
    back = dataset_to_dict(path)
    assert set(back) == set(outs)
    np.testing.assert_array_equal(back["u"], np.asarray(outs["u"]))


def test_compare_thresholds(mt, state):
    tr = TranslateFVDynamics(mt)
    outs = tr.outputs_from_state(state)
    ref = {k: np.asarray(v) for k, v in outs.items()}
    assert tr.compare(outs, ref) == []
    perturbed = dict(outs)
    perturbed["pt"] = ref["pt"] * (1.0 + 1e-3)
    fails = tr.compare(perturbed, ref)
    assert len(fails) == 1 and fails[0].startswith("pt")
    # near-zero ignore suppresses failures on tiny values
    tiny = {"z": np.full(4, 1e-12)}
    got = {"z": np.full(4, 3e-12)}
    assert tr.compare(got, tiny) != []
    assert tr.compare(got, tiny, ignore_near_zero={"z": 1e-8}) == []


def test_data_halo_embedding(mt, state):
    """Slabs serialized WITH halo cells land at the right offset."""
    tr0 = TranslateFVDynamics(mt)
    h = mt.halo.n_halo
    ny, nx = mt.halo.nsy, mt.halo.nsx
    dh = 1
    tr1 = TranslateFVDynamics(mt, data_halo=dh)
    slab = np.asarray(
        state.delp[..., h - dh : h + ny + dh, h - dh : h + nx + dh]
    )
    st = tr1.state_from_inputs({"delp": slab})
    np.testing.assert_array_equal(
        np.asarray(st.delp[..., h : h + ny, h : h + nx]),
        np.asarray(state.delp[..., h : h + ny, h : h + nx]),
    )
