import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu import Quantity, zeros
from pace_tpu import constants


def test_quantity_view_and_data():
    data = jnp.arange(100.0).reshape(10, 10)
    q = Quantity(data, dims=("y", "x"), units="m", origin=(3, 3), extent=(4, 4))
    assert q.view.shape == (4, 4)
    assert float(q.view[0, 0]) == float(data[3, 3])
    assert q.data.shape == (10, 10)
    assert q.metadata.dim_lengths == {"y": 4, "x": 4}


def test_quantity_pytree_roundtrip():
    q = zeros(("z", "y", "x"), "m/s", sizes={"x": 4, "y": 4, "z": 3})
    leaves, treedef = jax.tree_util.tree_flatten(q)
    assert len(leaves) == 1
    q2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert q2.dims == q.dims
    assert q2.units == q.units
    assert q2.origin == q.origin


def test_quantity_through_jit():
    q = zeros(("y", "x"), "m", sizes={"x": 4, "y": 4})

    @jax.jit
    def f(q):
        return q.with_data(q.data + 1.0)

    out = f(q)
    assert isinstance(out, Quantity)
    assert float(out.data[0, 0]) == 1.0
    assert out.units == "m"


def test_zeros_shapes_interface_and_halo():
    q = zeros(
        ("tile", "z_interface", "y", "x_interface"),
        "Pa",
        sizes={"tile": 6, "x": 12, "y": 12, "z": 79},
    )
    h = constants.N_HALO_DEFAULT
    assert q.data.shape == (6, 80, 12 + 2 * h, 13 + 2 * h)
    assert q.origin == (0, 0, h, h)
    assert q.extent == (6, 80, 12, 13)


def test_with_view():
    q = zeros(("y", "x"), "m", sizes={"x": 2, "y": 2})
    q2 = q.with_view(jnp.ones((2, 2)))
    assert float(jnp.sum(q2.data)) == 4.0
    # halo untouched
    assert float(q2.data[0, 0]) == 0.0


def test_transpose():
    q = zeros(("z", "y", "x"), "m", sizes={"x": 4, "y": 5, "z": 3})
    qt = q.transpose(("x", "y", "z"))
    assert qt.dims == ("x", "y", "z")
    assert qt.extent == (4, 5, 3)


def test_mismatched_dims_raises():
    with pytest.raises(ValueError):
        Quantity(jnp.zeros((3, 3)), dims=("x",), units="m")


def test_quantity_to_numpy():
    q = zeros(("y", "x"), "m", sizes={"x": 2, "y": 2})
    assert isinstance(q.to_numpy(), np.ndarray)
