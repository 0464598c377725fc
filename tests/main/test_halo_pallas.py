"""Pallas halo-exchange kernel vs the XLA slab assembly (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.parallel.halo_pallas import exchange_pallas


@pytest.fixture(scope="module", params=[(1, 1), (2, 1)])
def halo(request):
    spec = GridSpec(n_tile=12, npz=3, layout=request.param)
    return MetricTerms.generate(spec).halo


def _field(halo, rng, k=5, extra_y=0, extra_x=0):
    h = halo.n_halo
    Y = halo.nsy + 2 * h + extra_y
    X = halo.nsx + 2 * h + extra_x
    return jnp.asarray(
        rng.standard_normal((halo.n_shards, k, Y, X)).astype(np.float32)
    )


@pytest.mark.parametrize("fold", ["x", "y"])
def test_scalar_matches_assembly(halo, fold, rng):
    r = np.random.default_rng(0)
    q = _field(halo, r)
    ref = halo.update_scalar(q, fold=fold)
    slabs = halo._slabs
    ops = slabs._scalar_ops_for("center", fold)
    got = exchange_pallas(
        {"q": q},
        [("q", op) for op in ops],
        ("test-scalar", fold, halo.nsy),
        interpret=True,
    )["q"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_vector_matches_assembly(halo, rng):
    r = np.random.default_rng(1)
    u = _field(halo, r, extra_y=1)
    v = _field(halo, r, extra_x=1)
    ref_u, ref_v = halo.update_vector(u, v, kind="dgrid", fold="x")
    slabs = halo._slabs
    key = ("dgrid", "x")
    if key not in slabs._vector_ops:
        slabs._vector_ops[key] = slabs._build_vector_ops("dgrid", "x")
    ops = slabs._vector_ops[key]
    got = exchange_pallas(
        {"u": u, "v": v},
        [("u", op) for op in ops["u"]] + [("v", op) for op in ops["v"]],
        ("test-vector", halo.nsy),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got["u"]), np.asarray(ref_u))
    np.testing.assert_array_equal(np.asarray(got["v"]), np.asarray(ref_v))


def test_3d_field(halo, rng):
    r = np.random.default_rng(2)
    q3 = _field(halo, r, k=1)[:, 0]
    ref = halo.update_scalar(q3, fold="x")
    ops = halo._slabs._scalar_ops_for("center", "x")
    got = exchange_pallas(
        {"q": q3},
        [("q", op) for op in ops],
        ("test-3d", halo.nsy),
        interpret=True,
    )["q"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
