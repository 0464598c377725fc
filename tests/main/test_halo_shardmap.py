"""shard_map + ppermute halo exchange: exactness vs the dense single-device
path, across device counts and layouts.

The multi-device halo path (parallel/halo_shardmap.py) re-executes the SAME
slab region ops through an explicit ppermute schedule; since both paths
apply identical copies, agreement must be bitwise-EXACT (not just allclose).
Reference analog: rank-count invariance (`.jenkins/run_diff_rank.sh`,
SURVEY.md §4.3) — here proven at 3/4/6/8 devices on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.parallel import mesh as M
from pace_tpu.parallel.halo_slabs import SlabHalo


def _setup(n_tile, layout, npz=3):
    spec = GridSpec(n_tile=n_tile, npz=npz, layout=layout)
    mt = MetricTerms.generate(spec)
    return mt.halo, SlabHalo(mt.halo)


def _fields(halo, rng):
    S = halo.n_shards
    nyc, nxc = halo.shard_shape("center")
    nyu, nxu = halo.shard_shape("y_interface")
    nyv, nxv = halo.shard_shape("x_interface")
    q = jnp.asarray(rng.randn(S, 3, nyc, nxc))
    u = jnp.asarray(rng.randn(S, 3, nyu, nxu))
    v = jnp.asarray(rng.randn(S, 3, nyv, nxv))
    # C-grid winds swap the staggering (uc at x-interfaces, vc at y-interfaces)
    uc = jnp.asarray(rng.randn(S, 3, nyv, nxv))
    vc = jnp.asarray(rng.randn(S, 3, nyu, nxu))
    return q, u, v, uc, vc


@pytest.fixture(autouse=True)
def _clear_mesh():
    yield
    M.set_shard_mesh(None)


@pytest.mark.parametrize(
    "n_dev,layout",
    [
        (8, (2, 2)),
        pytest.param(6, (2, 2), marks=pytest.mark.slow),
        pytest.param(4, (2, 1), marks=pytest.mark.slow),
        pytest.param(3, (1, 1), marks=pytest.mark.slow),
    ],
)
def test_shardmap_matches_dense_exactly(n_dev, layout, rng):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual devices")
    halo, sh = _setup(16 if layout != (1, 1) else 8, layout)
    q, u, v, uc, vc = _fields(halo, rng)

    M.set_shard_mesh(None)
    ref = {
        "s": sh.update_scalar(q),
        "sy": sh.update_scalar(q, fold="y"),
        "vec": sh.update_vector(u, v, kind="dgrid", fold="x"),
        "folds": sh.update_vector_folds(u, v, kind="dgrid"),
        "sync": sh.sync_vector_interfaces(u, v, kind="dgrid"),
        "multi": sh.update_scalars_folds([q, q * 2.0]),
        "cvec": sh.update_vector(uc, vc, kind="cgrid", fold="y"),
    }

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("shard",))
    M.set_shard_mesh(mesh)

    def put(a):
        return jax.device_put(
            a, NamedSharding(mesh, P("shard", *([None] * (a.ndim - 1))))
        )

    qs, us, vs = put(q), put(u), put(v)
    ucs, vcs = put(uc), put(vc)
    out = {
        "s": jax.jit(lambda x: sh.update_scalar(x))(qs),
        "sy": jax.jit(lambda x: sh.update_scalar(x, fold="y"))(qs),
        "vec": jax.jit(
            lambda a, b: sh.update_vector(a, b, kind="dgrid", fold="x")
        )(us, vs),
        "folds": jax.jit(
            lambda a, b: sh.update_vector_folds(a, b, kind="dgrid")
        )(us, vs),
        "sync": jax.jit(
            lambda a, b: sh.sync_vector_interfaces(a, b, kind="dgrid")
        )(us, vs),
        "multi": jax.jit(lambda a, b: sh.update_scalars_folds([a, b]))(
            qs, put(q * 2.0)
        ),
        "cvec": jax.jit(
            lambda a, b: sh.update_vector(a, b, kind="cgrid", fold="y")
        )(ucs, vcs),
    }

    for name in ref:
        ra = jax.tree_util.tree_leaves(ref[name])
        oa = jax.tree_util.tree_leaves(out[name])
        assert len(ra) == len(oa)
        for r, o in zip(ra, oa):
            np.testing.assert_array_equal(
                np.asarray(r), np.asarray(o), err_msg=f"{name} n_dev={n_dev}"
            )


def test_shardmap_falls_back_when_indivisible(rng):
    """S=24 over 5 devices does not divide: the dense path must be used
    (and still be correct) rather than erroring."""
    if len(jax.devices()) < 5:
        pytest.skip("needs virtual devices")
    halo, sh = _setup(16, (2, 2))
    q = _fields(halo, rng)[0]
    ref = sh.update_scalar(q)
    mesh = Mesh(np.array(jax.devices()[:5]), axis_names=("shard",))
    M.set_shard_mesh(mesh)
    assert sh._shardmap() is None
    out = sh.update_scalar(q)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_layout_for_generalized():
    from pace_tpu.parallel.mesh import layout_for

    assert layout_for(1) == (1, 1)
    assert layout_for(6) == (1, 1)
    assert layout_for(8) == (2, 2)
    assert layout_for(12) == (2, 1) or layout_for(12) == (1, 2)
    # previously-unsupported counts now resolve
    ly, lx = layout_for(5)
    assert (6 * ly * lx) % 5 == 0
    ly, lx = layout_for(7)
    assert (6 * ly * lx) % 7 == 0
    ly, lx = layout_for(9)
    assert (6 * ly * lx) % 9 == 0
    ly, lx = layout_for(64)
    assert (6 * ly * lx) % 64 == 0
    # n_tile divisibility constraint honored
    ly, lx = layout_for(9, n_tile=12)
    assert 12 % ly == 0 and 12 % lx == 0 and (6 * ly * lx) % 9 == 0
    with pytest.raises(ValueError):
        layout_for(7, n_tile=2)
