"""Slab-compiled halo exchange must reproduce the gather-table oracle exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.parallel.halo import HaloExchanger
from pace_tpu.parallel.halo_slabs import SlabHalo
from pace_tpu.parallel.partitioner import CubedSpherePartitioner, TilePartitioner
from pace_tpu.parallel.topology import cubed_sphere_topology, doubly_periodic_topology


def _mk(layout=(1, 1), n_tile=12, periodic=False):
    topo = doubly_periodic_topology() if periodic else cubed_sphere_topology()
    part = CubedSpherePartitioner(TilePartitioner(layout))
    halo = HaloExchanger(topo, part, n_tile)
    return halo, SlabHalo(halo)


def _global_field(halo, stagger, seed=0):
    """Owned data generated from a global function of (tile, gy, gx) so that
    shared sub-shard boundary copies are identical — the exchange invariant
    the slab source re-homing relies on."""
    from pace_tpu.parallel.halo import _STAGGER_OFFSETS

    oy, ox = _STAGGER_OFFSETS[stagger]
    ny, nx = halo.shard_shape(stagger)
    h = halo.n_halo
    q = np.zeros((halo.n_shards, ny, nx))
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    for s in range(halo.n_shards):
        t, py, px = halo._shard_info(s)
        gy = py * halo.nsy + (jj - h) + oy
        gx = px * halo.nsx + (ii - h) + ox
        q[s] = np.sin(3.1 * t + 1.7 * gy + 0.9 * gx + seed)
    return jnp.asarray(q)


@pytest.mark.parametrize("layout", [(1, 1), (2, 2)])
@pytest.mark.parametrize("fold", ["x", "y"])
@pytest.mark.parametrize("stagger", ["center", "corner"])
def test_scalar_slab_matches_tables(layout, fold, stagger):
    halo, slab = _mk(layout)
    q = jnp.stack(
        [_global_field(halo, stagger, seed=k) for k in range(2)], axis=1
    )
    ref = np.asarray(halo.update_scalar_tables(q, stagger=stagger, fold=fold))
    out = np.asarray(slab.update_scalar(q, stagger=stagger, fold=fold))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("layout", [(1, 1), (2, 2)])
@pytest.mark.parametrize("fold", ["x", "y"])
@pytest.mark.parametrize("kind", ["dgrid", "cgrid", "agrid"])
def test_vector_slab_matches_tables(layout, fold, kind):
    halo, slab = _mk(layout)
    from pace_tpu.parallel.halo import _VECTOR_KINDS

    loc_u, _, loc_v, _ = _VECTOR_KINDS[kind]
    u = _global_field(halo, loc_u, seed=3)
    v = _global_field(halo, loc_v, seed=4)
    ru, rv = halo.update_vector_tables(u, v, kind=kind, fold=fold)
    su, sv = slab.update_vector(u, v, kind=kind, fold=fold)
    np.testing.assert_array_equal(np.asarray(su), np.asarray(ru))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


@pytest.mark.parametrize("layout", [(1, 1), (2, 2)])
@pytest.mark.parametrize("kind", ["dgrid", "cgrid"])
def test_sync_slab_matches_tables(layout, kind):
    halo, slab = _mk(layout)
    from pace_tpu.parallel.halo import _VECTOR_KINDS

    loc_u, _, loc_v, _ = _VECTOR_KINDS[kind]
    u = _global_field(halo, loc_u, seed=5)
    v = _global_field(halo, loc_v, seed=6)
    ru, rv = halo.sync_vector_interfaces_tables(u, v, kind=kind)
    su, sv = slab.sync_vector_interfaces(u, v, kind=kind)
    np.testing.assert_array_equal(np.asarray(su), np.asarray(ru))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_scalar_slab_periodic():
    halo, slab = _mk(periodic=True)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.rand(halo.n_shards, *halo.shard_shape("center")))
    ref = np.asarray(halo.update_scalar_tables(q, fold="x"))
    out = np.asarray(slab.update_scalar(q, fold="x"))
    np.testing.assert_array_equal(out, ref)
