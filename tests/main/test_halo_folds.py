"""Both-folds halo updates and the DUS assembly variant vs the full path.

``update_*_folds`` derives the y-fold from the x-fold via corner patches;
this must be bit-identical to running two independent full assemblies. The
"dus" assembly strategy must also match the "concat" one exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pace_tpu.parallel.halo_slabs as hs
from pace_tpu.grid.generation import GridSpec, MetricTerms


@pytest.fixture(scope="module", params=[(1, 1), (2, 1)])
def halo(request):
    spec = GridSpec(n_tile=12, npz=3, layout=request.param)
    return MetricTerms.generate(spec).halo


def _field(halo, rng, stagger="center"):
    h = halo.n_halo
    ey = 0 if stagger in ("y_iface", "corner") else 1
    ex = 0 if stagger in ("x_iface", "corner") else 1
    Y = halo.nsy + 2 * h + (1 - ey)
    X = halo.nsx + 2 * h + (1 - ex)
    return jnp.asarray(
        rng.standard_normal((halo.n_shards, 3, Y, X)).astype(np.float32)
    )


def test_scalar_folds_match(halo):
    rng = np.random.default_rng(0)
    q = _field(halo, rng)
    qx_ref = halo.update_scalar(q, fold="x")
    qy_ref = halo.update_scalar(q, fold="y")
    qx, qy = halo.update_scalar_folds(q)
    np.testing.assert_array_equal(np.asarray(qx), np.asarray(qx_ref))
    np.testing.assert_array_equal(np.asarray(qy), np.asarray(qy_ref))


def test_scalars_folds_match(halo):
    rng = np.random.default_rng(1)
    a, b = _field(halo, rng), _field(halo, rng)
    outs = halo.update_scalars_folds([a, b])
    for q, (qx, qy) in zip((a, b), outs):
        np.testing.assert_array_equal(
            np.asarray(qx), np.asarray(halo.update_scalar(q, fold="x"))
        )
        np.testing.assert_array_equal(
            np.asarray(qy), np.asarray(halo.update_scalar(q, fold="y"))
        )


def test_vector_folds_match(halo):
    rng = np.random.default_rng(2)
    h = halo.n_halo
    u = jnp.asarray(
        rng.standard_normal(
            (halo.n_shards, 3, halo.nsy + 2 * h + 1, halo.nsx + 2 * h)
        ).astype(np.float32)
    )
    v = jnp.asarray(
        rng.standard_normal(
            (halo.n_shards, 3, halo.nsy + 2 * h, halo.nsx + 2 * h + 1)
        ).astype(np.float32)
    )
    (ux, vx), (uy, vy) = halo.update_vector_folds(u, v, kind="dgrid")
    ux_r, vx_r = halo.update_vector(u, v, kind="dgrid", fold="x")
    uy_r, vy_r = halo.update_vector(u, v, kind="dgrid", fold="y")
    for got, ref in ((ux, ux_r), (vx, vx_r), (uy, uy_r), (vy, vy_r)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_vector_fold_pair_matches(halo):
    """update_vector_fold_pair returns exactly the (u fold_u, v fold_v)
    results of the full per-fold exchanges, for both kinds consumed in
    production (dgrid in acoustics, agrid in c_sw)."""
    rng = np.random.default_rng(4)
    h = halo.n_halo
    for kind, du, dv in (("dgrid", (1, 0), (0, 1)), ("agrid", (0, 0), (0, 0))):
        u = jnp.asarray(
            rng.standard_normal(
                (halo.n_shards, 3, halo.nsy + 2 * h + du[0],
                 halo.nsx + 2 * h + du[1])
            ).astype(np.float32)
        )
        v = jnp.asarray(
            rng.standard_normal(
                (halo.n_shards, 3, halo.nsy + 2 * h + dv[0],
                 halo.nsx + 2 * h + dv[1])
            ).astype(np.float32)
        )
        uf, vf = halo.update_vector_fold_pair(u, v, kind=kind)
        uy_r, _ = halo.update_vector(u, v, kind=kind, fold="y")
        _, vx_r = halo.update_vector(u, v, kind=kind, fold="x")
        np.testing.assert_array_equal(np.asarray(uf), np.asarray(uy_r))
        np.testing.assert_array_equal(np.asarray(vf), np.asarray(vx_r))


def test_scalar_fold_patch_matches(halo):
    """(qx, patch) == (fold-x result, corner pack of the fold-y result),
    and apply_corner_patch reconstructs the y fold exactly."""
    from pace_tpu.ops.folds import apply_corner_patch

    rng = np.random.default_rng(5)
    q = _field(halo, rng)
    qx, patch = halo.update_scalar_fold_patch(q)
    qx_ref = halo.update_scalar(q, fold="x")
    qy_ref = halo.update_scalar(q, fold="y")
    np.testing.assert_array_equal(np.asarray(qx), np.asarray(qx_ref))
    h = halo.n_halo
    assert patch.shape[-2:] == (2 * h, 2 * h)
    np.testing.assert_array_equal(
        np.asarray(apply_corner_patch(qx, patch)), np.asarray(qy_ref)
    )


def test_scalar_fold_patch_5d(halo):
    """The stacked-tracer (S, nq, K, Y, X) form round-trips too."""
    from pace_tpu.ops.folds import apply_corner_patch

    rng = np.random.default_rng(6)
    h = halo.n_halo
    q = jnp.asarray(
        rng.standard_normal(
            (halo.n_shards, 2, 3, halo.nsy + 2 * h, halo.nsx + 2 * h)
        ).astype(np.float32)
    )
    qx, patch = halo.update_scalar_fold_patch(q)
    qy_ref = halo.update_scalar(q, fold="y")
    assert patch.shape == q.shape[:-2] + (2 * h, 2 * h)
    np.testing.assert_array_equal(
        np.asarray(apply_corner_patch(qx, patch)), np.asarray(qy_ref)
    )


def test_dus_assembly_matches_concat(halo, monkeypatch):
    rng = np.random.default_rng(3)
    q = _field(halo, rng)
    monkeypatch.setattr(hs, "ASSEMBLY", "concat")
    ref = halo.update_scalar(q, fold="x")
    monkeypatch.setattr(hs, "ASSEMBLY", "dus")
    got = halo.update_scalar(q, fold="x")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
