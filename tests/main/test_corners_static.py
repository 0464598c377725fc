"""Static corner-table fast path must reproduce the masked-select path.

The static path (grid.corner_table, point reads + single-point updates)
replaces full-array masked selects that cost ~150x more HBM traffic on TPU;
both implement the same 3-valent cube-corner corrections, so their outputs
must be bit-identical.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.ops.corners import (
    average_3_quadrants,
    dedup_corner_divergence,
    extrapolate_3_to_corner,
)


@pytest.fixture(scope="module")
def grid():
    spec = GridSpec(n_tile=12, npz=4, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    return GridData.from_metric_terms(mt, dtype=jnp.float32)


def _masked(grid):
    return dataclasses.replace(grid, corner_table=())


def test_corner_table_nonempty(grid):
    assert len(grid.corner_table) == 4
    kinds = {e[0] for e in grid.corner_table}
    assert kinds == {"sw", "se", "nw", "ne"}
    for _, _, _, own in grid.corner_table:
        assert all(own)  # layout (1,1): every tile owns all 4 corners


def test_average_3_quadrants_matches(grid):
    rng = np.random.default_rng(0)
    S, K = 6, 4
    Y = X = 12 + 2 * 3
    q = jnp.asarray(rng.standard_normal((S, K, Y, X)).astype(np.float32))
    default = jnp.asarray(
        rng.standard_normal((S, K, Y + 1, X + 1)).astype(np.float32)
    )
    fast = average_3_quadrants(q, grid, default)
    slow = average_3_quadrants(q, _masked(grid), default)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_extrapolate_3_to_corner_matches(grid):
    rng = np.random.default_rng(1)
    S, K = 6, 3
    Y = X = 12 + 2 * 3
    q = jnp.asarray(rng.standard_normal((S, K, Y, X)).astype(np.float32))
    default = jnp.asarray(
        rng.standard_normal((S, K, Y + 1, X + 1)).astype(np.float32)
    )
    fast = extrapolate_3_to_corner(q, grid, default)
    slow = extrapolate_3_to_corner(q, _masked(grid), default)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_dedup_corner_divergence_matches(grid):
    rng = np.random.default_rng(2)
    S, K = 6, 3
    Y = X = 12 + 2 * 3
    uf = jnp.asarray(rng.standard_normal((S, K, Y + 1, X)).astype(np.float32))
    vf = jnp.asarray(rng.standard_normal((S, K, Y, X + 1)).astype(np.float32))
    c4 = jnp.asarray(
        rng.standard_normal((S, K, Y + 1, X + 1)).astype(np.float32)
    )
    fast = dedup_corner_divergence(uf, vf, grid, c4)
    slow = dedup_corner_divergence(uf, vf, _masked(grid), c4)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))
