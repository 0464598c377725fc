"""Decomposition independence of the FULL dycore step: the same physical
problem run at layout (1,1) (6 shards) and layout (2,2) (24 shards) must
produce the same answer — the reference's rank-count invariance test
(reference .jenkins/run_diff_rank.sh: 6 vs 54 ranks at C192 compared; and
tests/mpi_54rank/test_grid_init.py:152-207 for init). Gathering uses the
library gather (reference Communicator.gather analog, parallel/gather.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState
from pace_tpu.parallel.gather import gather_tiles, scatter_tiles
from pace_tpu.parallel.partitioner import CubedSpherePartitioner

pytestmark = pytest.mark.slow  # layout invariance: full tier (slow multi-layout compiles); fast-tier analogs: test_halo_shardmap.py, test_multichip.py

N = 12
NPZ = 6
H = 3


def _run(layout, n_steps=2, hydrostatic=True):
    spec = GridSpec(n_tile=N, npz=NPZ, layout=layout)
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(
        npz=NPZ, k_split=1, n_split=2, hydrostatic=hydrostatic,
        nord=1, d4_bg=0.12,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=600.0)
    state = DycoreState.from_baroclinic_init(
        mt, perturbation=True, dtype=jnp.float64
    )
    for _ in range(n_steps):
        state = core.step_dynamics(state)
    return state, CubedSpherePartitioner.from_layout(layout)


@pytest.mark.parametrize(
    "hydrostatic,layout",
    [(True, (2, 2)), (False, (2, 2)), (True, (1, 2))],
)
def test_step_layout_invariance(hydrostatic, layout):
    """(1,2) covers the non-square shard ordering; (2,2) the full split."""
    s11, p11 = _run((1, 1), hydrostatic=hydrostatic)
    s22, p22 = _run(layout, hydrostatic=hydrostatic)

    center = ["delp", "pt"] + ([] if hydrostatic else ["w", "delz"])
    for name in center:
        a = gather_tiles(getattr(s11, name), p11, H)
        b = gather_tiles(getattr(s22, name), p22, H)
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10, err_msg=name)

    # staggered D-grid winds
    au = gather_tiles(s11.u, p11, H, stagger="y_interface")
    bu = gather_tiles(s22.u, p22, H, stagger="y_interface")
    np.testing.assert_allclose(au, bu, rtol=1e-10, atol=1e-10, err_msg="u")
    av = gather_tiles(s11.v, p11, H, stagger="x_interface")
    bv = gather_tiles(s22.v, p22, H, stagger="x_interface")
    np.testing.assert_allclose(av, bv, rtol=1e-10, atol=1e-10, err_msg="v")

    # tracers: (S, NQ, K, Y, X) — gather handles middle axes transparently
    a = gather_tiles(s11.q, p11, H)
    b = gather_tiles(s22.q, p22, H)
    np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12, err_msg="q")


@pytest.mark.parametrize(
    "stagger,ey,ex",
    [("center", 0, 0), ("corner", 1, 1), ("y_interface", 1, 0),
     ("x_interface", 0, 1)],
)
def test_gather_scatter_roundtrip(stagger, ey, ex):
    p = CubedSpherePartitioner.from_layout((2, 3))
    rng = np.random.RandomState(0)
    tiles = rng.rand(6, 4, 12 + ey, 12 + ex)
    shards = scatter_tiles(tiles, p, H, stagger=stagger)
    assert shards.shape == (36, 4, 6 + 2 * H + ey, 4 + 2 * H + ex)
    back = gather_tiles(shards, p, H, stagger=stagger)
    np.testing.assert_array_equal(back, tiles)


def test_scatter_rejects_non_divisible():
    p = CubedSpherePartitioner.from_layout((2, 2))
    with pytest.raises(ValueError, match="divisible"):
        scatter_tiles(np.zeros((6, 4, 13, 13)), p, H)


def test_54_shard_layout_invariance():
    """The reference's signature 54-rank decomposition test (mpirun -n 54,
    layout (3,3)) run as 54 stacked shards on one host, compared to the
    6-shard run at C24."""
    global N
    n_save = N
    try:
        N = 24
        s11, p11 = _run((1, 1), hydrostatic=True)
        s33, p33 = _run((3, 3), hydrostatic=True)
    finally:
        N = n_save
    for name in ("delp", "pt", "ps"):
        a = gather_tiles(getattr(s11, name), p11, H)
        b = gather_tiles(getattr(s33, name), p33, H)
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10, err_msg=name)
    au = gather_tiles(s11.u, p11, H, stagger="y_interface")
    bu = gather_tiles(s33.u, p33, H, stagger="y_interface")
    np.testing.assert_allclose(au, bu, rtol=1e-10, atol=1e-10, err_msg="u")
