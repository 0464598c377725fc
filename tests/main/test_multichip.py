"""Multi-device sharding test: the full dycore step compiles and runs with
the stacked shard axis S partitioned over an 8-device (virtual CPU) mesh, and
produces results identical to the single-device run.

Mirrors the reference's decomposition-independence strategy (SURVEY.md §4.3)
— single-program SPMD guarantees agreement to the roundoff reordering of
partitioned XLA fusion.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.grid.grid_data import GridData
from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
from pace_tpu.models.fv3.state import DycoreState


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_step_matches_single_device():
    spec = GridSpec(n_tile=12, npz=6, layout=(2, 2))  # S = 24, 8 devices x 3
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float64)
    cfg = DynamicalCoreConfig(
        npz=6, k_split=1, n_split=2, hydrostatic=True, nord=1, d4_bg=0.12
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=450.0)
    state = DycoreState.from_baroclinic_init(mt, perturbation=True, dtype=jnp.float64)

    ref = core.step_dynamics(state)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("shard",))

    def spec_of(a):
        return NamedSharding(mesh, P("shard", *([None] * (a.ndim - 1))))

    sharded = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, spec_of(a)), state
    )
    out = jax.jit(core._step_impl)(sharded, core.grid)
    # partitioned XLA may reorder fused ops: agreement to strict roundoff
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=1e-13, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out.delp), np.asarray(ref.delp), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.q), np.asarray(ref.q), rtol=1e-12, atol=1e-13
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_utilities_roundtrip():
    """pace_tpu.parallel.mesh: cube_mesh/layout_for/shard_state/replicate."""
    from pace_tpu.parallel import mesh as M

    m = M.cube_mesh(n=8)
    assert m.size == 8
    assert M.layout_for(8) == (2, 2)  # 24 shards / 8 devices = 3 each
    assert M.layout_for(1) == (1, 1)
    assert M.layout_for(6) == (1, 1)

    spec = GridSpec(n_tile=12, npz=4, layout=(2, 2))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    cfg = DynamicalCoreConfig(npz=4, k_split=1, n_split=1, hydrostatic=True)
    core = DynamicalCore(grid, mt.halo, cfg, timestep=300.0)
    state = DycoreState.from_baroclinic_init(mt, dtype=jnp.float32)

    sharded = M.shard_state(state, m)
    grid_r = M.replicate(core.grid, m)
    # leading axis is sharded over all 8 devices
    assert len(sharded.u.sharding.device_set) == 8
    out = jax.jit(core._step_impl)(sharded, grid_r)
    ref = core.step_dynamics(state)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=1e-5, atol=1e-4
    )
