"""Halo-exchange/compute overlap (VERDICT r2 #3; SURVEY.md §5): the async
``start_update_scalars_folds(...).wait()`` API issues every collective in the
START phase; the WAIT phase is pure local slab assembly. Interior compute
placed between the two therefore has no data dependence on the collectives —
the structural property that lets the TPU scheduler overlap ppermute rounds
on ICI with interior stencil work (the async start/done decomposition itself
is a TPU-backend pass; the virtual CPU mesh lowers collectives synchronously,
so what is assertable here is the dataflow split, plus exactness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import GridSpec, MetricTerms
from pace_tpu.parallel import mesh as M


def _collective_eqns(fn, *args):
    """Count ppermute/collective primitives in the closed jaxpr of fn."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    n = 0

    def walk(jx):
        nonlocal n
        for eqn in jx.eqns:
            if "ppermute" in eqn.primitive.name or "all_gather" in eqn.primitive.name:
                n += 1
            for sub in eqn.params.values():
                if hasattr(sub, "eqns"):
                    walk(sub)
                elif hasattr(sub, "jaxpr") and hasattr(sub.jaxpr, "eqns"):
                    walk(sub.jaxpr)

    walk(jaxpr.jaxpr)
    return n


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_start_phase_owns_all_collectives():
    spec = GridSpec(n_tile=12, npz=4, layout=(2, 2))
    mt = MetricTerms.generate(spec)
    halo = mt.halo
    mesh = M.cube_mesh(n=8)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((24, 4, 12, 12)))
    p = jnp.asarray(rng.standard_normal((24, 4, 12, 12)))
    with M.shard_mesh(mesh):
        sm = halo._slabs._shardmap()
        assert sm is not None

        # start emits the ppermute rounds ...
        def start_only(q, p):
            h = sm.start_update_scalars_folds([q, p])
            return h.wait()  # traced whole for the count below

        n_total = _collective_eqns(start_only, q, p)
        assert n_total > 0, "no collectives in the sharded exchange at all?"

        # ... and wait emits NONE: trace the finish phase alone by feeding
        # it a precomputed combined tensor
        key = ("scalar_folds", "center", 5, (2,))
        stacked = jnp.stack([q, p], axis=1)
        ops_x = halo._slabs._scalar_ops_for("center", "x")
        ops_y = halo._slabs._scalar_ops_for("center", "y")
        plan = sm._plan_for(
            key,
            [("q", sm._shape_of("center"))],
            [("qx", "q", ops_x), ("qy", "q", ops_y)],
            (stacked,),
        )
        from pace_tpu.parallel.halo_shardmap import _body_finish, _body_start

        spec_in, spec_out = sm._specs(plan, (stacked,))
        from jax.sharding import PartitionSpec as P

        start_fn = jax.shard_map(
            lambda x: _body_start(plan, x), mesh=mesh,
            in_specs=spec_in, out_specs=P(M.SHARD_AXIS, None, None),
        )
        combined = start_fn(stacked)
        finish = jax.shard_map(
            lambda c, x: _body_finish(plan, c, x), mesh=mesh,
            in_specs=(P(M.SHARD_AXIS, None, None),) + spec_in,
            out_specs=spec_out,
        )
        assert _collective_eqns(finish, combined, stacked) == 0, (
            "the wait/finish phase must be pure local compute"
        )
        assert _collective_eqns(start_fn, stacked) == n_total, (
            "every collective must be issued in the start phase"
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_async_matches_synchronous_exactly():
    spec = GridSpec(n_tile=12, npz=4, layout=(2, 2))
    mt = MetricTerms.generate(spec)
    halo = mt.halo
    mesh = M.cube_mesh(n=8)
    rng = np.random.default_rng(1)
    fields = [
        jnp.asarray(rng.standard_normal((24, 4, 12, 12))) for _ in range(3)
    ]
    ref = halo.update_scalars_folds(fields)  # dense single-device
    with M.shard_mesh(mesh):
        sharded = [M.shard_state(f, mesh) for f in fields]

        @jax.jit
        def run(*fs):
            h = halo.start_update_scalars_folds(list(fs))
            # interior compute in flight (independent of the exchange)
            z = sum(jnp.sum(f * f) for f in fs)
            out = h.wait()
            return out, z

        out, _z = run(*sharded)
    for (rx, ry), (ox, oy) in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(rx), np.asarray(ox))
        np.testing.assert_array_equal(np.asarray(ry), np.asarray(oy))


def test_single_device_handle_defers():
    spec = GridSpec(n_tile=12, npz=3, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    halo = mt.halo
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((6, 3, 18, 18)))
    h = halo.start_update_scalars_folds([q])
    ref = halo.update_scalars_folds([q])
    [(ox, oy)] = h.wait()
    np.testing.assert_array_equal(np.asarray(ref[0][0]), np.asarray(ox))
    np.testing.assert_array_equal(np.asarray(ref[0][1]), np.asarray(oy))
    # idempotent
    assert h.wait() is h.wait()
