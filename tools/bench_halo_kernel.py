"""Micro-benchmark of the halo-exchange assembly at the bench shape.

The round-3 top-ops profile showed the halo Pallas kernel (`_run`) at
~2.4 s/step over ~1487 calls (~1.6 ms each) — the single largest line item.
This tool times each exchange flavor in isolation at C192 npz=79 f32 and
computes achieved HBM bandwidth assuming copy-through traffic
(inputs+outputs x field bytes), to localize whether the cost is DMA,
rotation matmuls, or strip writes.

Run on the TPU host: python tools/bench_halo_kernel.py
Env: PACE_TPU_HALO_ASSEMBLY=pallas|dense|concat selects the formulation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)


def timeit(fn, *args, reps=10):
    """Device-event timing via jax.profiler: wall clocks through the axon
    remote-TPU tunnel DO NOT block on device completion (block_until_ready
    returns early — measured: a 74 MB elementwise add 'took' 20 us = 7.4
    TB/s), so the only honest microbenchmark is the sum of device-side
    trace events. Calls are chained anyway so no dispatch-level caching can
    elide them."""
    import tempfile

    from pace_tpu.driver.stage_profile import _trace_op_events

    args = fn(*args)
    jax.block_until_ready(args)
    with tempfile.TemporaryDirectory(prefix="halo_bench_") as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                args = fn(*args)
            jax.block_until_ready(args)
            # flush the async dispatch queue: fetch one element to host
            _ = jax.device_get(jax.tree_util.tree_leaves(args)[0][0, 0, 0])
        events = _trace_op_events(td)
    return sum(e["dur"] / 1e6 for e in events) / reps


def main():
    from pace_tpu.grid.generation import GridSpec, MetricTerms

    N_TILE = int(os.environ.get("BENCH_N_TILE", "192"))
    NPZ = int(os.environ.get("BENCH_NPZ", "79"))
    spec = GridSpec(n_tile=N_TILE, npz=NPZ, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    halo = mt.halo
    h = spec.n_halo
    S, Y, X = 6, N_TILE + 2 * h, N_TILE + 2 * h

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (S, NPZ, Y, X), dtype=jnp.float32)
    u = jax.random.normal(key, (S, NPZ, Y + 1, X), dtype=jnp.float32)
    v = jax.random.normal(key, (S, NPZ, Y, X + 1), dtype=jnp.float32)
    fb = S * NPZ * Y * X * 4 / 1e9  # one field, GB

    results = {"assembly": os.environ.get("PACE_TPU_HALO_ASSEMBLY", "pallas"),
               "field_gb": round(fb, 4)}

    # every case returns a tuple shaped like its inputs so calls CHAIN
    j = jax.jit
    cases = {
        "update_scalar": (
            j(lambda a: (halo.update_scalar(a),)), (q,), 2 * fb),
        "update_scalar_folds": (
            j(lambda a: (halo.update_scalar_folds(a)[0],)), (q,), 3 * fb),
        "update_scalars_folds_x4": (
            j(lambda a, b, c, d: tuple(
                x for (x, _) in halo.update_scalars_folds([a, b, c, d])
            )),
            (q, q + 1, q + 2, q + 3), 12 * fb),
        "update_vector_folds": (
            j(lambda uu, vv: halo.update_vector_folds(uu, vv)[0]),
            (u, v), 6 * fb),
        "sync_vector_interfaces": (
            j(lambda uu, vv: halo.sync_vector_interfaces(uu, vv)),
            (u, v), 4 * fb),
        "scalars_folds_x4_unbatched": (
            j(lambda a, b, c, d: tuple(
                halo.update_scalar_folds(x)[0] for x in (a, b, c, d)
            )),
            (q, q + 1, q + 2, q + 3), 12 * fb),
        "vector_folds_unbatched": (
            j(lambda uu, vv: halo.update_vector(uu, vv, fold="x")),
            (u, v), 4 * fb),
    }
    for name, (fn, args, gb) in cases.items():
        s = timeit(fn, *args)
        results[name] = {
            "ms": round(s * 1e3, 3),
            "copy_through_gbps": round(gb / s, 1),
        }
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
