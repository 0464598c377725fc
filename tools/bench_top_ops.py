"""Top device ops of one bench step, by device time.

Profiles ONE C192 step (same construction as bench.py — persistent-cache
hit) and prints the top-N trace ops: device seconds, occurrences, op_name
scope, and any profiler-reported memory stats. This is the drill-down one
level below tools/bench_stageshare.py: stage shares say WHERE, this says
WHAT (which fusions/copies/custom-calls are worth attacking).

Run: BENCH_N_TILE=192 python tools/bench_top_ops.py   (on the TPU host)
"""

from __future__ import annotations

import collections
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    import jax.numpy as jnp

    from pace_tpu.driver.stage_profile import _trace_op_events, op_name_map
    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState

    N_TILE = int(os.environ.get("BENCH_N_TILE", "192"))
    NPZ = int(os.environ.get("BENCH_NPZ", "79"))
    TOP = int(os.environ.get("TOP", "30"))

    spec = GridSpec(n_tile=N_TILE, npz=NPZ, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    cfg = DynamicalCoreConfig(
        npz=NPZ, k_split=7, n_split=8, hydrostatic=False,
        nord=3, d4_bg=0.15, d2_bg=0.0, d2_bg_k1=0.2, d2_bg_k2=0.1,
        dddmp=0.5, do_vort_damp=True, vtdm4=0.06, d_con=1.0,
        rf_cutoff=3000.0, rf_fast=True, tau=10.0, fill=True, n_sponge=48,
        hord_mt=6, hord_vt=6, hord_tm=6, hord_dp=6, hord_tr=8,
        kord_mt=9, kord_tm=-9, kord_tr=9, kord_wz=9,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=200.0, donate=False)
    state = DycoreState.from_baroclinic_init(
        mt, perturbation=True, dtype=jnp.float32
    )
    out = core.step_dynamics(state)
    jax.block_until_ready(out.u)

    compiled = core._step.lower(state, core.grid).compile()
    names = op_name_map(compiled.as_text())
    with tempfile.TemporaryDirectory(prefix="topops_") as td:
        with jax.profiler.trace(td):
            out = core.step_dynamics(state)
            jax.block_until_ready(out.u)
        events = _trace_op_events(td)

    import re

    STAGES = ("HaloExchange", "C_SW", "RiemannC", "D_SW", "UpdateDZ",
              "Riemann3", "PGradD", "DynCore", "TracerAdvection",
              "Remapping")

    def stage_of(scope):
        if not scope:
            return "?"
        for st in STAGES:
            if f"/{st}/" in scope or scope.endswith(f"/{st}"):
                return st
        return "other"

    # aggregate by (stage, base op name) with summed profiler byte counts so
    # the generic "fusion" time splits by stage and bandwidth is per-row
    agg = collections.defaultdict(lambda: [0.0, 0, 0.0, None])
    total = 0.0
    total_bytes = 0.0
    for e in events:
        name = e["name"]
        base = re.sub(r"\.\d+$", "", name)
        scope = names.get(name) or names.get(base)
        key = (stage_of(scope), base)
        rec = agg[key]
        rec[0] += e["dur"] / 1e6
        rec[1] += 1
        args = e.get("args", {})
        b = args.get("raw_bytes_accessed") or args.get("bytes_accessed") or 0
        rec[2] += float(b)
        total_bytes += float(b)
        if rec[3] is None:
            rec[3] = (scope or "")[-100:]
        total += e["dur"] / 1e6

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:TOP]
    print(json.dumps({
        "total_device_s": round(total, 3),
        "total_profiler_gb": round(total_bytes / 1e9, 2),
        "note": "bytes exclude Pallas custom-calls (profiler reports 0)",
    }))
    for (stage, base), (sec, n, byt, scope) in rows:
        print(json.dumps({
            "stage": stage,
            "op": base[:48],
            "s": round(sec, 4),
            "pct": round(100 * sec / total, 1),
            "n": n,
            "gb": round(byt / 1e9, 3),
            "gbps": round(byt / 1e9 / sec, 1) if sec > 0 else 0,
            "scope": (scope or "")[-72:],
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
