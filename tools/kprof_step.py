"""Per-kernel bandwidth ledger for one full C192 dycore step.

Round-4 verdict: 70% of the step is inside nine hand-written Pallas
kernels with no per-kernel ledger recorded — optimization targets were
guesses. This tool profiles ONE step of the exact bench.py configuration
and writes KPROF_r{N}.json: for every kernel/fusion family, the summed
device time, profiler-reported bytes, achieved GB/s, and share of the
step, plus a per-stage rollup. The reference analog is the per-rank perf
JSON consumed by Jenkins (reference .jenkins/print_performance_number.py:9-15).

Usage: python tools/kprof_step.py [out.json]
Env: BENCH_N_TILE / BENCH_NPZ as in bench.py.
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys
import tempfile

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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N_TILE = int(os.environ.get("BENCH_N_TILE", "192"))
NPZ = int(os.environ.get("BENCH_NPZ", "79"))

# v5e/v5 lite peak HBM bandwidth, GB/s — used only for the frac column
HBM_PEAK = {"v4": 1228.0, "v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0,
            "v6e": 1638.0, "v6 lite": 1638.0}


STAGES = (
    "C_SW", "D_SW", "PGradD", "UpdateDZ", "RiemannC", "Riemann3",
    "HaloExchange", "TracerAdvection", "Remapping", "DynCore",
)


def _stage_of(scope: str) -> str:
    """Innermost stage named_scope on the op's scope path (rightmost wins:
    a HaloExchange nested inside C_SW attributes to HaloExchange)."""
    for part in reversed(scope.split("/")):
        if part in STAGES:
            return part
    return "other"


def main(out_path: str) -> None:
    from pace_tpu.driver.stage_profile import _trace_op_events, op_name_map
    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState

    spec = GridSpec(n_tile=N_TILE, npz=NPZ, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    cfg = DynamicalCoreConfig(
        npz=NPZ, k_split=7, n_split=8, hydrostatic=False, nord=3,
        d4_bg=0.15, d2_bg=0.0, d2_bg_k1=0.2, d2_bg_k2=0.1, dddmp=0.5,
        do_vort_damp=True, vtdm4=0.06, d_con=1.0, rf_cutoff=3000.0,
        rf_fast=True, tau=10.0, fill=True, n_sponge=48,
        hord_mt=6, hord_vt=6, hord_tm=6, hord_dp=6, hord_tr=8,
        kord_mt=9, kord_tm=-9, kord_tr=9, kord_wz=9,
        tracer_dynamic_subcycle=True,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=200.0, donate=True)
    state = DycoreState.from_baroclinic_init(
        mt, perturbation=True, dtype=jnp.float32
    )

    # two warmup steps: reach the steady-state pytree structure (bench.py)
    state = core.step_dynamics(state)
    jax.block_until_ready(state.u)
    state = core.step_dynamics(state)
    jax.block_until_ready(state.u)

    # op_name metadata from the compiled steady-state step
    names = {}
    try:
        lowered = core._step.lower(state, core.grid)
        names = op_name_map(lowered.compile().as_text())
    except Exception as e:
        print(f"op_name map unavailable: {e!r}", file=sys.stderr)

    with tempfile.TemporaryDirectory(prefix="kprof_step_") as td:
        with jax.profiler.trace(td):
            state = core.step_dynamics(state)
            jax.block_until_ready(state.u)
        _ = jax.device_get(state.u[0, 0, 0, 0])
        events = _trace_op_events(td)

    if not events:
        print("no op-level trace events (not on TPU?)", file=sys.stderr)
        sys.exit(1)

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in HBM_PEAK.items() if k in kind), None)

    # per-site aggregation: one row per HLO op site (event name carries a
    # stable .N site id; the xN calls of the scan body aggregate onto it).
    # Wrapper events double-count their contents and are excluded: outer
    # `cond.*` spans cover the tracer sub-cycle while-loop whose inner ops
    # are traced separately (measured: +0.48 s phantom at C192), and
    # `*-start` DMA events have ~zero duration.
    agg = {}
    step_s = 0.0
    for e in events:
        name = e["name"]
        if name.startswith("cond") or name.endswith("-start"):
            continue
        scope = names.get(name) or names.get(re.sub(r"\.\d+$", "", name)) or ""
        dur = e["dur"] / 1e6
        b = float(
            e.get("args", {}).get("raw_bytes_accessed")
            or e.get("args", {}).get("bytes_accessed")
            or 0
        )
        a = agg.setdefault(name, [0.0, 0.0, 0, scope])
        a[0] += dur
        a[1] += b
        a[2] += 1
        step_s += dur
    span_s = (
        max(e["ts"] + e["dur"] for e in events) - min(e["ts"] for e in events)
    ) / 1e6

    stage_agg = collections.defaultdict(lambda: [0.0, 0.0])
    rows = []
    for name, (dur, b, calls, scope) in sorted(
        agg.items(), key=lambda kv: -kv[1][0]
    ):
        st = _stage_of(scope)
        sa = stage_agg[st]
        sa[0] += dur
        sa[1] += b
        row = {
            "site": name,
            "stage": st,
            "dur_s": round(dur, 4),
            "calls": calls,
            "frac_of_step": round(dur / step_s, 4),
            # scope tail: enough path to identify the op inside the stage
            "scope": "/".join(scope.split("/")[-3:]),
        }
        if b and dur > 0:
            row["bytes_gb"] = round(b / 1e9, 2)
            row["gbps"] = round(b / 1e9 / dur, 1)
            if peak:
                row["peak_frac"] = round(b / 1e9 / dur / peak, 3)
        rows.append(row)

    stages = {
        st: {
            "dur_s": round(d, 3),
            "frac": round(d / step_s, 3),
            "bytes_gb": round(b / 1e9, 1),
            "gbps": round(b / 1e9 / d, 1) if d > 0 else None,
        }
        for st, (d, b) in sorted(stage_agg.items(), key=lambda kv: -kv[1][0])
    }
    out = {
        "config": f"C{N_TILE} npz={NPZ} nonhydro k_split=7 n_split=8",
        "device_kind": jax.devices()[0].device_kind,
        "device_step_s": round(step_s, 3),
        "trace_span_s": round(span_s, 3),
        "total_bytes_gb": round(sum(a[1] for a in agg.values()) / 1e9, 1),
        "hbm_peak_gbps": peak,
        "by_stage": stages,
        "ledger": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"device_step_s": out["device_step_s"],
                      "total_bytes_gb": out["total_bytes_gb"],
                      "n_sites": len(rows)}))
    for st, v in stages.items():
        print(f"stage {st:16s} {v['dur_s']:7.3f}s  frac={v['frac']:.3f}  "
              f"{v['bytes_gb']:7.1f} GB  {v['gbps']} GB/s", flush=True)
    for row in rows[:30]:
        print(row, flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "KPROF_r05.json")
