"""Profile one dycore step: device time + HBM bytes per fused op, mapped to
source lines and to the reference's stage timers.

The productized form of the repo's profiling recipe (docs/performance.md):

    python -m pace_tpu.tools.profile_step --n-tile 192 --npz 79 [--steps 1]
        [--physics] [--top 25]

Writes nothing; prints three tables: per-stage device seconds
(DynCore/TracerAdvection/Remapping/HaloExchange), per-fused-op-class time +
bytes, and per-source-line time. Requires a real device for op-level trace
events (TPU); on CPU only the totals that the host trace carries appear.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import tempfile


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pace_tpu.tools.profile_step")
    p.add_argument("--n-tile", type=int, default=192)
    p.add_argument("--npz", type=int, default=79)
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--physics", action="store_true")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--hydrostatic", action="store_true")
    args = p.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    import jax.numpy as jnp

    from ..driver.stage_profile import (
        STAGES,
        _trace_op_events,
        attribute_stages,
        op_name_map,
    )
    from ..grid.generation import GridSpec, MetricTerms
    from ..grid.grid_data import GridData
    from ..models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from ..models.fv3.state import DycoreState

    spec = GridSpec(n_tile=args.n_tile, npz=args.npz, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    st = DycoreState.from_baroclinic_init(
        mt, perturbation=True, dtype=jnp.float32
    )
    cfg = DynamicalCoreConfig(
        npz=args.npz, k_split=2, n_split=4, hydrostatic=args.hydrostatic,
        nord=3, d4_bg=0.15, d2_bg_k1=0.2, d2_bg_k2=0.1, dddmp=0.5,
        do_vort_damp=True, vtdm4=0.06, d_con=1.0, fill=True,
        tau=10.0, rf_fast=True, rf_cutoff=3000.0, n_sponge=8,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=450.0)
    physics = None
    if args.physics:
        from ..models.shield.physics import Physics

        physics = Physics(grid, ("GFS_microphysics", "GFS_PBL"), 450.0)

    def one(st):
        st = core.step_dynamics(st)
        if physics is not None:
            st = physics(st)
        return st

    st = one(st)  # warmup/compile
    jax.block_until_ready(st.u)

    names = op_name_map(
        core._step.lower(st, grid).compile().as_text()
    )
    with tempfile.TemporaryDirectory(prefix="profile_step_") as td:
        with jax.profiler.trace(td):
            for _ in range(args.steps):
                st = one(st)
            jax.block_until_ready(st.u)
        events = _trace_op_events(td)

    if not events:
        print("no op-level trace events (CPU host trace only) — run on TPU")
        return 1

    tot_t = sum(e["dur"] for e in events) / 1e6
    tot_b = sum(
        int(e.get("args", {}).get("bytes_accessed", 0)) for e in events
    )
    print(
        f"{args.steps} step(s): {tot_t*1e3:.1f} ms device, "
        f"{tot_b/1e9:.2f} GB accessed, eff {tot_b/max(tot_t,1e-9)/1e9:.0f} GB/s"
    )

    print("\n--- per stage ---")
    for stage, sec in sorted(
        attribute_stages(events, names, ("HaloExchange",) + STAGES).items(),
        key=lambda kv: -kv[1],
    ):
        print(f"{sec*1e3:9.2f} ms  {stage}")

    agg_t = collections.Counter()
    agg_b = collections.Counter()
    agg_n = collections.Counter()
    agg_src = collections.Counter()
    # rebuild source map from the compiled text once
    hlo = core._step.lower(st, grid).compile().as_text()
    src_of = {}
    for m in re.finditer(r"%?([\w.\-]+) = [^\n]*metadata={([^}]*)}", hlo):
        name, md = m.group(1), m.group(2)
        fm = re.search(r'source_file="([^"]+)"', md)
        lm = re.search(r"source_line=(\d+)", md)
        if fm:
            src_of[name] = (
                fm.group(1).split("/")[-1] + ":" + (lm.group(1) if lm else "?")
            )
    for e in events:
        key = re.sub(r"\.\d+$", "", e["name"])
        agg_t[key] += e["dur"]
        agg_n[key] += 1
        agg_b[key] += int(e.get("args", {}).get("bytes_accessed", 0))
        src = src_of.get(e["name"], src_of.get(key, "?"))
        agg_src[src] += e["dur"]

    print("\n--- by fused-op class ---")
    for k, t in agg_t.most_common(args.top):
        print(f"{t/1e3:9.2f} ms  {agg_b[k]/1e9:7.2f} GB  x{agg_n[k]:4d}  {k}")
    print("\n--- by source line ---")
    for k, t in agg_src.most_common(args.top):
        print(f"{t/1e3:9.2f} ms  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
