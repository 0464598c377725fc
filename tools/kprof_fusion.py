"""Identify what a named XLA fusion in the C192 step computes: prints the
source-file/line metadata of the ops inside the requested fusion
computations. Companion to kprof_step.py for attacking the residual
(non-Pallas) fusion sites in the ledger.

Usage: python tools/kprof_fusion.py select_add_fusion.21 fusion.256 ...
"""

from __future__ import annotations

import os
import re
import sys

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


def main(wanted) -> None:
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
    state2 = core.step_dynamics(state)
    jax.block_until_ready(state2.u)
    state3 = core.step_dynamics(state2)
    jax.block_until_ready(state3.u)
    text = core._step.lower(state3, core.grid).compile().as_text()

    for name in wanted:
        # the fusion computation body is named `%fused_computation.N` or the
        # fusion instruction carries calls=...; simplest robust approach:
        # find the instruction line, get its calls= computation, then dump
        # that computation's source metadata lines.
        m = re.search(
            rf"%?{re.escape(name)} = [^\n]*calls=%?([\w.\-]+)", text
        )
        print(f"=== {name} ===")
        if not m:
            # maybe it IS a computation suffix; print instruction line
            m2 = re.search(rf"^.*%?{re.escape(name)} = .*$", text, re.M)
            print(m2.group(0)[:400] if m2 else "not found")
            continue
        comp = m.group(1)
        # computation body: from "%comp (" to the closing brace at column 0
        cm = re.search(
            rf"^%?{re.escape(comp)} \([^\n]*\n(.*?)^\}}", text, re.M | re.S
        )
        if not cm:
            print(f"computation {comp} not found")
            continue
        body = cm.group(1)
        lines = set()
        shapes = {}
        for im in re.finditer(
            r"= ([\w.\-]+)\(?[^\n]*?"
            r'source_file="([^"]+)" source_line=(\d+)', body
        ):
            op, f, ln = im.group(1), im.group(2), im.group(3)
            key = f"{f.split('/pace_tpu/')[-1]}:{ln}"
            lines.add((key, op))
        for key, op in sorted(lines):
            print(f"  {op:24s} {key}")
        # rough output shape of the fusion instruction
        sm = re.search(rf"%?{re.escape(name)} = (\S+)", text)
        if sm:
            print(f"  -> {sm.group(1)[:200]}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["select_add_fusion.21"])
