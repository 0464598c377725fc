"""Single-chip per-stage device-time shares at the bench configuration.

The halo-overlap measurement of VERDICT r1 item 8, single-chip half: on one
chip there are no collectives — the HaloExchange scope measures the pure
data-movement cost of the exchange (pack/rotate/unpack). Whether the
multi-chip ppermute rounds overlap with interior compute can only be
measured on a real slice (the CPU mesh lowers them synchronously; the
async start/done split is a TPU-backend scheduling pass) — but their
dataflow independence from interior compute is structural
(parallel/halo_shardmap.py frames touch only shard edges), and this tool
records how large the overlap target actually is.

Uses the EXACT bench.py model construction so the step program hits the
persistent compilation cache. Prints one JSON line:
    {"stages": {...device seconds...}, "step_device_s": total, shares...}

Run: BENCH_N_TILE=192 python tools/bench_stageshare.py   (on the TPU host)
"""

from __future__ import annotations

import json
import os
import sys

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

    from pace_tpu.driver.stage_profile import profile_stage_times
    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState

    N_TILE = int(os.environ.get("BENCH_N_TILE", "192"))
    NPZ = int(os.environ.get("BENCH_NPZ", "79"))

    spec = GridSpec(n_tile=N_TILE, npz=NPZ, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    # IDENTICAL to bench.py so the step program is a cache hit
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
    # warm
    out = core.step_dynamics(state)
    jax.block_until_ready(out.u)

    stages = ("HaloExchange", "C_SW", "RiemannC", "D_SW", "UpdateDZ",
              "Riemann3", "PGradD", "DynCore", "TracerAdvection",
              "Remapping")
    times = profile_stage_times(core._step, state, core.grid, stages=stages)
    total = sum(times.values()) or 1.0
    rec = {
        "n_tile": N_TILE,
        "npz": NPZ,
        "stage_device_s": {k: round(v, 4) for k, v in times.items()},
        "halo_share_of_step": round(times.get("HaloExchange", 0.0) / total, 4),
        "note": (
            "single chip: HaloExchange = on-chip pack/rotate/unpack cost; "
            "multi-chip overlap measurable only on a real slice"
        ),
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
