"""10-day idealized tropical-cyclone intensification run (gated anchor).

Reed & Jablonowski analytic vortex (analytic_init case "tropicalcyclone",
reference initialization.py:116-124 / tropicalcyclone_c128.yaml) on a
Schmidt-stretched grid, coupled to the RJ2012 simple-physics suite
(models/shield/simple_physics.py). Records the daily minimum surface
pressure and maximum low-level wind — the published intensification
curve: slow spin-up, rapid intensification around days 3-6, quasi-steady
strong vortex by day 8-10 with min-ps well below the initial 1003.8 hPa
and max winds well above the initial ~20 m/s (RJ2012 figs. 4-6; at
~0.5-1 degree effective resolution the day-10 min-ps lands in roughly
940-1000 hPa).

Usage: python tools/run_tc.py [--days 10] [--out TC_r05.json]
(~minutes on one TPU chip at C48 npz=32; gated test:
tests/main/test_tropical_cyclone.py::test_tc_intensification_curve)
"""

from __future__ import annotations

import argparse
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def run(days: float = 10.0, n_tile: int = 48, npz: int = 32,
        dt: float = 240.0, emit=print):
    """dt=240 s: the physics-dynamics coupling needs a shorter step than
    the dry CFL limit — at dt=600 the per-step condensation-heating
    pulses drive a grid-point-storm oscillation that breaks down by day
    ~7 (measured; the dry vortex at dt=600 is stable for days), while at
    dt=240 the run follows the published RJ2012 shape: drag spin-down
    lull, then steady WISHE intensification."""
    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.models.shield.physics import Physics

    spec = GridSpec(
        n_tile=n_tile, npz=npz, layout=(1, 1),
        stretch_factor=3.0, lon_target=180.0, lat_target=10.0,
    )
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=jnp.float32)
    cfg = DynamicalCoreConfig(
        npz=npz, k_split=2, n_split=4, hydrostatic=True,
        nord=2, d4_bg=0.15, dddmp=0.2, do_vort_damp=True, vtdm4=0.06,
        d_con=1.0, fill=True,
        hord_mt=6, hord_vt=6, hord_tm=6, hord_dp=6, hord_tr=8,
        tau=8.0, rf_cutoff=100.0e2, n_sponge=4,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=dt, donate=True)
    physics = Physics(grid, ("RJ_simple_physics",), dt, halo=mt.halo)
    state = DycoreState.from_analytic_init(
        mt, case="tropicalcyclone", dtype=jnp.float32
    )

    h = 3

    @jax.jit
    def metrics(state):
        ps = state.ps[..., h:-h, h:-h]
        # low-level wind proxy: D-grid u/v magnitudes near the surface
        u1 = state.u[:, -1, h:-h, h:-h]
        v1 = state.v[:, -1, h:-h, h:-h]
        vmax = jnp.maximum(jnp.max(jnp.abs(u1)), jnp.max(jnp.abs(v1)))
        return jnp.min(ps), vmax

    steps_per_day = int(round(86400.0 / dt))
    n_days = int(round(days))
    curve = []
    ps0, v0 = (float(x) for x in metrics(state))
    curve.append({"day": 0, "ps_min_hpa": round(ps0 / 100.0, 2),
                  "vmax_ms": round(v0, 2)})
    emit(json.dumps(curve[-1]))
    t0 = time.perf_counter()
    for day in range(1, n_days + 1):
        for _ in range(steps_per_day):
            state = core.step_dynamics(state)
            state = physics(state)
        psd, vd = (float(x) for x in metrics(state))
        curve.append({"day": day, "ps_min_hpa": round(psd / 100.0, 2),
                      "vmax_ms": round(vd, 2)})
        emit(json.dumps(curve[-1]))
        if not (curve[-1]["ps_min_hpa"] > 0):  # NaN guard
            break
    rec = {
        "config": (
            f"C{n_tile} stretch=3.0@(180E,10N) npz={npz} dt={dt:.0f}s "
            "hydrostatic + RJ_simple_physics"
        ),
        "wall_s": round(time.perf_counter() - t0, 1),
        "curve": curve,
    }
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--days", type=float, default=10.0)
    p.add_argument("--n-tile", type=int, default=48)
    p.add_argument("--npz", type=int, default=32)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    rec = run(days=args.days, n_tile=args.n_tile, npz=args.npz)
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
