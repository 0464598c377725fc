"""Jablonowski & Williamson (2006) baroclinic-wave validation runner.

The NON-CIRCULAR correctness anchor (VERDICT r1 missing #5): the reference's
"baroclinic" init implements the JW2006 test case
(/root/reference/driver/pace/driver/initialization.py:116-124; JRMS2006
comment at tests/main/fv3core/test_dycore_call.py:110-119), whose evolution
is published (QJRMS 132, 2006, doi:10.1256/qj.06.12): an analytically
balanced zonal jet that (a) unperturbed, stays quasi-steady, and (b) with
the u-perturbation, develops a baroclinic wave whose minimum surface
pressure deepens explosively through days 7-10, with growth visible from
day ~4 and wave breaking by day 9-10.

Usage::

    python tools/run_jw2006.py [--n-tile 48] [--npz 26] [--days 10]
        [--dt 1200] [--no-perturbation] [--f32]

Prints one JSON line per day:
    {"day": d, "ps_min_hpa": ..., "ps_max_hpa": ..., "u850_max": ...,
     "low_lat_deg": ..., "finite": ...}

The dycore config is the reference production damping set (tau/rf_fast
Rayleigh, del2 sponge, vorticity + divergence damping — the reference
baroclinic_c12.yaml values): the JW2006 wave-breaking stage is not
integrable without them, in this framework or the reference.

tests/main/test_jw2006_validation.py asserts the published curve shape at
C48; this tool is the shared runner (also used on TPU at --f32 for quick
looks).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# running as a script puts tools/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n_tile: int, npz: int, dt: float, perturbation: bool, f64: bool,
          edge_damp_band: bool = True, lap_divg_weights: bool = False):
    import jax.numpy as jnp

    from pace_tpu.grid.generation import GridSpec, MetricTerms
    from pace_tpu.grid.grid_data import GridData
    from pace_tpu.models.fv3.dycore import DynamicalCore, DynamicalCoreConfig
    from pace_tpu.models.fv3.state import DycoreState

    dtype = jnp.float64 if f64 else jnp.float32
    spec = GridSpec(n_tile=n_tile, npz=npz, layout=(1, 1))
    mt = MetricTerms.generate(spec)
    grid = GridData.from_metric_terms(mt, dtype=dtype)
    cfg = DynamicalCoreConfig(
        npz=npz, k_split=2, n_split=5, hydrostatic=True,
        nord=2, d4_bg=0.15, dddmp=0.2, d_con=1.0,
        tau=10.0, rf_cutoff=3000.0, rf_fast=True,
        do_vort_damp=True, vtdm4=0.06,
        n_sponge=2, d_ext=0.02, d2_bg_k1=0.2, d2_bg_k2=0.1,
        kord_mt=9, kord_tm=-9, kord_tr=9, kord_wz=9,
        edge_damp_band=edge_damp_band,
        lap_divg_weights=lap_divg_weights,
    )
    core = DynamicalCore(grid, mt.halo, cfg, timestep=dt, donate=True)
    state = DycoreState.from_baroclinic_init(
        mt, perturbation=perturbation, dtype=dtype
    )
    return mt, core, state


def run(n_tile=48, npz=26, days=10, dt=1200.0, perturbation=True,
        f64=True, emit=print, edge_damp_band=True,
        lap_divg_weights=False):
    import numpy as np

    mt, core, state = build(n_tile, npz, dt, perturbation, f64,
                            edge_damp_band=edge_damp_band,
                            lap_divg_weights=lap_divg_weights)
    h = 3
    # cell-center latitudes, compute domain (same slice as ps below)
    lat_c = np.degrees(np.asarray(mt.lat_agrid))[..., h:-h, h:-h]
    spd = int(round(86400.0 / dt))
    out = []
    t0 = time.time()
    for day in range(1, days + 1):
        for _ in range(spd):
            state = core.step_dynamics(state)
        ps = np.asarray(state.ps)[..., h:-h, h:-h]
        u = np.asarray(state.u)[..., h:-h, h:-h]
        flat = np.argmin(ps)
        low_lat = float(lat_c.ravel()[flat]) if lat_c.size == ps.size else None
        rec = {
            "day": day,
            "ps_min_hpa": round(float(ps.min()) / 100.0, 3),
            "ps_max_hpa": round(float(ps.max()) / 100.0, 3),
            "u_max": round(float(np.abs(u).max()), 2),
            "low_lat_deg": None if low_lat is None else round(low_lat, 2),
            "finite": bool(np.isfinite(ps).all() and np.isfinite(u).all()),
            "wall_s": round(time.time() - t0, 1),
        }
        out.append(rec)
        emit(json.dumps(rec))
        if not rec["finite"]:
            break
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-tile", type=int, default=48)
    p.add_argument("--npz", type=int, default=26)
    p.add_argument("--days", type=int, default=10)
    p.add_argument("--dt", type=float, default=1200.0)
    p.add_argument("--no-perturbation", action="store_true")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--no-edge-band", action="store_true",
                   help="disable the tile-edge del-2 damping band (relies "
                   "on the sina-weighted one-sided lap_corner)")
    p.add_argument("--divg-weights", action="store_true",
                   help="weight the damping Laplacian with the grid-"
                   "generated divg_u/divg_v arrays (reference corner "
                   "treatment, DSWConfig.lap_divg_weights)")
    args = p.parse_args(argv)
    if not args.f32:
        import jax

        jax.config.update("jax_enable_x64", True)
        # must precede ANY backend query (the axon sitecustomize force-
        # registers the TPU plugin; a query locks the platform choice and
        # Pallas TPU has no 64-bit lowering)
        jax.config.update("jax_platforms", "cpu")
    run(args.n_tile, args.npz, args.days, args.dt,
        not args.no_perturbation, not args.f32,
        edge_damp_band=not args.no_edge_band,
        lap_divg_weights=args.divg_weights)
    return 0


if __name__ == "__main__":
    sys.exit(main())
