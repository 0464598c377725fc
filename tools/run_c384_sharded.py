"""C384 sharded through the REAL Driver on an 8-device mesh (CPU-virtual).

BASELINE.md's final milestone config is "c384 multi-host halo-overlapped";
single-chip C384 npz=79 does not fit one v5e's 15.75 GB HBM (measured
19.6 GB live set, docs/performance.md "C384 status") — resolution scales
by DECOMPOSITION, exactly like the reference's c192 6->54-rank configs
(reference .jenkins/driver_configs/baroclinic_c192_54ranks.yaml). This
tool proves the sharded C384 program exists: it builds the real Driver at
C384 npz=79, layout (2,2) (24 shards) over an 8-device mesh, runs ONE
step, and records a compile-time per-device memory analysis.

Run (from the repo root; ~CPU-minutes, compile-dominated):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/run_c384_sharded.py [--npz 79] [--out C384_r04.json]

The same path is exercised (tiny) by every round's MULTICHIP gate; this
is the full-size variant. Gated test: tests/main/test_c384_sharded.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(npz: int = 79, n_tile: int = 384, n_devices: int = 8,
        emit=print, aot_only: bool = False):
    """NOTE on n_devices vs host cores: XLA:CPU enforces a HARD 40 s
    collective-rendezvous termination (rendezvous.cc, no flag). With more
    virtual devices than physical cores the device threads time-share, so
    at C384 full-npz the compute segment between collective-permutes
    exceeds the window and the run aborts (measured: 8 devices on a
    4-core host). Full-size EXECUTION must use n_devices <= cores; the
    8-device sharding itself is proven continuously at small shapes by
    __graft_entry__.dryrun_multichip and tests/main/test_driver_multichip.

    ``aot_only=True`` (round 5, VERDICT r4 #4): lower+compile the sharded
    step WITHOUT executing it — no collective ever runs, so the rendezvous
    abort cannot fire and the 8-device (3 shards/device, the production
    v5e layout) per-device memory_analysis is MEASURED rather than
    extrapolated from a 4-device run.
    """
    # must precede ANY backend query: the axon sitecustomize force-
    # registers the TPU plugin and overrides the JAX_PLATFORMS env var;
    # the virtual device count flag must be in XLA_FLAGS before init
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pace_tpu.driver.config import DriverConfig
    from pace_tpu.driver.driver import Driver

    devs = jax.devices()
    assert len(devs) >= n_devices, (
        f"need {n_devices} devices (run with XLA_FLAGS="
        f"--xla_force_host_platform_device_count={n_devices})"
    )
    config = DriverConfig.from_dict({
        "nx_tile": n_tile,
        "nz": npz,
        "layout": [2, 2],  # 24 shards over the mesh
        "dt_atmos": 90.0,
        "seconds": 90,  # one step
        "initialization": {"type": "baroclinic"},
        "mesh_config": {"enabled": True, "n_devices": n_devices},
        # the C192 perf-config dynamics family at C384-stable splits
        # (dycore-only, as the reference's baroclinic perf configs)
        "dycore_config": {
            "k_split": 1, "n_split": 2, "hydrostatic": False,
            "nord": 3, "d4_bg": 0.15, "dddmp": 0.5,
            "do_vort_damp": True, "vtdm4": 0.06, "d_con": 1.0,
            "fill": True,
        },
        "performance_config": {"collect_performance": False},
    })
    t0 = time.perf_counter()
    driver = Driver(config)
    t_build = time.perf_counter() - t0

    # compile-time per-device memory analysis of the sharded step
    mem = None
    try:
        lowered = jax.jit(
            driver.dycore._step_impl
        ).lower(driver.state, driver.dycore.grid)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        mem = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "peak_extra_bytes": int(
                getattr(ma, "host_temp_size_in_bytes", 0)
            ),
        }
        total = (
            mem["argument_bytes"] + mem["output_bytes"] + mem["temp_bytes"]
        )
        mem["total_gb"] = round(total / 1e9, 2)
    except Exception as e:  # memory_analysis availability varies by backend
        mem = {"error": repr(e)}

    if aot_only:
        rec = {
            "config": (
                f"C{n_tile} npz={npz} layout(2,2) mesh={n_devices}dev"
                " (AOT compile only)"
            ),
            "devices": n_devices,
            "build_s": round(t_build, 1),
            "memory_analysis": mem,
            "shards_per_device": 24 // n_devices,
            "note": (
                "per-device memory MEASURED at the 8-device production"
                " layout by AOT lower+compile (no execution, so the"
                " XLA:CPU 40 s collective-rendezvous abort that blocks"
                " full-size 8-device runs on a 4-core host cannot fire)"
            ),
        }
        emit(json.dumps(rec))
        assert "total_gb" in mem, f"memory_analysis failed: {mem}"
        return rec

    t0 = time.perf_counter()
    driver.step_all()
    out = driver.state
    jax.block_until_ready(out.u)
    t_step = time.perf_counter() - t0

    h = 3
    interior = out.u[..., h:-h, h:-h]
    finite = bool(jnp.isfinite(interior).all())
    rec = {
        "config": f"C{n_tile} npz={npz} layout(2,2) mesh={n_devices}dev",
        "devices": len(out.u.sharding.device_set),
        "build_s": round(t_build, 1),
        "first_step_s": round(t_step, 1),
        "finite": finite,
        "u_max": float(jnp.max(jnp.abs(interior))),
        "memory_analysis": mem,
        "shards_per_device": 24 // n_devices,
        "note": (
            "virtual CPU mesh (single-chip sandbox); per-device HBM = "
            "state/24 shards x shards_per_device — see docs/performance.md"
            " C384 status. n_devices is bounded by host cores (XLA:CPU"
            " 40 s collective-rendezvous hard limit; see run() docstring)"
        ),
    }
    emit(json.dumps(rec))
    assert finite, "C384 sharded step produced non-finite interior"
    assert rec["devices"] == n_devices
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--npz", type=int, default=79)
    p.add_argument("--n-tile", type=int, default=384)
    p.add_argument("--n-devices", type=int, default=8)
    p.add_argument("--out", default=None)
    p.add_argument("--aot-only", action="store_true")
    args = p.parse_args(argv)
    rec = run(npz=args.npz, n_tile=args.n_tile, n_devices=args.n_devices,
              aot_only=args.aot_only)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
