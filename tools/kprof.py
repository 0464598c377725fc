"""Single-call Pallas kernel profiler (axon-tunnel-safe).

Wall clocks through the remote-TPU tunnel neither block on device
completion nor miss the identical-args result cache, so timing loops lie
(docs/performance.md pitfalls). This harness times ONE fresh execution
via jax.profiler device events: compile first (warmup on separate
inputs), then trace a single call on different inputs and sum the
pallas/custom-call event durations.

Usage: python tools/kprof.py <case> [case...]
Cases: multi6 multi1 tracer8 tracer6 pgrad remap
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _trace_pallas_seconds(fn, args):
    out = fn(*args)  # compile + warmup
    jax.block_until_ready(out)
    # fresh inputs so the tunnel result cache cannot serve the traced call
    args2 = [
        a * (1.0 + 1e-6) if hasattr(a, "dtype") else a for a in args
    ]
    with tempfile.TemporaryDirectory(prefix="kprof_") as td:
        with jax.profiler.trace(td):
            out = fn(*args2)
            jax.block_until_ready(out)
        total = 0.0
        by_name = {}
        for path in glob.glob(
            os.path.join(td, "**", "*.trace.json.gz"), recursive=True
        ):
            with gzip.open(path, "rt") as f:
                data = json.load(f)
            pids = {
                p["pid"]
                for p in data.get("traceEvents", [])
                if p.get("ph") == "M"
                and p.get("name") == "process_name"
                and "TPU" in str(p.get("args", {}).get("name", ""))
            }
            for e in data.get("traceEvents", []):
                if e.get("ph") != "X" or e.get("pid") not in pids:
                    continue
                name = e.get("name", "")
                if "fusion" in name or "copy" in name or not name:
                    continue
                total += e.get("dur", 0) / 1e6
                by_name[name] = by_name.get(name, 0.0) + e.get("dur", 0) / 1e6
    return total, dict(sorted(by_name.items(), key=lambda kv: -kv[1])[:5])


def main(cases):
    S, K, Y, X = 6, 79, 198, 198
    key = jax.random.PRNGKey(0)

    def r(*sh, s=1.0):
        nonlocal key
        key, sub = jax.random.split(key)
        return s * jax.random.normal(sub, sh, jnp.float32)

    q = r(S, K, Y, X) + 10.0
    crx, cry = r(S, K, Y, X + 1, s=0.3), r(S, K, Y + 1, X, s=0.3)
    xfx, yfx = r(S, K, Y, X + 1), r(S, K, Y + 1, X)
    mfx, mfy = r(S, K, Y, X + 1), r(S, K, Y + 1, X)
    area = jnp.abs(r(S, Y, X)) + 1e8

    from pace_tpu.ops.fvtp2d_pallas import (
        fvtp2d_multi_pallas,
        fvtp2d_tracer_pallas,
    )

    for case in cases:
        if case.startswith("multi"):
            hord = int(case[5:])

            def fn(q, crx, cry, xfx, yfx, area, mfx, mfy, _h=hord):
                fields = [
                    (q, q, _h, True),
                    (q * 1.1, q * 1.1, _h, True),
                    (q * 0.9, q * 0.9, _h, True),
                    (q * 1.2, q * 1.2, _h, False),
                ]
                return fvtp2d_multi_pallas(
                    fields, crx, cry, xfx, yfx, area, mfx, mfy
                )

            t, top = _trace_pallas_seconds(
                jax.jit(fn), [q, crx, cry, xfx, yfx, area, mfx, mfy]
            )
        elif case.startswith("tracer"):
            hord = int(case[6:])
            nq = 9
            qt = r(S, nq, K, Y, X) + 5.0
            fn = jax.jit(
                lambda qt, crx, cry, xfx, yfx, area, mfx, mfy, _h=hord:
                fvtp2d_tracer_pallas(
                    qt, qt, crx, cry, xfx, yfx, area, mfx, mfy, _h
                )
            )
            t, top = _trace_pallas_seconds(
                fn, [qt, crx, cry, xfx, yfx, area, mfx, mfy]
            )
        else:
            print(f"{case}: unknown", flush=True)
            continue
        print(f"{case}: {t*1e3:.1f} ms  top={top}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["multi6", "tracer8"])
