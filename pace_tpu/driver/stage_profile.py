"""Per-stage device-time attribution from a jax.profiler trace.

The reference reports per-stage wall timers "DynCore" / "TracerAdvection" /
"Remapping" inside "mainloop" (reference driver/pace/driver/driver.py:640-662;
asserted at tests/main/driver/test_driver.py:81-97). Here the whole step is
ONE fused XLA program, so stage boundaries exist only as ``jax.named_scope``
annotations (models/fv3/dycore.py) that XLA carries into each op's
``op_name`` metadata. This module maps profiler trace events back to those
scopes:

1. compile the step; parse ``compiled.as_text()`` for
   ``metadata={op_name="..."}`` per HLO instruction,
2. run one step under ``jax.profiler.trace`` and read the op-level events
   (``device_duration``-bearing "X" events) from ``trace.json.gz``,
3. sum device time per stage scope.

Op-level events exist only on real devices (TPU); on CPU the trace carries
host events only and this returns an empty dict.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import tempfile
from typing import Dict, Mapping, Sequence

import jax

STAGES = ("DynCore", "TracerAdvection", "Remapping")


def op_name_map(compiled_text: str) -> Dict[str, str]:
    """HLO instruction name -> op_name metadata (scope path)."""
    out = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata={([^}]*)}", compiled_text
    ):
        name, md = m.group(1), m.group(2)
        opm = re.search(r'op_name="([^"]+)"', md)
        if opm:
            out[name] = opm.group(1)
    return out


def _trace_op_events(trace_dir: str):
    files = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not files:
        return []
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    return [
        e
        for e in tr.get("traceEvents", [])
        if e.get("ph") == "X"
        and "dur" in e
        and "args" in e
        and not e["name"].startswith(("$", "jit", "while"))
    ]


def attribute_stages(
    events, op_names: Mapping[str, str], stages: Sequence[str] = STAGES
) -> Dict[str, float]:
    """Sum device seconds per stage scope; ops outside every stage -> "other".

    Returns {} when the trace has no op-level events (CPU platform)."""
    agg: Dict[str, float] = collections.defaultdict(float)
    matched = False
    for e in events:
        name = e["name"]
        # fusions are suffixed .N in traces; HLO metadata may key either
        # form. Strip only ONE trailing .N component — a greedy strip of all
        # digits could collide distinct base names ("conv2.1" -> "conv")
        op = op_names.get(name) or op_names.get(
            re.sub(r"\.\d+$", "", name)
        )
        if op is None:
            continue
        matched = True
        for stage in stages:
            if f"/{stage}/" in op or op.endswith(f"/{stage}"):
                agg[stage] += e["dur"] / 1e6
                break
        else:
            agg["other"] += e["dur"] / 1e6
    return dict(agg) if matched else {}


def profile_stage_times(
    jitted_fn, *args, stages: Sequence[str] = STAGES
) -> Dict[str, float]:
    """Run ``jitted_fn(*args)`` once under the profiler and return device
    seconds per named-scope stage. Empty dict on platforms without op-level
    trace events (CPU)."""
    compiled = jitted_fn.lower(*args).compile()
    names = op_name_map(compiled.as_text())
    with tempfile.TemporaryDirectory(prefix="stage_prof_") as td:
        with jax.profiler.trace(td):
            out = jitted_fn(*args)
            jax.block_until_ready(out)
        events = _trace_op_events(td)
    return attribute_stages(events, names, stages)
