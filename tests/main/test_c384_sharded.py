"""C384 npz=79 sharded through the REAL Driver (gated, ~25 min on CPU).

BASELINE.md milestone config #5 ("c384 multi-host halo-overlapped"):
single-chip C384 does not fit one v5e's HBM — the resolution exists only
by decomposition, like the reference's c192 54-rank configs (reference
.jenkins/driver_configs/baroclinic_c192_54ranks.yaml). This test proves
the sharded full-size program compiles and steps finitely through the
product Driver on a virtual device mesh, and that its per-device memory
extrapolates under the v5e's 15.75 GB at the 8-device target layout.

Gated: PACE_TPU_RUN_C384=1 (slow tier; the artifact recorded per round is
C384_r{N}.json from tools/run_c384_sharded.py).
"""

import os

import pytest

RUN = os.environ.get("PACE_TPU_RUN_C384", "") == "1"


@pytest.mark.slow
@pytest.mark.skipif(
    not RUN, reason="set PACE_TPU_RUN_C384=1 (one C384 step, ~25 min)"
)
def test_c384_sharded_driver_step():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../tools"))
    from run_c384_sharded import run

    n_dev = min(os.cpu_count() or 4, 8)
    rec = run(npz=79, n_tile=384, n_devices=n_dev, emit=lambda s: None)
    assert rec["finite"]
    assert rec["devices"] == n_dev
    assert rec["u_max"] < 120.0


@pytest.mark.slow
@pytest.mark.skipif(
    not RUN, reason="set PACE_TPU_RUN_C384=1 (AOT compile, ~3 min)"
)
def test_c384_8dev_memory_measured():
    """Per-device memory MEASURED at the true 8-device production layout
    (3 shards/device) by AOT lower+compile — no execution, so the XLA:CPU
    40 s collective-rendezvous abort cannot fire, and no linear-scaling
    assumption is needed (round-4 verdict #3: the extrapolated 13.9 GB is
    replaced by the measured number, 14.04 GB in C384_r05.json)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../tools"))
    from run_c384_sharded import run

    rec = run(npz=79, n_tile=384, n_devices=8, emit=lambda s: None,
              aot_only=True)
    assert rec["devices"] == 8
    assert rec["shards_per_device"] == 3
    mem = rec["memory_analysis"]
    assert mem["total_gb"] < 15.75, mem  # fits one v5e, measured not scaled
