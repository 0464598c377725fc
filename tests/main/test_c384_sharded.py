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
    mem = rec["memory_analysis"]
    if "total_gb" in mem:
        # per-device at the 8-device (3 shards/device) target = measured
        # per-device total scaled by 3/shards_per_device; must fit a v5e
        per_dev_8 = mem["total_gb"] * 3.0 / rec["shards_per_device"]
        assert per_dev_8 < 15.75, per_dev_8
