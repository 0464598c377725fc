"""Record/replay serial debugging — the reference's CachingCommWriter /
CachingCommReader workflow (reference driver/examples/notebooks/
serial_debugging.ipynb + write_then_read.sh; comm backends at
driver/pace/driver/comm.py:121-184): record every halo-exchange result
during a "parallel" run, then re-run the SAME model with the exchanges
replayed from disk — no exchange logic executes, so a single shard's
numerics can be stepped through in isolation (or in a debugger).

Run:  python examples/serial_debugging.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pace_tpu.driver.config import DriverConfig  # noqa: E402
from pace_tpu.driver.driver import Driver  # noqa: E402


def make_config(workdir: str, comm: dict) -> DriverConfig:
    return DriverConfig.from_dict(
        {
            "nx_tile": 12,
            "nz": 8,
            "layout": [1, 1],
            "dt_atmos": 300.0,
            "minutes": 10,  # 2 steps
            "initialization": {"type": "baroclinic"},
            "dycore_config": {
                "k_split": 1,
                "n_split": 2,
                "hydrostatic": True,
                "nord": 1,
                "d4_bg": 0.12,
            },
            "comm_config": comm,
            "diagnostics_config": {"path": os.path.join(workdir, "diag")},
            "performance_config": {"collect_performance": False},
        }
    )


def main():
    workdir = tempfile.mkdtemp(prefix="serial_debug_")
    recording = os.path.join(workdir, "halo_recording.npz")

    # 1. the "parallel" run: real halo exchanges, every result recorded
    #    (comm type "write" = reference WriterCommConfig)
    driver = Driver(make_config(workdir, {"type": "write", "path": recording}))
    driver.step_all()
    u_recorded = np.asarray(driver.state.u)
    print(f"recorded run done -> {recording} "
          f"({os.path.getsize(recording)/1e6:.1f} MB)")

    # 2. the serial debugging run: same model, halo results REPLAYED from
    #    disk (comm type "read" = reference ReaderCommConfig). Everything
    #    runs eagerly — breakpoints and prints work anywhere in the dycore.
    driver2 = Driver(make_config(workdir, {"type": "read", "path": recording}))
    driver2.step_all()
    u_replayed = np.asarray(driver2.state.u)

    assert np.array_equal(u_recorded, u_replayed), "replay diverged!"
    print("replayed run reproduces the recorded run exactly "
          f"(max |u| = {np.abs(u_replayed).max():.3f} m/s)")


if __name__ == "__main__":
    main()
