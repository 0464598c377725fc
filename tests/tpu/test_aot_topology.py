"""Multi-chip TPU executable properties via AOT topology compilation.

Compiles the FULL sharded dycore step (Pallas kernels included) against
an abstract 8-chip v5e topology — no multi-chip hardware needed, but a
real TPU compile service is (hence the hardware tier). Asserts the three
multi-chip properties the CPU-mesh dryrun cannot see:

1. Mosaic kernels survive partitioning (shard_map-wrapped per shard —
   GSPMD cannot auto-partition Mosaic custom calls; this test is what
   exposed that gap in round 5),
2. every exchange lowers to collective-permute (zero all-gathers),
3. halo/compute overlap is present in the compiled SCHEDULE: the async
   collective-permute-start/done pairs have interior compute ops
   scheduled between them (the strongest overlap evidence obtainable
   without N real chips; reference analog: async
   start_halo_update(...).wait(), SURVEY.md §5).
"""

import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the TPU compile service"
)


@pytest.fixture(scope="module")
def compiled_step():
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."),
    )
    from tools.aot_topology import compile_step

    compiled, ndev = compile_step(n_tile=24, npz=8, layout=(2, 2))
    assert ndev == 8
    return compiled


def test_kernels_present_and_permute_only(compiled_step):
    import re

    txt = compiled_step.as_text()
    assert len(re.findall("tpu_custom_call", txt)) > 0, (
        "Pallas kernels absent from the multi-chip executable"
    )
    assert len(re.findall("collective-permute-start", txt)) > 0
    assert len(re.findall(r"all-gather\(", txt)) == 0


def test_async_pairs_overlap_compute(compiled_step):
    from tools.aot_topology import overlap_stats

    st = overlap_stats(compiled_step.as_text())
    assert st["pairs"] > 50, st
    # every paired start/done spans interior compute in the schedule
    # (measured round 5: 179/179 pairs, median 8 ops between)
    assert st["pairs_with_compute_between"] >= 0.9 * st["pairs"], st
    assert st["median_gap_ops"] >= 1, st


def test_memory_analysis_available(compiled_step):
    ma = compiled_step.memory_analysis()
    assert ma.temp_size_in_bytes > 0
