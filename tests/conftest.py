"""Test configuration: run on CPU with 8 virtual devices and float64 enabled.

Mirrors the reference's test strategy (SURVEY.md §4): tests are runnable without
special hardware; multi-device sharding is exercised on a virtual CPU mesh.
"""

import os

# Must be set before jax import. The deployment environment may export
# JAX_PLATFORMS=axon (real TPU via tunnel); tests always run on host CPU —
# EXCEPT when PACE_TPU_TEST_DEVICE=tpu selects the real-device tier
# (tests/tpu/: compiled Mosaic kernels vs their XLA twins on hardware).
_ON_TPU = os.environ.get("PACE_TPU_TEST_DEVICE") == "tpu"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("PACE_TPU_PRECISION", "64")

import jax

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; override it back after import so tests stay on host CPU.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (the full tier; reference analog: "
        "the per-PR unit tier vs the nightly savepoint/perf tiers, "
        "SURVEY.md §4)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(reason="slow tier: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng():
    import numpy as np

    return np.random.RandomState(42)
