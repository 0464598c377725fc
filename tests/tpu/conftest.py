"""TPU-tier conftest: unlike tests/conftest.py this does NOT force the CPU
backend — these tests run the compiled Mosaic kernels on a real TPU and are
skipped elsewhere. Run on the TPU host with:

    PACE_TPU_TEST_DEVICE=tpu python -m pytest tests/tpu -q -p no:cacheprovider

(no --runslow needed; the skip condition is the backend, not a tier mark).
"""

import os

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="needs a real TPU backend")
    here = os.path.dirname(os.path.abspath(__file__))
    for item in items:
        # this hook receives EVERY collected item, not just this
        # directory's — scope the skip to tests/tpu/ or it silently skips
        # the whole suite
        if str(item.fspath).startswith(here):
            item.add_marker(skip)
