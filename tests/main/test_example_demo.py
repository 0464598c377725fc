"""The examples/ scripts stay runnable (reference analog: notebook tests via
pytest --nbmake, reference Makefile:138-139)."""

import pytest
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_tracer_advection_demo_runs():
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "tracer_advection_demo.py"),
            "--n", "12", "--days", "0.5", "--dt", "2400",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout


@pytest.mark.slow
def test_api_tour_runs():
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "api_tour.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout
