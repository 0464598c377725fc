"""Rank/process-aware model logger.

TPU-native analog of ``ndsl.logging.ndsl_log`` (reference usage:
driver/pace/driver/run.py:8,35-36 with ``PACE_LOGLEVEL`` and ``--log-level``).
Under multi-host JAX, the "rank" is ``jax.process_index()``.
"""

from __future__ import annotations

import logging
import os
import sys

AVAILABLE_LOG_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "critical": logging.CRITICAL,
}


class _LazyProcFormatter(logging.Formatter):
    """Resolves the process index on the FIRST record, not at import:
    calling ``jax.process_index()`` at module import would initialize the
    jax backend before the driver/CLI/tests can choose a platform
    (e.g. forcing CPU for f64 savepoint generation)."""

    _proc: int | None = None

    def format(self, record):
        proc = _LazyProcFormatter._proc
        if proc is None:
            try:
                import jax
                import jax._src.xla_bridge as _xb

                # only query (and cache) once a backend exists — a query
                # here must never be the thing that initializes it
                if _xb._backends:
                    proc = _LazyProcFormatter._proc = jax.process_index()
                else:
                    proc = 0
            except Exception:
                proc = _LazyProcFormatter._proc = 0
        record.proc = proc
        return super().format(record)


def _make_logger() -> logging.Logger:
    level_name = os.environ.get(
        "PACE_TPU_LOGLEVEL", os.environ.get("PACE_LOGLEVEL", "info")
    ).lower()
    level = AVAILABLE_LOG_LEVELS.get(level_name, logging.INFO)
    logger = logging.getLogger("pace_tpu")
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            _LazyProcFormatter(
                fmt=(
                    "%(asctime)s|%(levelname)s|proc %(proc)s"
                    "|%(name)s:%(message)s"
                ),
                datefmt="%Y-%m-%d %H:%M:%S",
            )
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


pace_log = _make_logger()


def set_log_level(level_name: str) -> None:
    pace_log.setLevel(AVAILABLE_LOG_LEVELS[level_name.lower()])


def get_logger() -> logging.Logger:
    return pace_log
