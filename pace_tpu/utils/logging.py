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


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def _make_logger() -> logging.Logger:
    level_name = os.environ.get(
        "PACE_TPU_LOGLEVEL", os.environ.get("PACE_LOGLEVEL", "info")
    ).lower()
    level = AVAILABLE_LOG_LEVELS.get(level_name, logging.INFO)
    logger = logging.getLogger("pace_tpu")
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter(
                fmt=(
                    f"%(asctime)s|%(levelname)s|proc {_process_index()}"
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
