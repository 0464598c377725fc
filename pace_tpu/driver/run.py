"""CLI entrypoint: ``python -m pace_tpu.driver.run CONFIG.yaml``.

Reference analog: driver/pace/driver/run.py:13-53 (click CLI, yaml ->
DriverConfig -> Driver -> step_all -> cleanup; --log-level option)."""

from __future__ import annotations

import logging

import click

from ..utils.logging import AVAILABLE_LOG_LEVELS, get_logger
from .config import DriverConfig
from .driver import Driver

logger = get_logger()


def main(driver_config: DriverConfig) -> Driver:
    driver = Driver(driver_config)
    driver.step_all()
    driver.cleanup()
    return driver


@click.command()
@click.argument("config_path", type=click.Path(exists=True))
@click.option(
    "--log-level",
    default="info",
    type=click.Choice(sorted(AVAILABLE_LOG_LEVELS)),
    help="logging verbosity",
)
def command_line(config_path: str, log_level: str):
    logging.getLogger().setLevel(AVAILABLE_LOG_LEVELS[log_level])
    logger.info("loading config %s", config_path)
    config = DriverConfig.from_yaml(config_path)
    main(config)


if __name__ == "__main__":
    command_line()
