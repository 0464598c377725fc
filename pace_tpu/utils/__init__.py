from .logging import pace_log, set_log_level, AVAILABLE_LOG_LEVELS
from .registry import Registry, from_dict, ConfigError

__all__ = [
    "pace_log",
    "set_log_level",
    "AVAILABLE_LOG_LEVELS",
    "Registry",
    "from_dict",
    "ConfigError",
]
