"""Shared utilities: typed config system, logging/telemetry, checkpoints."""

from redtail_tpu.utils.config import config_from_args, config_echo
from redtail_tpu.utils.checkpoint import load_params, save_params

__all__ = ["config_from_args", "config_echo", "save_params", "load_params"]
