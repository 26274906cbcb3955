"""Infra utilities (SURVEY.md §2.1 items 29-30)."""

from .config import Config, parse_args_from_yaml, postprocess
from .logging import (AverageMeter, MovingAverage, blue, make_experiment_dir,
                      make_logger)

__all__ = ["Config", "parse_args_from_yaml", "postprocess", "AverageMeter",
           "MovingAverage", "blue", "make_experiment_dir", "make_logger"]
