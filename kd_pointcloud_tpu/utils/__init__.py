"""Infra utilities (SURVEY.md §2.1 items 29-30)."""

from .config import Config, parse_args_from_yaml, postprocess
from .logging import (AverageMeter, MovingAverage, blue, make_experiment_dir,
                      make_logger)
from .profiling import cost_analysis, latency, param_count, profile_model
from .trace import annotate, step_annotation, trace

__all__ = ["Config", "parse_args_from_yaml", "postprocess", "AverageMeter",
           "MovingAverage", "blue", "make_experiment_dir", "make_logger",
           "cost_analysis", "latency", "param_count", "profile_model",
           "annotate", "step_annotation", "trace"]
