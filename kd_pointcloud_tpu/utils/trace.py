"""Profiler tracing.

The reference's tracing story is thop MACs + CUDA-event timing in model
__main__ blocks (SURVEY.md §5). The TPU-native equivalents:

  * utils.profiling — params / analytic FLOPs / latency (thop counterpart)
  * this module — `jax.profiler` device traces viewable in
    TensorBoard/XProf (tensorboard_plugin_profile is in the image), plus a
    context manager for step-scoped annotation.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/kdpc_trace") -> Iterator[str]:
    """Capture a device trace around a block:

        with trace("/tmp/t") as d:
            run_steps()
        # tensorboard --logdir /tmp/t
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the trace viewer)."""
    return jax.profiler.TraceAnnotation(name)


def step_annotation(step: int):
    return jax.profiler.StepTraceAnnotation("train", step_num=step)
