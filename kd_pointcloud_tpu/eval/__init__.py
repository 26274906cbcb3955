"""Evaluation: metrics + 2D projection (SURVEY.md §2.1 items 27-28)."""

from .geometry import (FT3D_INTRINSICS, get_batch_2d_flow, project_3d_to_2d,
                       read_kitti_intrinsics)
from .metrics import evaluate_2d, evaluate_2d_jax, evaluate_3d, evaluate_3d_jax
from .runner import evaluate_model, make_eval_forward, make_eval_metrics_step

__all__ = ["FT3D_INTRINSICS", "get_batch_2d_flow", "project_3d_to_2d",
           "read_kitti_intrinsics", "evaluate_2d", "evaluate_2d_jax",
           "evaluate_3d", "evaluate_3d_jax", "evaluate_model",
           "make_eval_forward", "make_eval_metrics_step"]
