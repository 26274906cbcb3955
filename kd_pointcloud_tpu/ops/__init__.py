"""Point-cloud ops: the TPU-native replacement for the reference's pointnet2
CUDA extension + Python neighbor-search helpers (SURVEY.md §2.2, §2.3)."""

from .ball_query import ball_query
from .distance import square_distance
from .fps import furthest_point_sample
from .gather import (gather_points, group_points, group_points_kmajor,
                     group_points_kmajor_packed)
from .interpolate import three_interpolate, three_nn, upsample_idw
from .knn import knn_point, knn_point_dist
from .warp import point_warp

__all__ = [
    "ball_query",
    "square_distance",
    "furthest_point_sample",
    "gather_points",
    "group_points",
    "group_points_kmajor",
    "group_points_kmajor_packed",
    "three_interpolate",
    "three_nn",
    "upsample_idw",
    "knn_point",
    "knn_point_dist",
    "point_warp",
]
