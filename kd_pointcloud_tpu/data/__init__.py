"""Data pipeline: dataset walkers, host-side transforms, threaded batching
(SURVEY.md §2.1 items 21-26)."""

from .datasets import (DATASETS, KITTI, FlyingThings3DSubset,
                       FlyingThings3DSubsetMin)
from .loader import PAD_PATH, DataLoader, collate, pad_batch, valid_count
from .transforms import Augmentation, ProcessData

__all__ = ["DATASETS", "KITTI", "FlyingThings3DSubset",
           "FlyingThings3DSubsetMin", "DataLoader", "collate",
           "pad_batch", "valid_count", "PAD_PATH",
           "Augmentation", "ProcessData"]
