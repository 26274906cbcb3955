"""Data pipeline: dataset walkers, host-side transforms, threaded batching
(SURVEY.md §2.1 items 21-26)."""

from .datasets import (DATASETS, KITTI, FlyingThings3DSubset,
                       FlyingThings3DSubsetMin)
from .loader import DataLoader, collate
from .transforms import Augmentation, ProcessData

__all__ = ["DATASETS", "KITTI", "FlyingThings3DSubset",
           "FlyingThings3DSubsetMin", "DataLoader", "collate",
           "Augmentation", "ProcessData"]
