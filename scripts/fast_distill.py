#!/usr/bin/env python
"""Fast/iterative KD entry (fast_distillTrain.py rebuild): bifeat iterative
teacher -> FG student with att_iter_loss."""
import sys

sys.path.insert(0, ".")

from kd_pointcloud_tpu.train.distill_experiment import distill
from kd_pointcloud_tpu.utils import parse_args_from_yaml

if __name__ == "__main__":
    distill(parse_args_from_yaml(sys.argv[1]), mode="fast")
