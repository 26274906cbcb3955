#!/usr/bin/env python
"""Teacher training entry: `python scripts/train.py <config>.yaml`.

Rebuild of train_bid_pointconv.py (same yaml-driven interface, README.md:53-62).
"""
import sys

sys.path.insert(0, ".")

from kd_pointcloud_tpu.train.experiment import train_teacher
from kd_pointcloud_tpu.utils import parse_args_from_yaml

if __name__ == "__main__":
    args = parse_args_from_yaml(sys.argv[1])
    train_teacher(args)
