#!/usr/bin/env python
"""Evaluation entry: `python scripts/evaluate.py <config>.yaml`.

Rebuild of evaluate_bid_pointconv.py: load checkpoint, sweep the val set,
report EPE3D/ACC3DS/ACC3DR/Outliers3D/EPE2D/ACC2D.
"""
import os.path as osp
import sys

sys.path.insert(0, ".")

from kd_pointcloud_tpu.data import DataLoader
from kd_pointcloud_tpu.eval.runner import evaluate_model
from kd_pointcloud_tpu.train.checkpoints import load_checkpoint
from kd_pointcloud_tpu.train.experiment import (build_datasets, build_model,
                                                init_model)
from kd_pointcloud_tpu.utils import make_logger, parse_args_from_yaml

if __name__ == "__main__":
    args = parse_args_from_yaml(sys.argv[1])
    logger = make_logger("evaluate")
    model = build_model(args)
    _, val_ds = build_datasets(args, need_train=False)
    if args.get("max_samples"):          # smoke-run support
        val_ds.samples = val_ds.samples[: args.max_samples]
    # pad_last: batch>1 sweeps keep every sample (device metrics mask pads)
    loader = DataLoader(val_ds, args.batch_size, shuffle=False,
                        drop_last=False, pad_last=True,
                        num_workers=args.get("workers", 2))

    first = next(iter(loader))
    variables = init_model(model, first)
    if args.get("pretrain"):
        path = args.pretrain
        if args.get("ckpt_dir") and not osp.isabs(path):
            path = osp.join(args.ckpt_dir, path)
        if path.endswith(".pth"):   # reference torch checkpoint
            from kd_pointcloud_tpu.models.torch_import import \
                load_torch_checkpoint
            preset = args.get("model_preset", "teacher")
            family = ("fg" if preset in ("fg", "bifeat")
                      else "vote" if preset == "vote" else "teacher")
            params, stats = load_torch_checkpoint(path, family=family)
            variables = {"params": params, "batch_stats": stats}
        else:
            # structure-free restore: works for both bare weight checkpoints
            # and full train-state checkpoints (opt_state etc. ignored)
            restored = load_checkpoint(path)
            variables = {"params": restored["params"],
                         "batch_stats": restored.get("batch_stats", {})}
        logger.info("loaded %s", path)

    mesh = None
    if args.get("data_parallel"):
        from kd_pointcloud_tpu.parallel import make_mesh
        mesh = make_mesh()
        if args.batch_size % mesh.devices.size != 0:
            logger.info("batch_size %d not divisible by %d devices — "
                        "running single-device", args.batch_size,
                        mesh.devices.size)
            mesh = None

    results = evaluate_model(model, variables, loader, logger=logger,
                             mesh=mesh)
    for k, v in results.items():
        print(f"{k}: {v:.4f}")
